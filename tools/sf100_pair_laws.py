"""sf100 pair-family stress (round 6): run the three LSH dedup
operators over the 1000x-replicated corpus and verify their structural
laws at the OUTPUT scale where a row-for-row oracle is infeasible for
any engine (the row-for-row proofs live at sf10 in the driver gate).

Laws per relation, one partial-aggregating pass each (the billions of
pairs are streamed join output — never cached, never shuffled whole):
  - ordering: every row has id_a < id_b
  - threshold: metric within the operator's contract bounds
  - 100% exact-duplicate recall: #exact-metric pairs >= the
    within-group pair count the content-hash histogram demands

Measured (round 6, noisy-window wall clocks):
  minhash   2,755,544,000 pairs  222 s
  simhash   8,734,651,000 pairs  333 s  (max_hamming=8)
  embedding 32,528,000,000 pairs 116 s  (cos_threshold=0.25;
            exact == C(1000,2) * 2000 groups exactly)

Run: python tools/sf100_pair_laws.py [sf_dir]   (default /tmp/sf100,
built by `python tools/make_sf1.py /tmp/sf100 1000`)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from h3_rs_spark import queries as Q  # noqa: E402
from h3_rs_spark.operators import dedup  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = Q._dup_injected_docs(spark, sf_dir).persist()
    corpus.count()
    expect_within = int(
        corpus.groupBy(F.md5("text"))
        .count()
        .agg(
            F.sum(
                F.when(
                    F.col("count") >= 2,
                    F.col("count") * (F.col("count") - 1) / 2,
                )
            ).alias("w")
        )
        .first()["w"]
    )

    def laws(pairs, metric, mx_ok, exact_pred, expect):
        t0 = time.time()
        st = pairs.agg(
            F.count("*").alias("n"),
            F.sum((F.col("id_a") < F.col("id_b")).cast("long")).alias("n_ord"),
            F.min(metric).alias("mn"),
            F.max(metric).alias("mx"),
            F.sum(exact_pred.cast("long")).alias("n_exact"),
        ).first()
        wall = time.time() - t0
        print(
            f"pairs={st['n']} ordered={st['n_ord']} {metric} in "
            f"[{st['mn']},{st['mx']}] exact={st['n_exact']} "
            f"expect>={expect} wall={wall:.0f}s"
        )
        # empty-relation guard (ADVICE r6): an empty pair relation gets
        # NULL mn/mx/n_ord and the asserts below would raise a
        # misleading 'ordering law' — report the real condition instead
        # (matching the engine-side _assert_pair_laws guard)
        if not st["n"]:
            raise AssertionError(
                f"pair relation is EMPTY (expected >= {expect} exact-dup "
                "pairs) — laws not evaluable"
            )
        assert st["n_ord"] == st["n"], "ordering law"
        assert mx_ok(st["mn"], st["mx"]), "threshold law"
        assert st["n_exact"] >= expect, "exact-dup recall law"
        dedup.release_cached()

    print("minhash:")
    laws(
        dedup.minhash_lsh_dedup(corpus, jaccard_threshold=0.5),
        "est_jaccard",
        lambda mn, mx: mn >= 0.5 and mx <= 1.0,
        F.col("est_jaccard") == 1.0,
        expect_within,
    )
    print("simhash:")
    laws(
        dedup.simhash_dedup(corpus, max_hamming=8),
        "hamming",
        lambda mn, mx: mn >= 0 and mx <= 8,
        F.col("hamming") == 0,
        expect_within,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expect_e = int(
        emb.groupBy(F.to_json("embedding"))
        .count()
        .agg(
            F.sum(
                F.when(
                    F.col("count") >= 2,
                    F.col("count") * (F.col("count") - 1) / 2,
                )
            ).alias("w")
        )
        .first()["w"]
    )
    print("embedding:")
    laws(
        dedup.embedding_near_dup(emb, cos_threshold=0.25),
        "cos_sim",
        lambda mn, mx: mn >= 0.25,
        F.col("cos_sim") == 1.0,
        expect_e,
    )
    print("ALL LAWS PASS")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
