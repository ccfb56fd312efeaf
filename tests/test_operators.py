"""Spark operator tests against single-process numpy oracles.

Strategy per SURVEY.md §5: every distributed operator must reproduce the
brute-force single-process answer row-for-row on the deterministic
synthetic tables (FIXTURES.md)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from h3_rs_spark.h3core import faceijk, regions
from h3_rs_spark.operators import dedup, simsearch, skew
from h3_rs_spark.operators.knn import knn_join, knn_oracle
from h3_rs_spark.operators.pip_join import pip_join
from h3_rs_spark.operators.tiling import decode_image, psnr_db, tile_assign
from h3_rs_spark.sources import datagen, io

N_IMAGES = 4000


@pytest.fixture(scope="module")
def images(spark):
    df = io.with_geo(
        datagen.generate_images(spark, N_IMAGES, w=16, h=16), res=9
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle_geo():
    ids = np.arange(N_IMAGES, dtype=np.int64)
    lat, lng = datagen.row_geography(ids)
    return pd.DataFrame(
        {
            "image_id": [f"img{i:012d}" for i in ids],
            "lat": lat,
            "lng": lng,
        }
    )


class TestInputInvariants:
    def test_caption_roundtrip_and_pixels(self, images):
        """input_hint gates: caption equality end-to-end and decoded
        pixels exact (PSNR infinite for rgb24)."""
        rows = images.orderBy("image_id").limit(5).collect()
        for i, r in enumerate(rows):
            assert r["caption"] == f"photo {r['image_id']} at " \
                f"{r['lat']:.6f},{r['lng']:.6f}"
            px = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
            rng = np.random.default_rng(datagen.SEED + i)
            expected = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            assert psnr_db(px, expected) == float("inf")

    def test_distributed_generation_matches_oracle(self, spark):
        got = (
            datagen.generate_images(spark, 500, w=8, h=8)
            .orderBy("image_id")
            .toPandas()
        )
        exp = datagen.images_oracle_pdf(500, 8, 8)
        assert got["caption"].tolist() == exp["caption"].tolist()
        assert got["phash"].tolist() == exp["phash"].tolist()
        assert bytes(got["bytes"][0]) == exp["bytes"][0]


class TestPipJoin:
    def test_exact_vs_oracle(self, spark, images, oracle_geo):
        polys = {k: v for k, v in datagen.POLYGONS.items() if v[2] == 9}
        got = (
            pip_join(spark, images, polys)
            .select("polygon_id", "image_id")
            .toPandas()
        )
        for pid, (ext, holes, _res) in polys.items():
            inside = regions.points_in_polygon(
                oracle_geo["lng"].to_numpy(), oracle_geo["lat"].to_numpy(),
                ext, holes,
            )
            exp_ids = set(oracle_geo.loc[inside, "image_id"])
            got_ids = set(got.loc[got["polygon_id"] == pid, "image_id"])
            assert got_ids == exp_ids, (
                pid, len(got_ids), len(exp_ids),
                list(got_ids ^ exp_ids)[:5],
            )

    def test_no_double_counting(self, spark, images):
        """Compacted antichain: each image matches each polygon <= once."""
        polys = {"sf_hexagon": datagen.POLYGONS["sf_hexagon"]}
        got = pip_join(spark, images, polys).groupBy(
            "polygon_id", "image_id"
        ).count()
        assert got.where(F.col("count") > 1).count() == 0

    def test_compacted_equals_uncompacted(self, spark, images):
        polys = {"sf_hexagon": datagen.POLYGONS["sf_hexagon"]}
        a = set(
            r[0]
            for r in pip_join(spark, images, polys, compacted=True)
            .select("image_id").collect()
        )
        b = set(
            r[0]
            for r in pip_join(spark, images, polys, compacted=False)
            .select("image_id").collect()
        )
        assert a == b

    def test_partition_pruning_filter(self, spark, images):
        polys = {"sf_hexagon": datagen.POLYGONS["sf_hexagon"]}
        plan = pip_join(
            spark, images, polys, prune_partitions=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "bc0" in plan  # coarse-cell prefilter present


class TestKnn:
    def test_exact_vs_oracle(self, spark, images, oracle_geo):
        queries = datagen.generate_knn_queries(spark, n=24, k=5)
        q_pdf = queries.toPandas()
        got = knn_join(spark, images, queries, k=5, res=9).toPandas()
        exp = knn_oracle(oracle_geo, q_pdf, k=5)
        g = got.sort_values(["query_id", "rank"], ignore_index=True)
        x = exp.sort_values(["query_id", "rank"], ignore_index=True)
        assert g["image_id"].tolist() == x["image_id"].tolist()
        assert np.allclose(g["dist_m"], x["dist_m"], rtol=1e-9, atol=1e-6)

    def test_distributed_queries_variant_matches(self, spark, images,
                                                 oracle_geo):
        """knn_join_distributed (query set stays a DataFrame, only
        per-round stats reach the driver) must return knn_join's exact
        rows — including sparse ocean queries that force ring expansion
        and resolution escalation."""
        from h3_rs_spark.operators.knn import knn_join_distributed

        queries = datagen.generate_knn_queries(spark, n=24, k=5)
        q_pdf = queries.toPandas()
        got = knn_join_distributed(
            spark, images, queries, k=5, res=9
        ).toPandas()
        exp = knn_oracle(oracle_geo, q_pdf, k=5)
        g = got.sort_values(["query_id", "rank"], ignore_index=True)
        x = exp.sort_values(["query_id", "rank"], ignore_index=True)
        assert g["image_id"].tolist() == x["image_id"].tolist()
        assert np.allclose(g["dist_m"], x["dist_m"], rtol=1e-9, atol=1e-6)

    def test_blind_sequence_matches_precheck(self, spark, images,
                                             oracle_geo):
        """density_precheck=False (small-batch fast path, ADVICE r2)
        must not change results — completion is proven by the
        guaranteed-radius test either way."""
        queries = datagen.generate_knn_queries(spark, n=8, k=3)
        q_pdf = queries.toPandas()
        got = knn_join(
            spark, images, queries, k=3, res=9, density_precheck=False
        ).toPandas()
        exp = knn_oracle(oracle_geo, q_pdf, k=3)
        g = got.sort_values(["query_id", "rank"], ignore_index=True)
        x = exp.sort_values(["query_id", "rank"], ignore_index=True)
        assert g["image_id"].tolist() == x["image_id"].tolist()

    def test_oversized_batch_routes_distributed(self, spark, images,
                                                oracle_geo):
        """VERDICT r4 #3: the convenience wrapper's driver-side
        toPandas is guarded — a batch above max_driver_queries must
        route to the all-Spark distributed path (the probe is
        limit(N+1).toPandas() — a bounded N+1-row driver
        materialization reused as the small-batch input, never an
        unbounded scan) and still return the exact rows. Exercised with a lowered guard so the
        identical code path a 10^7-query caller would hit runs in
        test time."""
        from h3_rs_spark.operators import knn as knn_mod

        queries = datagen.generate_knn_queries(spark, n=24, k=3)
        q_pdf = queries.toPandas()
        got = knn_join(
            spark, images, queries, k=3, res=9, max_driver_queries=8
        ).toPandas()
        assert knn_mod._LAST_ROUTE[0] == "distributed"
        exp = knn_oracle(oracle_geo, q_pdf, k=3)
        g = got.sort_values(["query_id", "rank"], ignore_index=True)
        x = exp.sort_values(["query_id", "rank"], ignore_index=True)
        assert g["image_id"].tolist() == x["image_id"].tolist()
        # small batches keep the driver-seeded fast path
        small = datagen.generate_knn_queries(spark, n=4, k=3)
        knn_join(spark, images, small, k=3, res=9).count()
        assert knn_mod._LAST_ROUTE[0] == "driver_seeded"


class TestTiling:
    def test_tile_assignment_vs_oracle(self, spark, images):
        tiles = tile_assign(images.limit(64), tile_px=8, res=15).toPandas()
        assert len(tiles) == 64 * 4  # 16x16 image, 8px tiles -> 2x2
        # oracle: recompute one image's tiles in-process
        row = images.orderBy("image_id").first()
        px = decode_image(bytes(row["bytes"]), 16, 16, "rgb24")
        sub = tiles[tiles["image_id"] == row["image_id"]].sort_values(
            ["tile_y", "tile_x"]
        )
        assert len(sub) == 4
        means = px[:8, :8, :].astype(np.float64).mean(axis=(0, 1))
        first = sub.iloc[0]
        assert np.allclose(
            [first["mean_r"], first["mean_g"], first["mean_b"]], means
        )
        # cell assignment matches direct kernel call on tile centers
        lat = row["lat"] - (0.5 * 8 - 8.0) * 1e-6
        lng = row["lng"] + (0.5 * 8 - 8.0) * 1e-6
        expected_cell = int(
            faceijk.geo_to_h3(np.array([lat]), np.array([lng]), 15)[0]
        )
        assert int(first["cell"]) == expected_cell

    def test_unknown_fmt_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"", 1, 1, "png")


class TestSkew:
    def test_salted_join_equals_plain(self, spark, images):
        build = images.select("cell").distinct().withColumn(
            "tag", F.lit("x")
        )
        plain = images.join(build, "cell").count()
        salted = skew.salted_join(images, build, "cell", salt_buckets=8).count()
        assert plain == salted

    def test_salted_agg_equals_plain(self, spark, images):
        plain = {
            r["cell"]: r["n"]
            for r in images.groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        salted = {
            r["cell"]: r["n_rows"]
            for r in skew.salted_aggregate(
                images, "cell", [("n_rows", "count")], salt_buckets=8
            ).collect()
        }
        assert plain == salted

    def test_hot_keys_finds_metros(self, spark, images):
        hot = skew.hot_keys(images, "bc0", threshold=N_IMAGES / 10, fraction=0.5)
        assert len(hot) >= 1  # SF base cell is ~30% of data


class TestDedupOps:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rng = np.random.default_rng(8)
        vocab = [f"w{c}" for c in range(200)]
        texts = (
            ["the quick brown fox jumps over the lazy dog"] * 3
            + ["the quick brown fox jumps over a lazy dog"]
            + ["completely different text about spark engines"]
            + [
                " ".join(rng.choice(vocab, size=12, replace=False))
                for _ in range(10)
            ]
        )
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )

    def test_exact_dedup(self, spark, docs):
        out = dedup.exact_dedup(docs).toPandas()
        assert out["dup_count"].max() == 3
        assert out["dup_count"].sum() == 15

    def test_minhash_finds_near_dup(self, spark, docs):
        pairs = dedup.minhash_lsh_dedup(
            docs, jaccard_threshold=0.3, shingle=4
        ).toPandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        # the three exact copies and the 1-word variant must pair up
        assert (0, 1) in got and (0, 2) in got and (1, 2) in got
        assert (0, 3) in got or (1, 3) in got or (2, 3) in got
        # unrelated docs must not pair
        assert not any(a >= 5 or b >= 5 for a, b in got)

    def test_simhash_near_dup(self, spark, docs):
        pairs = dedup.simhash_dedup(docs, max_hamming=8).toPandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (0, 1) in got and (0, 3) in got

    def test_ngram_jaccard_exact(self, spark, docs):
        cand = spark.createDataFrame(
            pd.DataFrame({"id_a": [0, 0], "id_b": [1, 4]})
        )
        out = dedup.ngram_jaccard_pairs(docs, cand, n=3).toPandas()
        j = dict(zip(zip(out.id_a, out.id_b), out.jaccard))
        assert j[(0, 1)] == 1.0  # identical docs
        assert j[(0, 4)] == 0.0  # disjoint docs


class TestSimsearch:
    def test_ivf_recall(self, spark):
        rng = np.random.default_rng(0)
        base = rng.standard_normal((400, 16)).astype(np.float32)
        vecs = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(400), "embedding": [v.tolist() for v in base]}
            )
        )
        q_pdf = pd.DataFrame(
            {
                "query_id": [f"q{i}" for i in range(8)],
                "q_vec": [base[i].tolist() for i in range(8)],
            }
        )
        exact = simsearch.cosine_topk(
            vecs,
            spark.createDataFrame(q_pdf),
            k=5,
        ).toPandas()
        approx = simsearch.ivf_topk(
            spark, vecs, q_pdf, k=5, nlist=8, nprobe=4
        ).toPandas()
        exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
        approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
        recall = np.mean(
            [
                len(exact_sets[q] & approx_sets.get(q, set())) / 5
                for q in exact_sets.index
            ]
        )
        assert recall >= 0.7, recall

    def test_ivf_indexed_layout_prunes_partitions(self, spark, tmp_path):
        """The materialized IVF layout must (a) return the same top-k as
        the inline ivf_topk and (b) prune the scan to the probed bucket
        directories (partition filter on ivf_bucket in the plan)."""
        rng = np.random.default_rng(0)
        base = rng.standard_normal((400, 16)).astype(np.float32)
        vecs = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(400), "embedding": [v.tolist() for v in base]}
            )
        )
        q_pdf = pd.DataFrame(
            {
                "query_id": [f"q{i}" for i in range(8)],
                "q_vec": [base[i].tolist() for i in range(8)],
            }
        )
        path = str(tmp_path / "ivf")
        simsearch.write_ivf_index(vecs, path, nlist=8)
        out = simsearch.ivf_topk_indexed(spark, path, q_pdf, k=5, nprobe=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ivf_bucket" in plan and "PartitionFilters: [" in plan
        # the partition filter must actually name the isin predicate
        assert "dynamicpruning" in plan or "ivf_bucket" in plan.split(
            "PartitionFilters"
        )[1][:400]
        inline = simsearch.ivf_topk(
            spark, vecs, q_pdf, k=5, nlist=8, nprobe=4
        ).toPandas()
        indexed = out.toPandas()
        key = ["query_id", "neighbor_id", "rank"]
        assert sorted(map(tuple, indexed[key].values.tolist())) == sorted(
            map(tuple, inline[key].values.tolist())
        )


class TestDistributedHierarchy:
    def test_compact_df_matches_kernel(self, spark, images):
        from h3_rs_spark.h3core import compact as kernel_compact
        from h3_rs_spark.operators.hierarchy_ops import (
            compact_cells_df,
            uncompact_cells_df,
        )

        cells_df = images.select("cell").distinct()
        cells_np = np.array([r[0] for r in cells_df.collect()], dtype=np.int64)

        got = sorted(
            r[0] for r in compact_cells_df(cells_df).collect()
        )
        exp = sorted(kernel_compact(cells_np).tolist())
        assert got == exp

        back = sorted(
            r[0]
            for r in uncompact_cells_df(
                compact_cells_df(cells_df), 9
            ).collect()
        )
        assert back == sorted(np.unique(cells_np).tolist())

    def test_compact_df_promotes_full_family(self, spark):
        import pandas as pd

        from h3_rs_spark.h3core import to_children
        from h3_rs_spark.operators.hierarchy_ops import compact_cells_df

        parent = 0x87283472BFFFFFF
        ch = to_children(parent, 9)
        df = spark.createDataFrame(pd.DataFrame({"cell": ch}))
        out = [r[0] for r in compact_cells_df(df).collect()]
        assert out == [parent]


def test_split_refine_equals_inline(spark, images):
    from h3_rs_spark.sources import datagen

    polys = {"sf_hexagon": datagen.POLYGONS["sf_hexagon"]}
    a = sorted(
        r[0]
        for r in pip_join(spark, images, polys, split_refine=False)
        .select("image_id").collect()
    )
    b = sorted(
        r[0]
        for r in pip_join(spark, images, polys, split_refine=True)
        .select("image_id").collect()
    )
    assert a == b


class TestDedupScale:
    """Scale-safety contracts: no forced broadcast of corpus-sized
    relations, hot-bucket capping, deterministic short-text hashing."""

    def _physical_plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_no_forced_broadcast_reattach(self, spark):
        """The signature/vector re-attach joins must not carry an explicit
        broadcast hint: with auto-broadcast disabled, the initial physical
        plan contains no BroadcastExchange (a hint would force one
        regardless of size — OOM at 100 TB)."""
        import pandas as pd

        pdf = pd.DataFrame({
            "doc_id": range(40),
            "text": [f"some words repeated here {i % 7} tail" for i in range(40)],
        })
        rng = np.random.default_rng(3)
        epdf = pd.DataFrame({
            "vec_id": range(40),
            "embedding": [rng.standard_normal(8).tolist() for _ in range(40)],
        })
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            docs = spark.createDataFrame(pdf)
            for df in (
                dedup.minhash_lsh_dedup(docs, jaccard_threshold=0.1),
                dedup.simhash_dedup(docs),
                dedup.embedding_near_dup(spark.createDataFrame(epdf), dim=8),
            ):
                plan = self._physical_plan(df)
                assert "BroadcastExchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_bucket_cap_star_pairs_hot_bucket(self, spark):
        """A hot bucket (identical docs) above the cap star-pairs to its
        min-id representative — linear pairs instead of quadratic, and
        the exact duplicates still reach verification; distinct docs in
        small buckets are unaffected."""
        import pandas as pd

        texts = ["the exact same boilerplate text again and again"] * 30 + [
            "unique document alpha beta gamma delta",
            "unique document alpha beta gamma epsilon",
        ]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        capped = dedup.minhash_lsh_dedup(
            docs, jaccard_threshold=0.3, bucket_cap=10
        ).toPandas()
        got = {tuple(sorted((a, b))) for a, b in zip(capped.id_a, capped.id_b)}
        # every hot-bucket member pairs with the representative (id 0)...
        assert {(0, j) for j in range(1, 30)} <= got
        # ...quadratic non-anchor pairs are NOT generated...
        assert not ((capped.id_a > 0) & (capped.id_a < 30) & (capped.id_b < 30)).any()
        # ...and the small-bucket near-dup pair survives
        assert (30, 31) in got

    def test_short_text_hash_deterministic(self):
        """Short-text shingle fallback must not use salted hash()."""
        h1 = dedup._shingle_hashes("ab", 5)
        h2 = dedup._shingle_hashes("ab", 5)
        assert (h1 == h2).all()
        # polynomial over the utf-8 bytes of "ab"
        assert int(h1[0]) == (ord("a") * 1_000_003 + ord("b")) % (1 << 64)
        assert int(dedup._shingle_hashes("", 5)[0]) == 0


class TestFingerprintVectorized:
    def test_matches_scalar_oracle(self):
        from h3_rs_spark.operators.textstats import _fp_batch, fingerprint_oracle

        rng = np.random.default_rng(11)
        texts = ["", "a", "hello world", "ü¢😀 unicode ∆", "x" * 3000] + [
            "".join(chr(int(c)) for c in rng.integers(32, 1200, size=int(n)))
            for n in rng.integers(0, 500, size=100)
        ]
        got = _fp_batch(texts)
        want = fingerprint_oracle(texts)
        assert (got == want).all()


class TestPolyfillDistributed:
    def test_equals_driver_polyfill(self, spark):
        """Distributed polyfill (coarse cover -> children explode ->
        centroid PIP) must equal driver polyfill cell-for-cell."""
        from h3_rs_spark.operators.polyfill_dist import polyfill_distributed

        ext, holes, _ = datagen.POLYGONS["sf_hexagon"]
        want = sorted(regions.polyfill(ext, holes, 9).tolist())
        got = sorted(
            r[0]
            for r in polyfill_distributed(
                spark, ext, holes, 9, coarse_res=5
            ).collect()
        )
        assert got == want and len(got) == 1253

    def test_with_holes_and_auto_coarse(self, spark):
        from h3_rs_spark.operators.polyfill_dist import polyfill_distributed

        ext, holes, _ = datagen.POLYGONS["sf_hexagon_2holes"]
        want = sorted(regions.polyfill(ext, holes, 8).tolist())
        got = sorted(
            r[0]
            for r in polyfill_distributed(spark, ext, holes, 8).collect()
        )
        assert got == want


class TestChildrenBatch:
    def test_matches_scalar(self):
        from h3_rs_spark.h3core import indexing as ix

        cells = [0x87283472BFFFFFF, 0x821C07FFFFFFFFF, 0x85283473FFFFFFF]
        o, got = ix.to_children_batch(np.array(cells), 9)
        for i, c in enumerate(cells):
            assert sorted(got[o == i].tolist()) == sorted(
                ix.to_children(c, 9).tolist()
            )


def test_uncompact_staged_multilevel(spark):
    """Staged uncompact (explode <= 4 levels per stage) equals the kernel
    children set exactly, including mixed input resolutions and a
    pentagon lineage."""
    from h3_rs_spark.h3core import indexing as ix
    from h3_rs_spark.operators.hierarchy_ops import uncompact_cells_df

    cells = [0x8029FFFFFFFFFFF, 0x824887FFFFFFFFF, 0x81083FFFFFFFFFF]
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = sorted(r[0] for r in uncompact_cells_df(df, 6).collect())
    want = sorted(
        np.concatenate([ix.to_children(c, 6) for c in cells]).tolist()
    )
    assert got == want


def test_polyfill_distributed_plan_shape(spark):
    """r7: the distributed-polyfill candidate pipeline must stay a
    single narrow pipeline — cover pre-split via parallelize (no
    repartition Exchange), pass-through branch skipped (no Union),
    children explode pure JVM (exactly one ArrowEvalPython: the
    centroid filter)."""
    from h3_rs_spark.operators.polyfill_dist import polyfill_distributed

    # big enough that pick_coarse_res chooses coarse_res < res (the
    # shape under test); plan-only, nothing executes
    ext = [(0.0, 0.0), (0.0, 1.5), (1.5, 1.5), (1.5, 0.0)]
    df = polyfill_distributed(spark, ext, [], 9)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    # formatted explain names each node twice (tree + detail); count
    # tree entries like "ArrowEvalPython (4)"
    assert plan.count("ArrowEvalPython (") == 1
    assert "Union" not in plan


def test_knn_sql_parity(spark):
    """The kNN round loop's SQL-text haversine and guaranteed-radius
    expressions (r7 driver-latency fix) must be BIT-identical to the
    Column forms — rank ties and the completion proof depend on exact
    doubles."""
    from h3_rs_spark.functions.native import haversine_m_col
    from h3_rs_spark.operators.knn import (
        _HAVERSINE_SQL,
        _guaranteed_radius_col,
        _safe_radius_sql,
    )

    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "lat": np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            "lng": rng.uniform(-180, 180, n),
            "q_lat": np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            "q_lng": rng.uniform(-180, 180, n),
            "ring": rng.integers(1, 10_000, n).astype(np.int64),
            # the loop state carries res_eff as INT (state select casts)
            "res_eff": rng.integers(0, 16, n).astype(np.int32),
        }
    )
    df = spark.createDataFrame(pdf)
    want = df.select(
        haversine_m_col(
            F.col("q_lat"), F.col("q_lng"), F.col("lat"), F.col("lng")
        ).alias("h"),
        _guaranteed_radius_col(F.col("ring"), F.col("res_eff")).alias(
            "s"
        ),
    ).toPandas()
    got = df.selectExpr(
        f"{_HAVERSINE_SQL} AS h", f"{_safe_radius_sql()} AS s"
    ).toPandas()
    # bitwise equality, not approx: the trees must be identical
    assert (
        want["h"].to_numpy().tobytes() == got["h"].to_numpy().tobytes()
    )
    assert (
        want["s"].to_numpy().tobytes() == got["s"].to_numpy().tobytes()
    )


def test_children_one_level_sql_parity(spark):
    """The SQL-text twin of children_one_level_col (r7 driver-latency
    fix) must produce the exact same children arrays, including the
    pentagon digit skip and across resolutions."""
    from h3_rs_spark.operators.hierarchy_ops import (
        children_one_level_col,
        children_one_level_sql,
    )

    # res-0 pentagon, a res-2 hexagon, a res-8 hexagon, res-1 pentagon
    cells = [
        0x8031FFFFFFFFFFF,
        0x824887FFFFFFFFF,
        0x8828309769FFFFF,
        0x81083FFFFFFFFFF,
    ]
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    col_form = {
        r["cell"]: sorted(r["kids"])
        for r in df.select(
            "cell", children_one_level_col("cell").alias("kids")
        ).collect()
    }
    sql_form = {
        r["cell"]: sorted(r["kids"])
        for r in df.selectExpr(
            "cell", f"{children_one_level_sql('cell')} AS kids"
        ).collect()
    }
    assert col_form == sql_form
    # pentagons skip the K digit: 6 children, hexagons 7
    assert len(sql_form[0x8031FFFFFFFFFFF]) == 6
    assert len(sql_form[0x824887FFFFFFFFF]) == 7


class TestPipBuildStrategy:
    def test_compacted_path_equals_expanded(self, spark, images, monkeypatch):
        """The cost-based build strategy must not change RESULTS: force
        the compacted multi-key probe (scale path for continental
        polygons) and compare with the default expanded single-key
        probe row-for-row."""
        from h3_rs_spark.operators import pip_join as pj

        polys = {
            k: v for k, v in datagen.POLYGONS.items() if v[2] == 9
        }
        expanded = set(
            (r["polygon_id"], r["image_id"])
            for r in pip_join(spark, images, polys).select(
                "polygon_id", "image_id"
            ).collect()
        )
        monkeypatch.setattr(pj, "_EXPAND_BUILD_MAX", 0)
        compacted = set(
            (r["polygon_id"], r["image_id"])
            for r in pip_join(spark, images, polys).select(
                "polygon_id", "image_id"
            ).collect()
        )
        assert compacted == expanded and len(expanded) > 0


class TestKnnShufflePath:
    def test_distributed_no_broadcast_matches(self, spark, images,
                                              oracle_geo):
        """broadcast_candidates=False (the huge-query-set shuffle-join
        path) must return identical rows."""
        from h3_rs_spark.operators.knn import (
            knn_join_distributed, knn_oracle,
        )

        queries = datagen.generate_knn_queries(spark, n=12, k=3)
        q_pdf = queries.toPandas()
        got = knn_join_distributed(
            spark, images, queries, k=3, res=9, broadcast_candidates=False
        ).toPandas()
        exp = knn_oracle(oracle_geo, q_pdf, k=3)
        g = got.sort_values(["query_id", "rank"], ignore_index=True)
        x = exp.sort_values(["query_id", "rank"], ignore_index=True)
        assert g["image_id"].tolist() == x["image_id"].tolist()


class TestHexRanges:
    def test_multi_origin_disks_and_pentagon_contract(self, spark):
        """hexRanges (the reference's only multi-origin traversal,
        h3-sys/src/ffi.rs:120-126) as one UDF call: disks match
        per-origin k_ring exactly; ok=False iff any disk touches a
        pentagon (the C call fails wholesale)."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F

        from h3_rs_spark.functions.udfs import hex_ranges_udf
        from h3_rs_spark.h3core import indexing, traversal
        from h3_rs_spark.h3core.constants import PENTAGON_BASE_CELLS

        hex_a = 0x8928308280FFFFF
        hex_b = 0x89283082803FFFF
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
                    "row_id": [0, 1],
                    "origins": [[hex_a, hex_b], [hex_a, pent]],
                }
            )
        )
        out = (
            df.withColumn("r", hex_ranges_udf(2)("origins"))
            .select("row_id", "r.ok", "r.disks")
            .orderBy("row_id")
            .collect()
        )
        # clean row: ok, each disk == that origin's exact k_ring set
        assert out[0]["ok"] is True
        for origin, disk in zip([hex_a, hex_b], out[0]["disks"]):
            _, exp = traversal.k_ring(
                np.array([origin], dtype=np.int64), 2
            )
            assert sorted(disk) == sorted(exp.tolist())
            assert len(disk) == 19
        # pentagon row: wholesale failure flag, disks still exact
        assert out[1]["ok"] is False
        assert len(out[1]["disks"][1]) == 16  # pentagon disk 1+5+10


class TestSeedingParity:
    def test_driver_and_distributed_seeders_agree(self, spark, images):
        """knn_join's driver-dialect seeder (_initial_plans_driver) and
        the all-Spark seed_state evaluate the SAME two-scale density
        formula; this pins them equal so the dialects cannot drift
        (the distributed seeder's raw base-res ring folds through
        _escalate_state to the driver seeder's pre-escalated plan)."""
        from h3_rs_spark.operators.knn import (
            _escalate_state,
            _initial_plans_driver,
            seed_state,
        )

        queries = datagen.generate_knn_queries(spark, n=24, k=5)
        q_pdf = queries.select("query_id", "lat", "lng").toPandas()
        plans = _initial_plans_driver(
            spark, images, q_pdf, 5, 9, "cell", 2
        )
        seeded = _escalate_state(
            seed_state(
                images, queries, 5, 9, cell_col="cell", initial_ring=2,
                prefilter_broadcast=True,
            )
        ).toPandas()
        got = {
            r["query_id"]: (int(r["res_eff"]), int(r["ring"]))
            for _, r in seeded.iterrows()
        }
        assert got == plans


class TestKnnEdgeCases:
    def test_empty_queries(self, spark, images):
        """Zero queries must return an empty typed result, not crash
        (exercises the unseeded entry + empty-levels break)."""
        from h3_rs_spark.operators.knn import knn_join

        empty_q = spark.createDataFrame(
            [], "query_id string, lat double, lng double"
        )
        out = knn_join(spark, images, empty_q, k=3, res=9)
        assert out.count() == 0
        assert set(out.columns) >= {"query_id", "image_id", "dist_m", "rank"}

    def test_empty_images_terminates(self, spark):
        """An empty fact relation must terminate via the exhaustion
        filter (queries never get topk rows to carry the done flag)
        and return zero rows — guards the r4 round restructure against
        an infinite expand loop."""
        import pandas as pd

        from h3_rs_spark.operators.knn import knn_join

        empty_imgs = spark.createDataFrame(
            [], "image_id long, lat double, lng double, cell long"
        )
        queries = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": ["q0"], "lat": [37.7], "lng": [-122.4]}
            )
        )
        out = knn_join(
            spark, images=empty_imgs, queries=queries, k=3, res=9,
            max_ring=64,
        )
        assert out.count() == 0


class TestGeoDiskDynUdf:
    def test_matches_encode_plus_kring(self, spark):
        """The fused dynamic-res disk UDF must equal geo_to_h3 composed
        with k_ring for every (res, ring) group in the batch."""
        import numpy as np
        import pandas as pd

        from h3_rs_spark.functions.udfs import geo_disk_dyn_udf
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import traversal

        rows = [
            (0, 37.77, -122.42, 9, 2),
            (1, -33.87, 151.21, 7, 1),
            (2, 0.0, 0.0, 5, 3),
            (3, 37.78, -122.41, 9, 2),  # same (res, ring) group as row 0
            (4, 80.0, 10.0, 3, 1),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["i", "lat", "lng", "res_eff", "ring"]
            )
        )
        got = {
            r["i"]: sorted(r["disk"])
            for r in df.select(
                "i",
                geo_disk_dyn_udf()("lat", "lng", "res_eff", "ring").alias(
                    "disk"
                ),
            ).collect()
        }
        for i, lat, lng, res, ring in rows:
            cell = fk.geo_to_h3(np.array([lat]), np.array([lng]), res)
            _, disk = traversal.k_ring(cell, ring)
            assert got[i] == sorted(disk.tolist()), i
