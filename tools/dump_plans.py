"""Dump .explain('formatted') for the bench-path queries into
plans/<tag>/<name>_<suffix>.txt (judge evidence, guide §1.1/§7.2).

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from h3_rs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def build_frames(spark):
    """name -> lazily-built DataFrame for every bench-path query."""
    from h3_rs_spark import queries as Q
    from h3_rs_spark.operators import dedup
    from h3_rs_spark.operators.knn import knn_join
    from h3_rs_spark.operators.pip_join import pip_count
    from h3_rs_spark.operators.tiling import tile_assign
    from h3_rs_spark.sources import datagen

    frames = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frames["q14_minhash_pairs"] = lambda: dedup.minhash_lsh_dedup(
        docs, jaccard_threshold=0.5
    )

    import bench as B

    images_path = B.ensure_images(spark, 0.1)
    images = spark.read.parquet(images_path)
    polys9 = {k: v for k, v in datagen.POLYGONS.items() if v[2] == 9}
    frames["pip_images"] = lambda: pip_count(spark, images, polys9)
    frames["tile_assign"] = lambda: (
        tile_assign(images.limit(20_000).repartition(CPUS), tile_px=8, res=15)
        .groupBy("cell").count().orderBy(F.desc("count")).limit(10)
    )
    frames["knn_images"] = lambda: knn_join(
        spark, images, datagen.generate_knn_queries(spark, n=32, k=10),
        k=10, res=9,
    )
    for name in (
        "q01_pricing_summary", "q06_broadcast_join_parts", "q09_dedup_exact",
        "q18_cosine_topk", "q23_h3_cell_density", "q26_pip_polygons",
        "q29_knn", "q36_compact_distributed", "q37_polyfill_distributed",
        "q39_knn_distributed", "q40_stream_dedup",
    ):
        fn, _sql = Q.catalog()[name]
        frames[name] = lambda fn=fn: fn(spark, SF_DIR)
    return frames


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app="dump_plans", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    frames = build_frames(spark)
    for name, build in frames.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = plan_str(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building/explaining {name}: {e!r}"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
