"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

The flagship metric is exact PIP-join throughput over the synthetic
images table (BASELINE.json north metric); the images table is
generated deterministically once per (sf, size) into the warehouse and
read back from parquet so the timed path is the real scan->encode->
broadcast-join->refine pipeline, not datagen.

Scaling evidence (north_rule's N vs 4N executors, sandbox stand-in):
  python bench.py --scaling   # runs the flagship at local[8] and
                              # local[32] in separate JVMs and reports
                              # rows/sec + efficiency (BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# images rows scale with sf (sf0.1 -> 200k rows)
IMAGES_PER_SF = 2_000_000


def _sf() -> float:
    name = Path(SF_DIR).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_images(spark, sf: float) -> str:
    from h3_rs_spark.sources import datagen, io

    n = max(20_000, int(IMAGES_PER_SF * sf))
    path = io.warehouse_path(f"images_sf{sf}_n{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        io.write_images(datagen.generate_images(spark, n, w=16, h=16), path)
    return path


def run_headline(spark, sf: float) -> dict:
    from pyspark.sql import functions as F

    from h3_rs_spark import queries as Q
    from h3_rs_spark.operators.knn import knn_join
    from h3_rs_spark.operators.pip_join import pip_count
    from h3_rs_spark.operators.tiling import tile_assign
    from h3_rs_spark.sources import datagen

    images_path = ensure_images(spark, sf)
    images = spark.read.parquet(images_path)
    n_images = images.count()

    times: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)

    polys9 = {k: v for k, v in datagen.POLYGONS.items() if v[2] == 9}

    timed(
        "pip_images",
        lambda: pip_count(spark, images, polys9).collect(),
    )
    extra["pip_rows_per_sec"] = round(n_images / times["pip_images"], 1)

    timed(
        "tile_assign",
        lambda: tile_assign(images.limit(20_000), tile_px=8, res=15)
        .groupBy("cell").count().orderBy(F.desc("count")).limit(10).collect(),
    )
    timed(
        "knn_images",
        lambda: knn_join(
            spark, images, datagen.generate_knn_queries(spark, n=32, k=10),
            k=10, res=9,
        ).count(),
    )
    for name in (
        "q01_pricing_summary",
        "q06_broadcast_join_parts",
        "q09_dedup_exact",
        "q14_minhash_pairs",
        "q18_cosine_topk",
        "q23_h3_cell_density",
        "q26_pip_polygons",
        "q29_knn",
    ):
        fn, _sql = Q.catalog()[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).collect())
    return {"times": times, "extra": extra, "n_images": n_images}


def main():
    if "--scaling" in sys.argv:
        return scaling_main()
    from h3_rs_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf()
    out = run_headline(spark, sf)
    total = round(sum(out["times"].values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": out["times"],
                "sf": sf,
                "cpus": CPUS,
                "n_images": out["n_images"],
                "pip_rows_per_sec": out["extra"]["pip_rows_per_sec"],
            }
        )
    )
    spark.stop()


def scaling_main():
    """Flagship PIP job at two parallelism levels (N vs 4N stand-in)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["BENCH_PIP_ONLY"] = "1"
        p = subprocess.run(
            [sys.executable, __file__, "--pip-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[8], results[32]
    eff = (r8["pip_sec"] / r32["pip_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "rows_per_sec_8": r8["rows_per_sec"],
                "rows_per_sec_32": r32["rows_per_sec"],
                "pip_sec_8": r8["pip_sec"],
                "pip_sec_32": r32["pip_sec"],
                "n_images": r8["n_images"],
                "sf": _sf(),
            }
        )
    )


def pip_only():
    """One flagship PIP measurement in this JVM (used by --scaling)."""
    from h3_rs_spark.session import get_spark
    from h3_rs_spark.operators.pip_join import pip_count
    from h3_rs_spark.sources import datagen

    spark = get_spark(app="bench-pip", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf()
    images_path = ensure_images(spark, sf)
    images = spark.read.parquet(images_path)
    n = images.count()
    polys9 = {k: v for k, v in datagen.POLYGONS.items() if v[2] == 9}
    # warm-up (JIT/codegen), then measure
    pip_count(spark, images, polys9).collect()
    t0 = time.time()
    pip_count(spark, images, polys9).collect()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "pip_sec": round(dt, 3),
                "rows_per_sec": round(n / dt, 1),
                "n_images": n,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--pip-only" in sys.argv:
        pip_only()
    else:
        main()
