"""One-rep job timeline for a catalog query: prints each Spark job's
submit/complete offsets plus the driver gaps between jobs (guide §1.5 /
§7.3). Usage: python tools/job_timeline.py q39_knn_distributed"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from h3_rs_spark import queries as Q
    from h3_rs_spark.session import get_spark

    name = sys.argv[1]
    log_dir = tempfile.mkdtemp(prefix="jt_evlog_")
    spark = get_spark(
        app="job_timeline", master=f"local[{CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if name in ("bench_knn_images", "bench_tile", "bench_pip"):
        from pyspark.sql import functions as F

        import bench as B
        from h3_rs_spark.operators.knn import knn_join
        from h3_rs_spark.operators.pip_join import pip_count
        from h3_rs_spark.operators.tiling import tile_assign
        from h3_rs_spark.sources import datagen

        sf = B._sf()
        images_path = B.ensure_images(spark, sf)

        def fn(spark, sf_dir, _path=images_path):
            images = spark.read.parquet(_path)
            if name == "bench_knn_images":
                return knn_join(
                    spark, images,
                    datagen.generate_knn_queries(spark, n=32, k=10),
                    k=10, res=9,
                )
            if name == "bench_tile":
                tile_input = images.limit(20_000).repartition(CPUS)
                return (
                    tile_assign(tile_input, tile_px=8, res=15)
                    .groupBy("cell").count()
                    .orderBy(F.desc("count")).limit(10)
                )
            polys9 = {k: v for k, v in datagen.POLYGONS.items()
                      if v[2] == 9}
            return pip_count(spark, images, polys9)
    elif name == "bench_q14":
        from h3_rs_spark.operators import dedup

        def fn(spark, sf_dir):
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            return dedup.minhash_lsh_dedup(docs, jaccard_threshold=0.5)
    else:
        fn, _sql = Q.catalog()[name]
    for _ in range(2):
        fn(spark, SF_DIR).collect()  # warm x2
    spark.sparkContext.setJobDescription("TIMED")
    t0 = time.time()
    fn(spark, SF_DIR).collect()
    wall = time.time() - t0
    spark.stop()
    time.sleep(1.0)

    import glob as _g
    paths = []
    for p in _g.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(p):
            paths.extend(f for f in _g.glob(os.path.join(p, "*"))
                         if os.path.isfile(f) and "appstatus" not in f)
        else:
            paths.append(p)
    jobs = {}
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event", "")
                if e == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    jobs[ev["Job ID"]] = {
                        "s": ev["Submission Time"], "c": None, "d": desc,
                        "stages": len(ev.get("Stage IDs", []))}
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["c"] = ev["Completion Time"]
    timed = sorted(
        (j for j in jobs.values() if j["d"] == "TIMED" and j["c"]),
        key=lambda j: j["s"])
    if not timed:
        print("no TIMED jobs found")
        return
    t_base = timed[0]["s"]
    prev_c = None
    gap_total = 0.0
    span_total = 0.0
    for j in timed:
        gap = (j["s"] - prev_c) / 1e3 if prev_c else 0.0
        gap_total += max(gap, 0.0)
        dur = (j["c"] - j["s"]) / 1e3
        span_total += dur
        print(f"  +{(j['s'] - t_base) / 1e3:6.3f}s job dur {dur:6.3f}s "
              f"gap_before {gap:6.3f}s stages {j['stages']}")
        prev_c = j["c"]
    print(f"{name}: wall {wall:.3f}s  jobs {len(timed)}  "
          f"job span {span_total:.3f}s  inter-job gaps {gap_total:.3f}s  "
          f"pre/post overhead {wall - span_total - gap_total:.3f}s")


if __name__ == "__main__":
    main()
