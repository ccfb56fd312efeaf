"""Round-7 follow-up profiling: per-query wall vs summed job span vs
task/CPU time on the current machine (guide §1 measure-first; §7.3
driver-gap diagnosis). Not part of the bench contract.

Usage: python tools/profile_heavy.py [query ...]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _eventlog_jobs(log_dir):
    """Return list of (job_id, submit_ms, complete_ms) and summed task
    metrics from the Spark event log."""
    import glob as _g

    jobs = {}
    tot = {"run": 0.0, "cpu": 0.0, "gc": 0.0, "tasks": 0,
           "shuffle_write": 0.0, "fetch_wait": 0.0}
    paths = []
    for p in _g.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(p):
            paths.extend(
                f for f in _g.glob(os.path.join(p, "*"))
                if os.path.isfile(f) and "appstatus" not in f
            )
        else:
            paths.append(p)
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event", "")
                if e == "SparkListenerJobStart":
                    jobs.setdefault(ev["Job ID"], [None, None])[0] = ev[
                        "Submission Time"]
                elif e == "SparkListenerJobEnd":
                    jobs.setdefault(ev["Job ID"], [None, None])[1] = ev[
                        "Completion Time"]
                elif e == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    tot["run"] += m.get("Executor Run Time", 0) / 1e3
                    tot["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                    tot["gc"] += m.get("JVM GC Time", 0) / 1e3
                    sw = m.get("Shuffle Write Metrics") or {}
                    tot["shuffle_write"] += sw.get(
                        "Shuffle Write Time", 0) / 1e9
                    sr = m.get("Shuffle Read Metrics") or {}
                    tot["fetch_wait"] += sr.get("Fetch Wait Time", 0) / 1e3
                    tot["tasks"] += 1
    return jobs, tot


def main():
    import tempfile

    from pyspark.sql import functions as F

    from h3_rs_spark import queries as Q
    from h3_rs_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="prof_evlog_")
    spark = get_spark(
        app="profile_heavy", master=f"local[{CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    names = sys.argv[1:] or [
        "q39_knn_distributed", "q36_compact_distributed",
        "q37_polyfill_distributed", "q40_stream_dedup",
        "q14_minhash_pairs", "q29_knn", "q23_h3_cell_density",
    ]
    cat = Q.catalog()
    results = {}
    for name in names:
        fn, _sql = cat[name]
        sc.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).collect()  # warm
        reps = []
        spans = []
        for i in range(3):
            sc.setJobDescription(f"{name}:rep{i}")
            # marker jobs so we can bracket this rep in the event log
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            reps.append(time.time() - t0)
        reps.sort()
        results[name] = {"best": round(reps[0], 3),
                         "med": round(reps[1], 3)}
        print(f"{name:28s} best {reps[0]:6.3f}  med {reps[1]:6.3f}",
              flush=True)
    spark.stop()
    time.sleep(1.0)
    jobs, tot = _eventlog_jobs(log_dir)
    span = sum((c - s) / 1e3 for s, c in jobs.values()
               if s is not None and c is not None)
    print(f"\njobs {len(jobs)}  total job span {span:.2f}s")
    print(f"task run {tot['run']:.1f}s  cpu {tot['cpu']:.1f}s  "
          f"gc {tot['gc']:.1f}s  shufw {tot['shuffle_write']:.1f}s  "
          f"fetchwait {tot['fetch_wait']:.1f}s  tasks {tot['tasks']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
