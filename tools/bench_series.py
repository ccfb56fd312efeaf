"""Run the frozen bench N times and record each run with BOTH window
probes: the single-core numpy probe bench.py already reports, and a
32-way CPU dilation probe (parallel tasks' wall / ideal) — on this VM
class the single-core probe misses multi-core contention windows that
inflate every query uniformly (r7 continuation evidence).

Usage: python tools/bench_series.py [n_runs] [out.jsonl]
"""
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _burn(_):
    t = time.time()
    x = 0
    for i in range(10**7):
        x += i * i
    return time.time() - t


def dilation_probe(workers: int = 32) -> dict:
    t0 = time.time()
    single = _burn(0)
    with mp.Pool(workers) as p:
        t0 = time.time()
        r = p.map(_burn, range(workers))
        wall = time.time() - t0
    return {
        "single_s": round(single, 3),
        "wall_32_s": round(wall, 3),
        "avg_task_s": round(sum(r) / len(r), 3),
        # 1.0 = no contention; >1.5 = heavily contended window
        "dilation": round((sum(r) / len(r)) / single, 2),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_series.jsonl"
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    for i in range(n):
        probe = dilation_probe()
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True, text=True, env=env,
        )
        wall = round(time.time() - t0, 1)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        rec = {
            "i": i,
            "pre_dilation": probe,
            "bench": json.loads(line[-1]) if line else {"rc": p.returncode},
            "wall_s": wall,
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        b = rec["bench"]
        print(
            f"run {i}: headline {b.get('value')} guarded "
            f"{b.get('guarded_total_sec')} probe {b.get('cpu_probe_ms')} "
            f"dilation {probe['dilation']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
