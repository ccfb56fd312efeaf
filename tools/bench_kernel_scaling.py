"""Kernel-only scaling datapoint: aggregate geo_to_h3 throughput across
process counts (the pure-compute component of the pipeline, free of
Spark scheduling and JVM co-residency). Used in BENCH/BASELINE.md to
separate compute scaling from single-box memory/oversubscription
effects.

Run: python tools/bench_kernel_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_PER_PROC = 500_000


def work(seed: int) -> float:
    import numpy as np

    from h3_rs_spark.h3core import faceijk

    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85, 85, N_PER_PROC)
    lng = rng.uniform(-180, 180, N_PER_PROC)
    t0 = time.time()
    faceijk.geo_to_h3(lat, lng, 9)
    return time.time() - t0


def main():
    out = {}
    for nproc in (1, 8, 32):
        best = 0.0
        for _ in range(3):
            with mp.Pool(nproc) as p:
                t0 = time.time()
                p.map(work, range(nproc))
                dt = time.time() - t0
            best = max(best, nproc * N_PER_PROC / dt / 1e6)
        out[f"mrows_per_sec_{nproc}"] = round(best, 2)
    out["efficiency_8_to_32"] = round(
        (out["mrows_per_sec_32"] / out["mrows_per_sec_8"]) / 4.0, 3
    )
    print(json.dumps({"metric": "kernel_encode_scaling", **out}))


if __name__ == "__main__":
    main()
