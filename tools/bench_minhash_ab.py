"""A/B: Arrow (pandas-UDF) vs all-JVM (xxhash64/transform) minhash
signatures (VERDICT r4 #6 — q14's signature stage has been the headline's
dominant term for three rounds).

Measures, per impl, on (a) the sf0.1 documents table and (b) a
REPLICATES x replicated corpus (id-shifted, same construction as
tools/make_sf1.py):
  - sig_sec: the signature stage alone (forced via an aggregation that
    touches every signature element, no driver transfer of arrays)
  - e2e_sec: full minhash_lsh_dedup pair count

Run: python tools/bench_minhash_ab.py [replicates]
Prints one JSON line; record in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    replicates = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from pyspark.sql import functions as F

    from h3_rs_spark.operators import dedup
    from h3_rs_spark.session import get_spark

    spark = get_spark(app="minhash-ab", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    shift = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    big = docs
    for r in range(1, replicates):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * shift))
        )
    big = big.repartition(64).persist()
    n_big = big.count()

    def force_sig(sig_df) -> None:
        # touch every element so lazy/codegen paths can't skip work;
        # result is one scalar, nothing wide reaches the driver. XOR
        # fold, not sum — ANSI mode raises on int64 sum overflow
        sig_df.select(
            F.aggregate(
                "sig", F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)
            ).alias("s")
        ).agg(F.count_distinct("s")).collect()

    out = {"n_small": docs.count(), "n_big": n_big, "replicates": replicates}
    for label, corpus in (("small", docs), ("big", big)):
        for impl in ("arrow", "jvm"):
            if impl == "jvm":
                sig_fn = lambda c: dedup.minhash_signature_jvm(c)  # noqa: E731
            else:
                sig_fn = lambda c: c.select(  # noqa: E731
                    F.col("doc_id").alias("id"),
                    dedup.minhash_signature_udf()(F.col("text")).alias("sig"),
                )
            force_sig(sig_fn(corpus))  # warm (codegen/python workers)
            reps = []
            for _ in range(3):
                t0 = time.time()
                force_sig(sig_fn(corpus))
                reps.append(time.time() - t0)
            out[f"sig_{label}_{impl}_sec"] = round(sorted(reps)[1], 3)
        for impl in ("arrow", "jvm"):
            # isolate legs: minhash_lsh_dedup persists its signature
            # relation internally and earlier legs' stale caches would
            # pressure later measurements (r5 review); re-cache only
            # the corpus actually being benchmarked
            spark.catalog.clearCache()
            corpus.persist()
            corpus.count()
            t0 = time.time()
            n = dedup.minhash_lsh_dedup(
                corpus, jaccard_threshold=0.5, impl=impl
            ).count()
            out[f"e2e_{label}_{impl}_sec"] = round(time.time() - t0, 3)
            out[f"e2e_{label}_{impl}_pairs"] = n
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
