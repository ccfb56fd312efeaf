"""Per-stage profiling of q14 (minhash_lsh_dedup) — guide §1: measure
before changing. Not part of the bench contract."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from h3_rs_spark.session import get_spark  # noqa: E402
from h3_rs_spark.operators import dedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(name, fn, n=3):
    fn()  # warm
    reps = []
    for _ in range(n):
        t0 = time.time()
        fn()
        reps.append(time.time() - t0)
    reps.sort()
    print(f"{name:40s} best {reps[0]:7.3f}  med {reps[len(reps)//2]:7.3f}",
          flush=True)


def main():
    spark = get_spark(app="profile_q14", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    print(f"documents rows: {n}")

    # full operator
    t("full minhash_lsh_dedup", lambda: dedup.minhash_lsh_dedup(
        docs, jaccard_threshold=0.5).collect())

    # stage 1: signature pass alone (persist + count, like the operator)
    def sig_only():
        d = dedup._ensure_parallelism(docs)
        sig = d.select(
            F.col("doc_id").alias("id"),
            dedup.minhash_signature_udf(64, 5)(F.col("text")).alias("sig"),
        )
        sig.write.format("noop").mode("overwrite").save()
    t("signature pass (noop)", sig_only)

    # stage 2: signature + tag representatives
    def tag_reps():
        d = dedup._ensure_parallelism(docs)
        sig = dedup._persist_tracked(d.select(
            F.col("doc_id").alias("id"),
            dedup.minhash_signature_udf(64, 5)(F.col("text")).alias("sig"),
        ))
        sig.count()
        members, rep = dedup._tag_representatives(sig, "sig")
        rep.write.format("noop").mode("overwrite").save()
        dedup.release_cached()
    t("sig + tag_representatives", tag_reps)

    # stage 3: everything up to bucket pairs (no sig re-attach)
    def to_pairs():
        d = dedup._ensure_parallelism(docs)
        sig = dedup._persist_tracked(d.select(
            F.col("doc_id").alias("id"),
            dedup.minhash_signature_udf(64, 5)(F.col("text")).alias("sig"),
        ))
        sig.count()
        members, rep = dedup._tag_representatives(sig, "sig")
        rows_per_band = 64 // 16
        band_cols = [
            F.struct(
                F.lit(i).alias("band"),
                F.hash(*[F.col("sig")[j] for j in range(
                    i * rows_per_band, (i + 1) * rows_per_band)]).alias(
                    "bucket"),
            )
            for i in range(16)
        ]
        banded = rep.select(
            "id", F.explode(F.array(*band_cols)).alias("bb")
        ).select("id", F.col("bb.band").alias("band"),
                 F.col("bb.bucket").alias("bucket"))
        pairs = dedup._bucket_pairs(banded, ["band", "bucket"], 10_000)
        pairs.write.format("noop").mode("overwrite").save()
        dedup.release_cached()
    t("sig + reps + bucket_pairs (noop)", to_pairs)

    spark.stop()


if __name__ == "__main__":
    main()
