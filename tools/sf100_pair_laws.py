"""sf100 pair-family stress: structural-law verification at 2.5e9-pair
output scale (row-for-row oracle infeasible for the OUTPUT size; the
pair relations were proven row-for-row at sf10)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from h3_rs_spark.operators import dedup
from h3_rs_spark import queries as Q

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "64g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

corpus = Q._dup_injected_docs(spark, "/tmp/sf100").persist()
n = corpus.count()
groups = corpus.groupBy(F.md5("text")).count()
g = groups.agg(
    F.sum(F.when(F.col("count") >= 2, F.col("count") * (F.col("count") - 1) / 2)).alias("within"),
    F.count("*").alias("n_groups"),
).first()
expect_within = int(g["within"])
print(f"corpus={n} groups={g['n_groups']} expected_within_pairs={expect_within}")

t0 = time.time()
pairs = dedup.minhash_lsh_dedup(corpus, jaccard_threshold=0.5)
st = pairs.agg(
    F.count("*").alias("n"),
    F.sum((F.col("id_a") < F.col("id_b")).cast("long")).alias("n_ord"),
    F.min("est_jaccard").alias("mn"), F.max("est_jaccard").alias("mx"),
    F.sum((F.col("est_jaccard") == 1.0).cast("long")).alias("n_exact"),
).first()
wall = time.time() - t0
dedup.release_cached()
print(f"minhash sf100: pairs={st['n']} ordered={st['n_ord']} "
      f"est in [{st['mn']},{st['mx']}] exact={st['n_exact']} wall={wall:.0f}s")
assert st["n_ord"] == st["n"], "ordering law"
assert st["mn"] >= 0.5 and st["mx"] <= 1.0, "threshold law"
assert st["n_exact"] >= expect_within, (
    f"100% exact-dup recall law: {st['n_exact']} < {expect_within}")
print("ALL LAWS PASS")
spark.stop()
