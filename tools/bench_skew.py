"""Skew-salting on/off comparison (BASELINE.md protocol item).

Joins the 16M-row skewed images table (metro geography: the SF res-1
cell holds ~30% of all rows) against a per-cell dimension via sort-merge
join (broadcast disabled, AQE skew-join disabled so the baseline shows
the raw hot-partition effect), then the same join salted. Also reports
the AQE-skew-join-enabled baseline for reference.

Run: python tools/bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from pyspark.sql import functions as F

    from h3_rs_spark.functions.native import h3_to_parent_col
    from h3_rs_spark.operators.skew import salted_join
    from h3_rs_spark.session import get_spark
    from h3_rs_spark.sources import io

    spark = get_spark(app="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    ing = io.warehouse_path("images_ingested_n16000000")
    if not os.path.exists(os.path.join(ing, "_SUCCESS")):
        raise SystemExit("run `BENCH_PHASE=join python bench.py --pip-only` first")
    images = (
        spark.read.parquet(ing)
        .withColumn("cell_r1", h3_to_parent_col("cell", 1))
        .select("image_id", "cell_r1")
    )
    dim = images.groupBy("cell_r1").agg(F.count("*").alias("cell_weight"))
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    dim = spark.read.parquet("/tmp/skew_dim")

    top = dim.orderBy(F.desc("cell_weight")).limit(3).collect()
    skew_info = {f"hot_cell_{i}": int(r["cell_weight"]) for i, r in enumerate(top)}

    def timed(fn):
        fn()
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    def plain():
        images.join(dim, "cell_r1").agg(
            F.sum("cell_weight"), F.count("*")
        ).collect()

    def salted():
        salted_join(images, dim, "cell_r1", salt_buckets=32).agg(
            F.sum("cell_weight"), F.count("*")
        ).collect()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_plain = timed(plain)
    t_salted = timed(salted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe = timed(plain)

    print(
        json.dumps(
            {
                "metric": "skew_join_16m_rows_sec",
                "plain_no_aqe": t_plain,
                "salted_32_buckets": t_salted,
                "plain_aqe_skewjoin": t_aqe,
                "speedup_salted_vs_plain": round(t_plain / t_salted, 2),
                **skew_info,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
