"""Cell-bucketed tables for co-located (shuffle-free) joins.

At 100 TB, repeated joins between fact tables on the cell key (e.g.
images x tiles, images x per-cell stats) should not shuffle either side:
write both bucketed by the same cell column with the same bucket count
and Spark's sort-merge join runs with NO Exchange on either side
(verified in tests/test_infra.py::TestBucketing — the physical plan has
no shuffle). Bucket count is a layout-time decision: ~2-4x the target
cluster's total cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str = "cell", buckets: int = 64
) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "cell"
) -> DataFrame:
    """Join two same-bucketed tables; plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)
