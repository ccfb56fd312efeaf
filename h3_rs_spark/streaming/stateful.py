"""Custom stateful streaming operator: running per-cell accumulators via
applyInPandasWithState (the escape hatch for stateful semantics that
watermarked window aggs can't express — here a lifetime running count +
max-value per cell that survives across micro-batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.udfs import geo_to_h3_udf
from .cells import with_synthetic_geo

STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),
        StructField("value_max", DoubleType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("n_total", LongType()),
        StructField("value_max", DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, vmax = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, vmax))
    yield pd.DataFrame({"cell": [key[0]], "n_total": [n], "value_max": [vmax]})


def running_cell_stats(events: DataFrame, res: int = 4) -> DataFrame:
    """Streaming per-cell lifetime counters (custom state machine)."""
    with_cell = with_synthetic_geo(events).withColumn(
        "cell", geo_to_h3_udf(res)("lat", "lng")
    )
    return (
        with_cell.select("cell", "value")
        .groupBy("cell")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_available_now(spark, src_path: str, res: int = 4) -> DataFrame:
    from .cells import events_stream

    q = (
        running_cell_stats(events_stream(spark, src_path), res=res)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_cell_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("running_cell_stats")
