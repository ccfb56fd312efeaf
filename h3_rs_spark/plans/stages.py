"""Resumable stage runner with per-partition lineage + metrics
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Each named stage materializes to the warehouse with a fingerprint
manifest; a rerun whose input fingerprint matches skips straight to the
materialized output, so any stage of a multi-stage job is a resume
point. Metrics (per-partition row counts + stage wall time) and lineage
(stage -> input fingerprint + upstream stages) append to dedicated
tables; at design scale these live in Iceberg, here parquet
(sources/io.py rationale).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageRunner:
    spark: SparkSession
    root: str
    run_id: str = "default"
    _ran: list = field(default_factory=list)

    def _paths(self, name: str):
        base = os.path.join(self.root, name)
        return base, base + ".manifest.json"

    def stage(
        self,
        name: str,
        fingerprint: str,
        fn: Callable[[], DataFrame],
        upstream: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) a named stage.

        fingerprint should capture everything that determines the output
        (input table fingerprints + parameters); a matching manifest means
        the materialized parquet is current and the stage is skipped.
        """
        out_path, manifest_path = self._paths(name)
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)
            # resume needs BOTH a matching fingerprint and an intact
            # materialization — a surviving manifest over a deleted or
            # truncated output dir must re-run, not read partial data
            if manifest.get("fingerprint") == fingerprint and os.path.exists(
                os.path.join(out_path, "_SUCCESS")
            ):
                self._ran.append((name, "resumed"))
                return self.spark.read.parquet(out_path)

        t0 = time.time()
        df = fn()
        df.write.mode("overwrite").parquet(out_path)
        wall_s = time.time() - t0
        result = self.spark.read.parquet(out_path)

        metrics = (
            result.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .withColumn("stage", F.lit(name))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("wall_s", F.lit(float(wall_s)))
            .withColumn("fingerprint", F.lit(fingerprint))
        )
        metrics.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

        lineage = self.spark.createDataFrame(
            [
                (
                    name,
                    self.run_id,
                    fingerprint,
                    ",".join(upstream or []),
                    float(wall_s),
                    int(result.count()),
                )
            ],
            "stage string, run_id string, fingerprint string, upstream string,"
            " wall_s double, rows_total long",
        )
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))

        with open(manifest_path, "w") as fh:
            json.dump(
                {"fingerprint": fingerprint, "wall_s": wall_s, "stage": name}, fh
            )
        self._ran.append((name, "ran"))
        return result

    def history(self):
        return list(self._ran)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))
