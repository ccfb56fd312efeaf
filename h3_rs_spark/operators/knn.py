"""kNN join: expanding k_ring candidate generation + haversine re-rank.

Plan shape (SURVEY.md §7.3): queries are a small dimension; images the
10^12-row fact. Per round, candidate cells = k_ring_distances(query cell,
ring) exploded to (query_id, cell) and *broadcast*; the probe side is a
single BroadcastHashJoin on the cell column (no shuffle of the fact
table). The haversine re-rank is pure JVM trig; top-k is a window over
the (small) matched candidate set. Queries finish when they hold k
candidates whose k-th distance is provably inside the ring's guaranteed
coverage radius; unsatisfied queries (sparse regions) expand the ring and
re-join — each round touches only the remaining queries' cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.native import haversine_m_col
from ..functions.udfs import geo_to_h3_udf
from ..h3core import traversal
from ..h3core.constants import EDGE_LENGTH_M

# conservative minimum center-to-center spacing between adjacent cells,
# accounting for icosahedron distortion (avg spacing ~= 1.73 * edge; the
# worst-case shrink factor is ~0.75)
_MIN_SPACING_FACTOR = 1.2


def _guaranteed_radius_m(ring: int, res: int) -> float:
    """Every point within this geo distance of a query point is inside
    some cell at grid distance <= ring (planar hex lattice bound with a
    distortion safety factor; validated against the exact oracle in
    tests/test_operators.py)."""
    s = _MIN_SPACING_FACTOR * EDGE_LENGTH_M[res]
    return max(0.0, ((ring + 1) * 0.866 - 1.16) * s)


def knn_join(
    spark: SparkSession,
    images: DataFrame,
    queries: DataFrame,
    k: int,
    res: int,
    cell_col: str = "cell",
    initial_ring: int = 1,
    max_ring: int = 64,
) -> DataFrame:
    """Exact k nearest images per query point.

    images: fact table with `cell_col` (res `res`), lat, lng, image_id.
    queries: query_id, lat, lng (k is the parameter, uniform per call).
    Returns (query_id, image_id, dist_m, rank), ties broken by image_id —
    matching the single-process oracle row-for-row.
    """
    q_pdf = queries.select("query_id", "lat", "lng").toPandas()
    q_pdf["q_cell"] = traversal.fk.geo_to_h3(
        q_pdf["lat"].to_numpy(), q_pdf["lng"].to_numpy(), res
    )

    remaining = q_pdf
    ring = initial_ring
    results = []
    while len(remaining) and ring <= max_ring:
        owner, cells, _dist = traversal.k_ring_distances(
            remaining["q_cell"].to_numpy(dtype=np.int64), ring
        )
        cand_pdf = pd.DataFrame(
            {
                "query_id": remaining["query_id"].to_numpy()[owner],
                "q_lat": remaining["lat"].to_numpy()[owner],
                "q_lng": remaining["lng"].to_numpy()[owner],
                "cand_cell": cells,
            }
        )
        cand = F.broadcast(spark.createDataFrame(cand_pdf))
        matched = images.join(cand, images[cell_col] == cand["cand_cell"], "inner")
        scored = matched.withColumn(
            "dist_m",
            haversine_m_col(F.col("q_lat"), F.col("q_lng"), F.col("lat"), F.col("lng")),
        )
        w = Window.partitionBy("query_id").orderBy("dist_m", "image_id")
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "image_id", "dist_m", "rank")
        )
        stats = (
            topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist_m").alias("kth"))
            .toPandas()
        )
        safe = _guaranteed_radius_m(ring, res)
        done_ids = set(
            stats.loc[(stats["cnt"] >= k) & (stats["kth"] <= safe), "query_id"]
        )
        if ring >= max_ring:
            done_ids = set(remaining["query_id"])
        if done_ids:
            results.append(
                topk.where(F.col("query_id").isin(sorted(done_ids))).toPandas()
            )
        remaining = remaining[~remaining["query_id"].isin(done_ids)]
        ring = ring * 2
    if len(remaining):
        raise RuntimeError(
            f"knn_join: {len(remaining)} queries unsatisfied at max_ring={max_ring}"
        )
    out = pd.concat(results, ignore_index=True) if results else pd.DataFrame(
        columns=["query_id", "image_id", "dist_m", "rank"]
    )
    return spark.createDataFrame(out)


def knn_oracle(images_pdf: pd.DataFrame, queries_pdf: pd.DataFrame, k: int):
    """Single-process exact oracle (numpy haversine over the full table)."""
    from ..h3core.geom import haversine_m

    rows = []
    ilat = np.radians(images_pdf["lat"].to_numpy(dtype=np.float64))
    ilng = np.radians(images_pdf["lng"].to_numpy(dtype=np.float64))
    ids = images_pdf["image_id"].to_numpy()
    for _, q in queries_pdf.iterrows():
        d = haversine_m(
            np.radians(q["lat"]), np.radians(q["lng"]), ilat, ilng
        )
        order = np.lexsort((ids, d))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((q["query_id"], ids[j], float(d[j]), rank))
    return pd.DataFrame(rows, columns=["query_id", "image_id", "dist_m", "rank"])
