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

from ..functions.native import h3_to_parent_col, haversine_m_col
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


_COARSEN_AT = 16  # ring size beyond which we escalate to a coarser res


def knn_join(
    spark: SparkSession,
    images: DataFrame,
    queries: DataFrame,
    k: int,
    res: int,
    cell_col: str = "cell",
    initial_ring: int = 2,
    max_ring: int = 1 << 20,
) -> DataFrame:
    """Exact k nearest images per query point.

    images: fact table with `cell_col` (res `res`), lat, lng, image_id.
    queries: query_id, lat, lng (k is the parameter, uniform per call).
    Returns (query_id, image_id, dist_m, rank), ties broken by image_id —
    matching the single-process oracle row-for-row.

    Multi-resolution escalation: queries in sparse regions would need
    huge rings at the base res, so once the ring exceeds _COARSEN_AT the
    round re-runs at res-2 (49x larger cells) with the probe keyed on the
    JVM-computed parent cell — same coverage, bounded ring sizes, and the
    fact table never gains a new column or shuffle. `max_ring` bounds the
    *equivalent base-res ring* (geo radius), not the per-round BFS size.

    Density precheck: one broadcast-join count
    job over a coarse disk around each query estimates the local fact
    density and picks the starting (res_eff, ring) per query — dense
    metro queries start at ring ~2 while sparse-ocean queries jump
    straight to a coarse res, instead of every query paying the same
    blind expand-and-retry round sequence. Completion is still proven by
    the guaranteed-radius test, so the result is exact regardless of the
    estimate.
    """
    q_pdf = queries.select("query_id", "lat", "lng").toPandas()
    out = _knn_run(
        spark, images, q_pdf, k, res, cell_col, initial_ring, max_ring
    )
    return spark.createDataFrame(out)


def _initial_plans(spark, images, q_pdf, k, res, cell_col, initial_ring):
    """Per-query starting (res_eff, ring) from one coarse density job."""
    res_pre = max(0, res - 4)
    q_cells = traversal.fk.geo_to_h3(
        q_pdf["lat"].to_numpy(), q_pdf["lng"].to_numpy(), res_pre
    )
    owner, cells, _ = traversal.k_ring_distances(q_cells, 1)
    pre = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": q_pdf["query_id"].to_numpy()[owner],
                    "pre_cell": cells,
                }
            )
        )
    )
    probe_key = (
        images[cell_col]
        if res_pre == res
        else h3_to_parent_col(images[cell_col], res_pre)
    )
    cnt = (
        images.join(pre, probe_key == pre["pre_cell"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("query_id")["n"]
    )
    # disk of 7 pre-cells covers ~7^(res-res_pre+1) base-res cells
    cover = 7.0 ** (res - res_pre + 1)
    plans = {}
    for qid in q_pdf["query_id"]:
        n = float(cnt.get(qid, 0))
        density = n / cover  # fact rows per base-res cell
        if density > 0:
            # ring holding ~3k expected rows (cells(r) ~= 3r^2)
            r = int(np.ceil(1.3 * np.sqrt(k / density))) + 1
        else:
            # nothing within the coarse disk: start at the coarse res
            r = _COARSEN_AT * 7 ** ((res - res_pre) // 2)
        r = max(r, initial_ring)
        res_eff = res
        while r > _COARSEN_AT and res_eff > 0:
            res_eff = max(0, res_eff - 2)
            r = max(1, r // 7)
        plans[qid] = (res_eff, r)
    return plans


def _knn_run(spark, images, q_pdf, k, res, cell_col, initial_ring, max_ring):
    plans = _initial_plans(
        spark, images, q_pdf, k, res, cell_col, initial_ring
    )
    state = q_pdf.copy().reset_index(drop=True)
    state["res_eff"] = [plans[q][0] for q in state["query_id"]]
    state["ring"] = [plans[q][1] for q in state["query_id"]]

    results = []
    while len(state):
        # per-query resolution escalation for oversized rings
        while True:
            m = (state["ring"] > _COARSEN_AT) & (state["res_eff"] > 0)
            if not m.any():
                break
            state.loc[m, "res_eff"] = (state.loc[m, "res_eff"] - 2).clip(lower=0)
            state.loc[m, "ring"] = (state.loc[m, "ring"] // 7).clip(lower=1)

        # candidate cells per (res_eff, ring) group (driver-side numpy),
        # ONE probe join per distinct res_eff, ONE Spark job per round:
        # the per-res_eff matched relations union before the top-k window
        cand_by_res: dict[int, list] = {}
        for (re_, rg), grp in state.groupby(["res_eff", "ring"]):
            q_cells = traversal.fk.geo_to_h3(
                grp["lat"].to_numpy(), grp["lng"].to_numpy(), int(re_)
            )
            owner, cells, _ = traversal.k_ring_distances(q_cells, int(rg))
            cand_by_res.setdefault(int(re_), []).append(
                pd.DataFrame(
                    {
                        "query_id": grp["query_id"].to_numpy()[owner],
                        "q_lat": grp["lat"].to_numpy()[owner],
                        "q_lng": grp["lng"].to_numpy()[owner],
                        "cand_cell": cells,
                    }
                )
            )
        parts = []
        for re_, frames in cand_by_res.items():
            cand = F.broadcast(
                spark.createDataFrame(pd.concat(frames, ignore_index=True))
            )
            probe_key = (
                images[cell_col]
                if re_ == res
                else h3_to_parent_col(images[cell_col], re_)
            )
            parts.append(
                images.join(cand, probe_key == cand["cand_cell"], "inner")
                .select("image_id", "lat", "lng", "query_id", "q_lat", "q_lng")
            )
        matched = parts[0]
        for p in parts[1:]:
            matched = matched.unionByName(p)
        scored = matched.withColumn(
            "dist_m",
            haversine_m_col(
                F.col("q_lat"), F.col("q_lng"), F.col("lat"), F.col("lng")
            ),
        )
        w = Window.partitionBy("query_id").orderBy("dist_m", "image_id")
        topk_pdf = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "image_id", "dist_m", "rank")
            .toPandas()
        )

        # per-query completion: k hits whose k-th distance is provably
        # inside the query's OWN ring coverage radius
        stats = topk_pdf.groupby("query_id")["dist_m"].agg(["count", "max"])
        done = []
        for row in state.itertuples(index=False):
            qid = row.query_id
            safe = _guaranteed_radius_m(int(row.ring), int(row.res_eff))
            st = stats.loc[qid] if qid in stats.index else None
            ok = st is not None and st["count"] >= k and st["max"] <= safe
            eq_base_ring = int(row.ring) * 7 ** ((res - int(row.res_eff)) // 2)
            exhausted = eq_base_ring >= max_ring or (
                int(row.res_eff) == 0 and int(row.ring) >= 32
            )
            done.append(bool(ok or exhausted))
        done = np.array(done)
        done_ids = set(state.loc[done, "query_id"])
        if done_ids:
            results.append(topk_pdf[topk_pdf["query_id"].isin(done_ids)])
        state = state[~done].copy()
        state["ring"] = state["ring"] * 4
    return (
        pd.concat(results, ignore_index=True)
        if results
        else pd.DataFrame(columns=["query_id", "image_id", "dist_m", "rank"])
    )


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
