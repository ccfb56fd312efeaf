"""Point-in-polygon join: the engine's flagship operator.

Plan shape (SURVEY.md §2.9/§4.2, designed for 10^12-row probe tables):

  1. Driver-side polyfill of each polygon at its target res (polygons are
     a small dimension; cells <= ~1e5 each), split into interior cells
     and boundary cells (cells whose hexagon crosses the outline).
  2. Interior cells are *compacted* to a multi-res antichain, shrinking
     the broadcast build side ~6x (SF hexagon: 1253 -> 209).
  3. The probe side derives one parent key per distinct build res with
     pure JVM bit math (functions/native.h3_to_parent_col) and explodes —
     a BroadcastHashJoin with no probe-side shuffle. Because the compacted
     set is an antichain, each probe row matches at most one build row
     (no double counting; asserted in tests).
  4. Only rows matched to *boundary* cells pay the exact ray-casting PIP
     refinement (Arrow-batched pandas UDF); interior matches are free.

  At scale, partition pruning comes for free: the images table is
  partitioned by coarse cell (sources/io.write_images) and the build
  side's distinct bc0 prefixes are pushed as a partition filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions.native import h3_base_cell, h3_resolution, h3_to_parent_col
from ..h3core import indexing as ix
from ..h3core import regions


def build_polygon_cells(polygons: dict, compacted: bool = True) -> pd.DataFrame:
    """Driver-side polyfill -> (polygon_id, cell, is_boundary) build table.

    polygons: {polygon_id: (exterior, holes, res)}.
    """
    rows = []
    for pid, (ext, holes, res) in polygons.items():
        interior, boundary = regions.polygon_cover(ext, holes, res)
        if compacted and len(interior):
            interior = np.asarray(regions_compact(interior))
        for c in interior:
            rows.append((pid, int(c), False))
        for c in boundary:
            rows.append((pid, int(c), True))
    return pd.DataFrame(rows, columns=["polygon_id", "cell", "is_boundary"])


def regions_compact(cells):
    from ..h3core.hierarchy import compact

    return compact(cells)


_BUILD_CACHE: dict = {}


def _polygons_key(polygons: dict, compacted: bool):
    return (
        compacted,
        tuple(
            (
                pid,
                int(res),
                np.asarray(ext, dtype=np.float64).tobytes(),
                tuple(
                    np.asarray(h, dtype=np.float64).tobytes()
                    for h in (holes or [])
                ),
            )
            for pid, (ext, holes, res) in sorted(polygons.items())
        ),
    )


def _build_cells_cached(polygons: dict, compacted: bool) -> pd.DataFrame:
    """build_polygon_cells + _maybe_expand_build, memoized on polygon
    geometry content. Pure function of constants (no fact-table input
    touches this); bounded so pathological callers can't grow it."""
    key = _polygons_key(polygons, compacted)
    hit = _BUILD_CACHE.get(key)
    if hit is None:
        hit = _maybe_expand_build(
            build_polygon_cells(polygons, compacted=compacted), polygons
        )
        if len(_BUILD_CACHE) >= 16:
            _BUILD_CACHE.pop(next(iter(_BUILD_CACHE)))
        _BUILD_CACHE[key] = hit
    return hit


def pip_join(
    spark: SparkSession,
    images: DataFrame,
    polygons: dict,
    cell_col: str = "cell",
    compacted: bool = True,
    refine: bool = True,
    prune_partitions: bool = True,
    prebuilt_cells: pd.DataFrame | None = None,
    split_refine: bool = False,
) -> DataFrame:
    """Join images (with a `cell_col` at each polygon's res and lat/lng
    columns) against polygons; returns matched rows + polygon_id.

    prebuilt_cells: pass the build_polygon_cells() output to reuse the
    driver-side polyfill across repeated joins (benchmark steady state).

    split_refine: persist the matched rows and route ONLY boundary
    matches through the Python refine. Measured tradeoff on the 16M-row
    bench: the inline path wins (5.5s vs 10.6s) because matched rows
    carry wide payload columns that make the persist expensive, while
    the inline Arrow pass is masked to boundary rows anyway; split wins
    only for narrow probes with huge interior/boundary ratios."""
    # cost-based build strategy: a compacted build keeps the broadcast
    # tiny but makes the PROBE side explode one parent key per distinct
    # build resolution — at 10^8+ probe rows that multiplies the join
    # input 4-5x. When the UNCOMPACTED build still fits a broadcast
    # comfortably, expanding it driver-side and probing on the single
    # native-res key is strictly cheaper (measured ~25% on the 64M-row
    # flagship). Compaction remains the scale path for continental
    # polygons at fine res, where expansion would be millions of cells.
    if prebuilt_cells is not None:
        build_pdf = _maybe_expand_build(prebuilt_cells, polygons)
    else:
        # memoized on the polygon GEOMETRY (pure driver-side derivation
        # of a constant dimension table — nothing from the fact inputs;
        # same pattern as dedup._minhash_params): re-deriving the
        # polyfill+compact+expand per call measured ~0.15 s, ~20% of
        # the whole flagship query at bench scale (r7)
        build_pdf = _build_cells_cached(polygons, compacted)
    build_res = sorted(
        int(r) for r in np.unique(ix.get_resolution(build_pdf["cell"].to_numpy()))
    )
    build = F.broadcast(
        spark.createDataFrame(build_pdf).withColumnsRenamed({"cell": "poly_cell"})
    )

    probe = images
    if prune_partitions and "bc0" in images.columns:
        bc0s = sorted(
            int(b)
            for b in np.unique(
                ix.get_base_cell(build_pdf["cell"].to_numpy(dtype=np.int64))
            )
        )
        probe = probe.where(F.col("bc0").isin(bc0s))

    # one JVM-side parent key per distinct build resolution; the
    # single-res case (every expanded build, and any single-res
    # compaction) skips the array+explode Generate node entirely — the
    # generator copies every probe row, a pure bandwidth tax when
    # there is only one key (r4 narrowed-probe work)
    if len(build_res) == 1:
        probe = probe.withColumn(
            "probe_key", h3_to_parent_col(cell_col, build_res[0])
        )
    else:
        keys = F.array(*[h3_to_parent_col(cell_col, r) for r in build_res])
        probe = probe.withColumn("probe_key", F.explode(keys))

    joined = probe.join(build, probe["probe_key"] == build["poly_cell"], "inner")

    if refine and split_refine:
        from pyspark.storagelevel import StorageLevel

        joined = joined.persist(StorageLevel.MEMORY_AND_DISK)
        interior = joined.where(~F.col("is_boundary"))
        boundary = _refine_boundary(joined.where(F.col("is_boundary")), polygons)
        joined = interior.unionByName(boundary)
    elif refine:
        joined = _refine_boundary(joined, polygons)
    return joined.drop("probe_key", "poly_cell", "is_boundary")


_EXPAND_BUILD_MAX = 200_000  # uncompacted build cells worth broadcasting


def _maybe_expand_build(build_pdf: pd.DataFrame, polygons: dict) -> pd.DataFrame:
    """Expand compacted interior cells to each polygon's native res when
    the result stays broadcast-sized (see pip_join strategy note)."""
    cells = build_pdf["cell"].to_numpy(dtype=np.int64)
    res_by_pid = {pid: int(r) for pid, (_e, _h, r) in polygons.items()}
    res_of = ix.get_resolution(cells)
    target = build_pdf["polygon_id"].map(res_by_pid).to_numpy()
    interior = ~build_pdf["is_boundary"].to_numpy(dtype=bool)
    est = int(np.sum(7.0 ** (target[interior] - res_of[interior])))
    already_flat = bool(np.all(res_of[interior] == target[interior]))
    if already_flat or est > _EXPAND_BUILD_MAX:
        return build_pdf
    from ..h3core.hierarchy import uncompact

    frames = [build_pdf[~interior]]
    for pid, grp in build_pdf[interior].groupby("polygon_id"):
        exp = uncompact(grp["cell"].to_numpy(dtype=np.int64), res_by_pid[pid])
        frames.append(
            pd.DataFrame(
                {
                    "polygon_id": pid,
                    "cell": exp,
                    "is_boundary": False,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


_REFINE_UDF_CACHE: dict = {}


def _refine_udf_cached(polygons: dict):
    """The boundary-refine pandas UDF, memoized on polygon geometry
    content (r7): each call otherwise re-cloudpickles the closure and
    re-registers it via py4j. Session-independent (the UDF object
    carries only the geometry arrays), same pattern as the
    functions/udfs.py factory lru_caches; bounded."""
    key = tuple(
        (
            pid,
            np.asarray(ext, dtype=np.float64).tobytes(),
            tuple(
                np.asarray(h, dtype=np.float64).tobytes()
                for h in (holes or [])
            ),
        )
        for pid, (ext, holes, _res) in sorted(polygons.items())
    )
    hit = _REFINE_UDF_CACHE.get(key)
    if hit is None:
        hit = _build_refine_udf(polygons)
        if len(_REFINE_UDF_CACHE) >= 16:
            _REFINE_UDF_CACHE.pop(next(iter(_REFINE_UDF_CACHE)))
        _REFINE_UDF_CACHE[key] = hit
    return hit


def _build_refine_udf(polygons: dict):
    geoms = {pid: (ext, holes) for pid, (ext, holes, _res) in polygons.items()}

    @F.pandas_udf(BooleanType())
    def _pip(
        polygon_id: pd.Series, lat: pd.Series, lng: pd.Series,
        is_boundary: pd.Series,
    ) -> pd.Series:
        out = np.ones(len(polygon_id), dtype=bool)
        mask = is_boundary.to_numpy(dtype=bool)
        if mask.any():
            la = lat.to_numpy(dtype=np.float64)
            ln = lng.to_numpy(dtype=np.float64)
            sub = polygon_id[mask]
            res = np.zeros(int(mask.sum()), dtype=bool)
            pos = np.flatnonzero(mask)
            for pid, idx in sub.groupby(sub).groups.items():
                ext, holes = geoms[pid]
                ii = np.asarray(idx)
                res_idx = np.searchsorted(pos, ii)
                res[res_idx] = regions.points_in_polygon(
                    ln[ii], la[ii], ext, holes
                )
            out[mask] = res
        return pd.Series(out)

    return _pip


def _refine_boundary(joined: DataFrame, polygons: dict) -> DataFrame:
    """Exact PIP for rows matched via boundary cells.

    Single Arrow pass over the matched rows; the ray-casting kernel runs
    only on the boundary-matched subset (interior matches short-circuit
    to True inside the batch), so the plan keeps one probe scan and the
    Python cost is proportional to boundary matches, not all matches.
    """
    pip_udf = _refine_udf_cached(polygons)
    return joined.where(pip_udf("polygon_id", "lat", "lng", "is_boundary"))


def pip_count(spark, images, polygons, **kw) -> DataFrame:
    return (
        pip_join(spark, images, polygons, **kw)
        .groupBy("polygon_id")
        .agg(F.count("*").alias("n_images"))
    )
