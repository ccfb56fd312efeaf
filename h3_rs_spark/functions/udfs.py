"""Arrow-vectorized pandas UDFs over the numpy H3 kernel.

Every UDF is Series->Series over whole Arrow batches (no per-row Python,
per BASELINE.json input_hint); the heavy math is the same numpy kernel
validated against the reference goldens (tests/test_h3_goldens.py).

Resolution/k parameters are Python literals captured in closures so only
the data columns cross the JVM->Python boundary.

The factory functions are lru_cached (r7): every call used to rebuild
the pandas UDF — a cloudpickle of the closure plus py4j registration
chatter per call — measurable driver-side latency in the kNN round loop
and every query that re-derives cells. The returned UDF objects are
session-independent (registration happens at use), so caching by the
literal parameters is safe.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..h3core import faceijk, indexing, traversal


@functools.lru_cache(maxsize=64)
def geo_to_h3_udf(res: int):
    """(lat, lng) degrees -> cell int64 (0 for invalid input).

    Marked asNondeterministic as an OPTIMIZER BARRIER, not a semantics
    statement (the encode is pure): when the cell column feeds a join,
    Catalyst pushes the join's isnotnull(f(cell)) constraint through
    the defining projection, re-embedding the UDF so the optimized
    plan evaluates the Arrow encode TWICE per probe row (found r4 in
    the flagship PIP plan: 8.4M -> 4.7M rows/s; same shape in the kNN
    probe). Every call site assigns via withColumn and consumers
    reference only the resulting attribute, so the marking costs
    nothing; it just forbids the optimizer from duplicating or
    relocating the eval."""

    @F.pandas_udf(LongType())
    def _f(lat: pd.Series, lng: pd.Series) -> pd.Series:
        h = faceijk.geo_to_h3(
            lat.to_numpy(dtype=np.float64, na_value=np.nan),
            lng.to_numpy(dtype=np.float64, na_value=np.nan),
            res,
        )
        return pd.Series(h)

    return _f.asNondeterministic()


_GEO_STRUCT = StructType(
    [StructField("lat", DoubleType()), StructField("lng", DoubleType())]
)


@F.pandas_udf(_GEO_STRUCT)
def h3_to_geo_udf(cell: pd.Series) -> pd.DataFrame:
    lat, lng = faceijk.h3_to_geo(cell.to_numpy(dtype=np.int64))
    return pd.DataFrame({"lat": lat, "lng": lng})


_BOUNDARY_TYPE = ArrayType(
    StructType([StructField("lng", DoubleType()), StructField("lat", DoubleType())])
)


@F.pandas_udf(_BOUNDARY_TYPE)
def h3_boundary_udf(cell: pd.Series) -> pd.Series:
    blat, blng = faceijk.h3_to_geo_boundary(cell.to_numpy(dtype=np.int64))
    out = []
    for i in range(blat.shape[0]):
        keep = ~np.isnan(blat[i])
        out.append(
            [
                {"lng": float(blng[i, v]), "lat": float(blat[i, v])}
                for v in np.flatnonzero(keep)
            ]
        )
    return pd.Series(out)


@F.pandas_udf(BooleanType())
def h3_is_valid_udf(cell: pd.Series) -> pd.Series:
    return pd.Series(indexing.is_valid(cell.to_numpy(dtype=np.int64)))


@F.pandas_udf(BooleanType())
def h3_is_pentagon_udf(cell: pd.Series) -> pd.Series:
    return pd.Series(indexing.is_pentagon(cell.to_numpy(dtype=np.int64)))


@functools.lru_cache(maxsize=64)
def k_ring_udf(k: int):
    """cell -> array<long> of all cells within grid distance k."""

    @F.pandas_udf(ArrayType(LongType()))
    def _f(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64)
        owner, cells = traversal.k_ring(c, k)
        out = [[] for _ in range(len(c))]
        for o, cc in zip(owner.tolist(), cells.tolist()):
            out[o].append(cc)
        return pd.Series(out)

    return _f


_RING_TYPE = ArrayType(
    StructType([StructField("cell", LongType()), StructField("k", IntegerType())])
)


@functools.lru_cache(maxsize=64)
def k_ring_distances_udf(k: int):
    """cell -> array<struct<cell, k>> grouped by grid distance 0..k."""

    @F.pandas_udf(_RING_TYPE)
    def _f(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64)
        owner, cells, dist = traversal.k_ring_distances(c, k)
        out = [[] for _ in range(len(c))]
        for o, cc, d in zip(owner.tolist(), cells.tolist(), dist.tolist()):
            out[o].append({"cell": cc, "k": int(d)})
        return pd.Series(out)

    return _f


@functools.lru_cache(maxsize=64)
def k_ring_dyn_udf():
    """(cell, ring) -> array<long>: per-ROW ring radius, for operators
    that keep per-key ring state in a column (distributed kNN). Each
    Arrow batch groups by distinct radius so every radius is one
    vectorized traversal call, not a per-row loop."""

    @F.pandas_udf(ArrayType(LongType()))
    def _f(cell: pd.Series, ring: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64)
        r = ring.to_numpy(dtype=np.int64)
        out = [None] * len(c)
        for rv in np.unique(r):
            idx = np.flatnonzero(r == rv)
            owner, cells = traversal.k_ring(c[idx], int(rv))
            lists = [[] for _ in range(len(idx))]
            for o, cc in zip(owner.tolist(), cells.tolist()):
                lists[o].append(cc)
            for i, lst in zip(idx.tolist(), lists):
                out[i] = lst
        return pd.Series(out)

    return _f


@functools.lru_cache(maxsize=64)
def edges_from_cell_udf():
    """cell -> array<long> of its unidirectional edges (6, 5 for
    pentagons) — §2.8 surface (h3core/edges.py)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _f(cell: pd.Series) -> pd.Series:
        from ..h3core import edges as ed

        c = cell.to_numpy(dtype=np.int64)
        owner, e = ed.edges_from_cells(c)
        out = [[] for _ in range(len(c))]
        for o, ev in zip(owner.tolist(), e.tolist()):
            out[o].append(ev)
        return pd.Series(out)

    return _f


@functools.lru_cache(maxsize=64)
def edge_destination_udf():
    """edge -> destination cell (0 for invalid)."""

    @F.pandas_udf(LongType())
    def _f(edge: pd.Series) -> pd.Series:
        from ..h3core import edges as ed

        return pd.Series(ed.edge_destination(edge.to_numpy(dtype=np.int64)))

    return _f


_EDGE_BOUNDARY_TYPE = ArrayType(
    StructType([StructField("lat", DoubleType()), StructField("lng", DoubleType())])
)


@functools.lru_cache(maxsize=64)
def edge_boundary_udf():
    """edge -> the shared boundary segment's (lat, lng) vertex list:
    both true endpoints plus any Class III distortion vertices between
    them (full H3 edge-boundary semantics since r5)."""

    @F.pandas_udf(_EDGE_BOUNDARY_TYPE)
    def _f(edge: pd.Series) -> pd.Series:
        from ..h3core import edges as ed

        lat, lng = ed.edge_boundary(edge.to_numpy(dtype=np.int64))
        return pd.Series(
            [
                [
                    {"lat": float(la), "lng": float(lg)}
                    for la, lg in zip(lat[i], lng[i])
                    if not np.isnan(la)
                ]
                for i in range(lat.shape[0])
            ]
        )

    return _f


_HEX_RANGES_TYPE = StructType(
    [
        StructField("ok", BooleanType()),
        StructField("disks", ArrayType(ArrayType(LongType()))),
    ]
)


@functools.lru_cache(maxsize=64)
def hex_ranges_udf(k: int):
    """array<origin cells> -> struct<ok, disks>: the reference's only
    multi-origin traversal (hexRanges, h3-sys/src/ffi.rs:120-126) as a
    single UDF call. disks[i] is origin i's full k-disk in k_ring
    order; ok mirrors the C contract — FALSE when any disk touches a
    pentagon (the C call fails wholesale), in which case disks still
    carries the exact cell sets so callers can choose the lenient
    reading. One vectorized traversal over the batch's concatenated
    origins, not a per-origin loop."""

    @F.pandas_udf(_HEX_RANGES_TYPE)
    def _f(origins: pd.Series) -> pd.DataFrame:
        oks, diskss = [], []
        lens = np.array(
            [0 if o is None else len(o) for o in origins], dtype=np.int64
        )
        flat = np.concatenate(
            [np.asarray(o, dtype=np.int64) for o in origins if o is not None]
        ) if lens.sum() else np.empty(0, dtype=np.int64)
        owner, cells, ok = traversal.hex_range(flat, k) if len(flat) else (
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, bool),
        )
        per_origin = [[] for _ in range(len(flat))]
        for o, c in zip(owner.tolist(), cells.tolist()):
            per_origin[o].append(c)
        starts = np.concatenate([[0], np.cumsum(lens)])
        for i in range(len(origins)):
            lo, hi = int(starts[i]), int(starts[i + 1])
            oks.append(bool(ok[lo:hi].all()) if hi > lo else True)
            diskss.append(per_origin[lo:hi])
        return pd.DataFrame({"ok": oks, "disks": diskss})

    return _f


@functools.lru_cache(maxsize=64)
def geo_disk_dyn_udf():
    """(lat, lng, res, ring) -> array<long>: the full k-ring disk of
    the point's cell at a per-ROW (res, ring). Fuses the dynamic-res
    encode and the dynamic-radius traversal into ONE Arrow stage so a
    multi-level kNN round builds its whole candidate relation in a
    single python pass (one stage, one broadcast) instead of one per
    distinct resolution. Each batch groups by distinct (res, ring) so
    every group is one vectorized encode + traversal call."""

    @F.pandas_udf(ArrayType(LongType()))
    def _f(
        lat: pd.Series, lng: pd.Series, res: pd.Series, ring: pd.Series
    ) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64)
        ln = lng.to_numpy(dtype=np.float64)
        rs = res.to_numpy(dtype=np.int64)
        rg = ring.to_numpy(dtype=np.int64)
        out = [None] * len(la)
        combos = np.unique(np.stack([rs, rg], axis=1), axis=0)
        for rv, gv in combos:
            idx = np.flatnonzero((rs == rv) & (rg == gv))
            cells = faceijk.geo_to_h3(la[idx], ln[idx], int(rv))
            owner, disk = traversal.k_ring(cells, int(gv))
            lists = [[] for _ in range(len(idx))]
            for o, cc in zip(owner.tolist(), disk.tolist()):
                lists[o].append(cc)
            for i, lst in zip(idx.tolist(), lists):
                out[i] = lst
        return pd.Series(out)

    # same optimizer-barrier rationale as geo_to_h3_udf
    return _f.asNondeterministic()


@functools.lru_cache(maxsize=64)
def h3_to_children_udf(child_res: int):
    @F.pandas_udf(ArrayType(LongType()))
    def _f(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64)
        owner, kids = indexing.to_children_batch(c, child_res)
        ord_ = np.argsort(owner, kind="stable")  # group rows contiguously
        owner, kids = owner[ord_], kids[ord_]
        counts = np.bincount(owner, minlength=len(c))
        return pd.Series(
            [a.tolist() for a in np.split(kids, np.cumsum(counts)[:-1])]
        )

    return _f


@F.pandas_udf(ArrayType(LongType()))
def h3_line_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Minimal grid path per pair (H3 h3Line; local-frame cube lerp with
    greedy fallback — see h3core.localij). Batched over the Arrow batch
    (r7): greedy-fallback pairs walk together, one neighbors() kernel
    call per step for the whole batch (path-identical to the scalar
    loop, pinned by test_h3_line_batch_parity)."""
    av = a.to_numpy(dtype=np.int64)
    bv = b.to_numpy(dtype=np.int64)
    return pd.Series(
        [p.tolist() for p in traversal.h3_line_batch(av, bv)]
    )


@F.pandas_udf(BooleanType())
def h3_local_frame_ok_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """True where the planar local-face frame applies to the pair (same
    or adjacent icosa face, clear of pentagons) — exactly the rows where
    h3_line returns the minimal cube-lerp path rather than the greedy
    fallback."""
    from ..h3core.localij import local_frames

    ok, _, _, _ = local_frames(
        a.to_numpy(dtype=np.int64), b.to_numpy(dtype=np.int64)
    )
    return pd.Series(ok)


@F.pandas_udf(IntegerType())
def h3_distance_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    from ..h3core.localij import h3_distance_batch

    av = a.to_numpy(dtype=np.int64)
    bv = b.to_numpy(dtype=np.int64)
    return pd.Series(h3_distance_batch(av, bv), dtype="int32")
