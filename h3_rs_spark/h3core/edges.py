"""Unidirectional edges — the reference's §2.8 sys-only surface
(/root/reference/h3-sys/src/ffi.rs:251-273; the reference crate never
wrapped these in safe Rust, so there is no behavioral golden to match).

Index layout follows the public H3 spec: an edge index is the ORIGIN
cell's index with the mode field set to 2 (unidirectional edge) and the
3 reserved bits (56-58) holding the edge number 1..6. The edge-number
-> neighbor mapping is this kernel's OWN deterministic convention
(documented divergence, like the geometric neighbor derivation itself):
edge number d crosses the boundary edge between true vertices d-1 and
d % nv of the origin's 6-true-vertex boundary — exactly the edge whose
midpoint the geometric neighbor reflection uses, so origin/destination/
boundary are mutually consistent by construction. Pentagons have 5
edges (numbers 1..5).
"""

from __future__ import annotations

import numpy as np

from . import faceijk as fk
from . import indexing as ix
from .traversal import directed_neighbors

_MODE_MASK = np.int64(0xF) << np.int64(59)
_MODE_CELL = np.int64(1) << np.int64(59)
_MODE_EDGE = np.int64(2) << np.int64(59)
_DIR_MASK = np.int64(0x7) << np.int64(56)


def _pack(origin: np.ndarray, direction: np.ndarray) -> np.ndarray:
    """origin cell + 0-based direction -> edge index (edge number d+1)."""
    base = (origin & ~_MODE_MASK & ~_DIR_MASK) | _MODE_EDGE
    return base | ((direction.astype(np.int64) + 1) << np.int64(56))


def edge_origin(edge) -> np.ndarray:
    """Edge -> origin cell (pure bit math; exposed JVM-side too)."""
    e = np.atleast_1d(np.asarray(edge, dtype=np.int64))
    return (e & ~_MODE_MASK & ~_DIR_MASK) | _MODE_CELL


def edge_number(edge) -> np.ndarray:
    """Edge -> 1-based edge number."""
    e = np.atleast_1d(np.asarray(edge, dtype=np.int64))
    return (e >> np.int64(56)) & np.int64(0x7)


def edges_from_cells(h) -> tuple[np.ndarray, np.ndarray]:
    """All unidirectional edges of each cell: (owner_row, edge) — 6 per
    hexagon, 5 per pentagon (getH3UnidirectionalEdgesFromHexagon)."""
    h = np.atleast_1d(np.asarray(h, dtype=np.int64))
    owner, direction, _nb = directed_neighbors(h)
    return owner, _pack(h[owner], direction)


def edge_from_cells(origin, destination) -> np.ndarray:
    """(origin, destination) -> edge index, 0 when the cells are not
    neighbors (getH3UnidirectionalEdge)."""
    o = np.atleast_1d(np.asarray(origin, dtype=np.int64))
    d = np.atleast_1d(np.asarray(destination, dtype=np.int64))
    if o.shape != d.shape:
        # ADVICE r4: a silent zip of mismatched arrays either indexes
        # out of bounds deep in the scatter or drops trailing elements
        raise ValueError(
            f"edge_from_cells: origin/destination length mismatch "
            f"{o.shape} vs {d.shape}"
        )
    owner, direction, nb = directed_neighbors(o)
    out = np.zeros(o.shape[0], dtype=np.int64)
    hit = nb == d[owner]
    out[owner[hit]] = _pack(o[owner[hit]], direction[hit])
    return out


def edge_destination(edge) -> np.ndarray:
    """Edge -> destination cell (0 for invalid edges). Vectorized: one
    directed-neighbor pass, then an (owner*8 + direction) scatter/gather."""
    e = np.atleast_1d(np.asarray(edge, dtype=np.int64))
    origin = edge_origin(e)
    num = edge_number(e)
    owner, direction, nb = directed_neighbors(origin)
    table = np.zeros(e.shape[0] * 8, dtype=np.int64)
    table[owner * 8 + direction] = nb
    slot = np.arange(e.shape[0]) * 8 + np.clip(num - 1, 0, 7)
    out = table[slot]
    out[(num < 1) | (num > 6)] = 0
    return out


def edge_cells(edge) -> tuple[np.ndarray, np.ndarray]:
    """Edge -> (origin, destination) (getH3IndexesFromUnidirectionalEdge)."""
    return edge_origin(edge), edge_destination(edge)


def edge_is_valid(edge) -> np.ndarray:
    """Mode 2, edge number in range for the origin (<= 5 neighbors for
    pentagons), origin a valid cell, and the direction actually
    resolves to a neighbor (h3UnidirectionalEdgeIsValid)."""
    e = np.atleast_1d(np.asarray(edge, dtype=np.int64))
    mode_ok = (e & _MODE_MASK) == _MODE_EDGE
    num = edge_number(e)
    origin = edge_origin(e)
    origin_ok = ix.is_valid(origin)
    dest = edge_destination(np.where(mode_ok & origin_ok, e, 0))
    return mode_ok & origin_ok & (num >= 1) & (num <= 6) & (dest != 0)


def edge_boundary(edge) -> tuple[np.ndarray, np.ndarray]:
    """Edge -> the shared boundary segment's (lat, lng) vertex arrays,
    NaN-padded shape (N, K): the full H3 getH3UnidirectionalEdgeBoundary
    semantics — the two true vertices d-1 and d % nv of the origin
    boundary PLUS any Class III icosa-edge distortion vertices lying
    between them, in traversal order (r5: retires the documented
    2-endpoint divergence flagged by ADVICE r4; K is 2 plus the max
    distortion-vertex count in the batch). True vertices are
    bit-identical between the plain and distortion boundary forms
    (validated by TestUnidirectionalEdges), so the segment is an exact
    cyclic slice of the distortion boundary."""
    e = np.atleast_1d(np.asarray(edge, dtype=np.int64))
    if e.shape[0] == 0:
        z = np.empty((0, 2), dtype=np.float64)
        return z, z.copy()
    origin = edge_origin(e)
    num = edge_number(e)
    plat, plng = fk.h3_to_geo_boundary(origin, distortion=False)
    flat, flng = fk.h3_to_geo_boundary(origin, distortion=True)
    nv = np.where(np.isnan(plat).any(axis=1), 5, 6)
    rows = np.arange(e.shape[0])
    v0 = (num - 1) % nv
    v1 = num % nv
    # fully vectorized cyclic slice (r5 review: no per-row python in an
    # Arrow-batched path): locate both true endpoints inside the
    # distortion boundary by exact float match, then gather the wrapped
    # index range and NaN-mask past each segment's length
    nv_full = (~np.isnan(flat)).sum(axis=1)
    m0 = (flat == plat[rows, v0][:, None]) & (flng == plng[rows, v0][:, None])
    m1 = (flat == plat[rows, v1][:, None]) & (flng == plng[rows, v1][:, None])
    # np.argmax on an all-False row silently returns 0; the exact float
    # match is a bit-identity contract between the distortion=False and
    # distortion=True boundary paths — if a refactor ever breaks it,
    # fail loudly instead of emitting a wrong segment (ADVICE r5)
    if not (m0.any(axis=1).all() and m1.any(axis=1).all()):
        bad = np.flatnonzero(~(m0.any(axis=1) & m1.any(axis=1)))
        raise AssertionError(
            "edge_boundary: true endpoint not found bit-identical in the "
            f"distortion boundary for edges at batch rows {bad[:5].tolist()}"
            " — the plain/distortion boundary paths have diverged"
        )
    i0 = np.argmax(m0, axis=1)
    i1 = np.argmax(m1, axis=1)
    seg_len = (i1 - i0) % nv_full + 1
    k = max(2, int(seg_len.max()))
    steps = np.arange(k)
    idx = (i0[:, None] + steps[None, :]) % nv_full[:, None]
    lat = flat[rows[:, None], idx]
    lng = flng[rows[:, None], idx]
    pad = steps[None, :] >= seg_len[:, None]
    lat[pad] = np.nan
    lng[pad] = np.nan
    return lat, lng
