"""Polygon <-> cell regions: polyfill, point-in-polygon, boundary split.

polyfill matches H3 v3.6 semantics: all cells at `res` whose *centroid*
lies inside the polygon (exterior minus holes). Candidate generation is a
vectorized lat/lng lattice scan of the (padded) bounding box at sub-cell
spacing — every cell whose center is in the box is guaranteed to be
sampled — followed by exact vectorized ray-casting on the centroids.

Parity targets: /root/reference/src/region.rs polyfill tests (SF hexagon
@Z9 == 1253 cells — the count implied by the reference's own
compact/uncompact golden, src/hierarchy.rs:145-148 — Sydney @Z9 > 10,
null-island box @Z4 > 10); the empty-hole-ring rule (src/raw.rs:122-125)
and implicit ring auto-closing (src/raw.rs:178-179) are honored.

Antimeridian-crossing polygons are supported (detected by a >180 deg
longitude jump; scan and ray cast shift into the [0,360) domain).
Pole-CONTAINING polygons are supported beyond the reference (H3 v3.6
itself cannot fill them): a ring whose longitudes wind a full +-360 deg
encircles a pole — for the EXTERIOR, interior is the side left of
travel (net eastward winding encloses the north side); a polar HOLE's
winding is ignored (RFC 7946 holes wind opposite to the exterior, so it
cannot be trusted) and the hole excludes the exterior pole's cap — and
both
the candidate scan (polar-cap lattice, per-row longitude stepping) and
the containment test (meridian ray toward the contained pole, even
crossing parity) switch to polar forms. Exactness is pinned by
constant-latitude cap/annulus fixtures whose truth is enumerable
(tests/test_h3_goldens.py::TestPolarPolyfill).
"""

from __future__ import annotations

import numpy as np

from . import faceijk as fk
from .constants import EDGE_LENGTH_M, EARTH_RADIUS_KM


def _close_ring(ring: np.ndarray) -> np.ndarray:
    """Accept closed or unclosed rings (geo-types auto-closes)."""
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] >= 1 and not np.allclose(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0:1]])
    return ring


def _clean_holes(holes) -> list[np.ndarray]:
    """Drop empty hole rings (reference rule at src/raw.rs:122-125)."""
    out = []
    for hole in holes or []:
        hole = np.asarray(hole, dtype=np.float64)
        if hole.size == 0 or hole.shape[0] < 3:
            continue
        out.append(_close_ring(hole))
    return out


def points_in_ring(lng: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting. ring: (M, 2) of (lng, lat), closed."""
    x, y = lng[:, None], lat[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    straddle = (y0 <= y) != (y1 <= y)
    denom = np.where(y1 - y0 == 0.0, 1.0, y1 - y0)
    x_int = x0 + (y - y0) / denom * (x1 - x0)
    crossings = (straddle & (x < x_int)).sum(axis=1)
    return crossings % 2 == 1


def _lng_winding_deg(ring: np.ndarray) -> float:
    """Net longitude winding of a closed ring, each edge wrapped to the
    short way round: ~±360 for a ring encircling a pole, ~0 otherwise."""
    d = np.diff(ring[:, 0])
    d = (d + 180.0) % 360.0 - 180.0
    return float(d.sum())


def _polar_pole(ring: np.ndarray):
    """+1 if the ring encircles the north pole, -1 the south, None if
    not polar. Interior is the side LEFT of travel (GeoJSON ring
    orientation), so net eastward winding (+360) encloses north."""
    w = _lng_winding_deg(ring)
    if abs(w) < 180.0:
        return None
    return 1 if w > 0 else -1


def _points_in_polar_ring(
    lng: np.ndarray, lat: np.ndarray, ring: np.ndarray, pole: int
) -> np.ndarray:
    """Containment for a pole-encircling ring: walk each point's
    meridian toward the contained pole and count boundary crossings —
    the pole is interior by construction, so EVEN parity means inside.
    Crossing longitudes interpolate in the wrapped (shortest-span) edge
    frame, matching the planar-edge semantics of points_in_ring."""
    x = np.asarray(lng, dtype=np.float64)[:, None]
    y = np.asarray(lat, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    d_edge = (x1 - x0 + 180.0) % 360.0 - 180.0
    d_pt = (x - x0 + 180.0) % 360.0 - 180.0
    denom = np.where(d_edge == 0.0, np.nan, d_edge)
    t = d_pt / denom
    on_edge_span = (t >= 0.0) & (t < 1.0)
    cross_lat = y0 + t * (y1 - y0)
    between = cross_lat > y if pole > 0 else cross_lat < y
    crossings = (on_edge_span & between).sum(axis=1)  # NaN compares False
    return crossings % 2 == 0


def _is_transmeridian(ring: np.ndarray) -> bool:
    """A ring edge jumping > 180 deg of longitude crosses the
    antimeridian (H3 bboxFromGeofence transmeridian test)."""
    return bool((np.abs(np.diff(ring[:, 0])) > 180.0).any())


def _shift_lng(lng: np.ndarray) -> np.ndarray:
    return np.where(lng < 0.0, lng + 360.0, lng)


def _ring_contains(lng: np.ndarray, lat: np.ndarray, ring: np.ndarray):
    pole = _polar_pole(ring)
    if pole is not None:
        return _points_in_polar_ring(lng, lat, ring, pole)
    if _is_transmeridian(ring):
        ring = ring.copy()
        ring[:, 0] = _shift_lng(ring[:, 0])
        lng = _shift_lng(np.asarray(lng, dtype=np.float64))
    return points_in_ring(lng, lat, ring)


def points_in_polygon(
    lng: np.ndarray, lat: np.ndarray, exterior: np.ndarray, holes=None
) -> np.ndarray:
    ext = _close_ring(exterior)
    hls = _clean_holes(holes)
    if _polar_pole(ext) is not None or any(
        _polar_pole(h) is not None for h in hls
    ):
        # polar rings: per-ring containment (each ring may be polar or
        # planar independently — an annulus's hole is itself polar).
        # A polar HOLE's own winding is ignored: RFC 7946 holes wind
        # opposite to the exterior, so trusting the hole's winding would
        # pick the wrong pole and invert containment. Geometrically a
        # polar hole inside a polar exterior can only exclude the cap of
        # the SAME pole the exterior contains — use that pole directly.
        ext_pole = _polar_pole(ext)
        inside = _ring_contains(lng, lat, ext)
        for hole in hls:
            hole_pole = _polar_pole(hole)
            if hole_pole is not None and ext_pole is not None:
                inside &= ~_points_in_polar_ring(lng, lat, hole, ext_pole)
            else:
                inside &= ~_ring_contains(lng, lat, hole)
        return inside
    if _is_transmeridian(ext):
        # shift polygon and points into the [0, 360) longitude domain so
        # the planar ray cast never sees the +-180 seam
        ext = ext.copy()
        ext[:, 0] = _shift_lng(ext[:, 0])
        hls = [np.column_stack([_shift_lng(h[:, 0]), h[:, 1]]) for h in hls]
        lng = _shift_lng(np.asarray(lng, dtype=np.float64))
    inside = points_in_ring(lng, lat, ext)
    for hole in hls:
        inside &= ~points_in_ring(lng, lat, hole)
    return inside


def ring_area_m2(ring, radius_m: float = EARTH_RADIUS_KM * 1000.0) -> float:
    """Spherical area of a (lng, lat)-degree ring (geodesic shoelace:
    area = R^2/2 * |sum (lng2-lng1)(2 + sin lat1 + sin lat2)| — the
    standard spherical-excess approximation for geographic polygons)."""
    r = _close_ring(np.asarray(ring, dtype=np.float64))
    if _is_transmeridian(r):
        r = r.copy()
        r[:, 0] = _shift_lng(r[:, 0])
    lng = np.radians(r[:, 0])
    lat = np.radians(r[:, 1])
    s = np.sum((lng[1:] - lng[:-1]) * (2.0 + np.sin(lat[:-1]) + np.sin(lat[1:])))
    return float(abs(s) * radius_m * radius_m / 2.0)


MAX_POLYFILL_CELLS = 5_000_000


def _polar_band(ext: np.ndarray, res: int, pole: int):
    """(band_lo, band_hi) latitudes the polar-cap scan must cover."""
    edge_deg = np.degrees(EDGE_LENGTH_M[res] / (EARTH_RADIUS_KM * 1000.0))
    pad = 2.5 * edge_deg
    if pole > 0:
        return float(ext[:, 1].min() - pad), 90.0
    return -90.0, float(ext[:, 1].max() + pad)


def bbox_cell_estimate(ext: np.ndarray, res: int) -> float:
    """Estimated lattice-scan candidate count for a ring's bbox at
    `res` — the ONE formula both the driver-side scan guard and the
    distributed-polyfill coarse-res picker use (operators/polyfill_dist),
    so "fits the driver" always means the same thing."""
    pole = _polar_pole(ext)
    if pole is not None:
        # spherical-zone area of the cap the scan covers / cell area
        from .constants import HEX_AREA_M2

        lo, hi = _polar_band(ext, res, pole)
        r_m = EARTH_RADIUS_KM * 1000.0
        area = (
            2.0
            * np.pi
            * r_m
            * r_m
            * abs(np.sin(np.radians(hi)) - np.sin(np.radians(lo)))
        )
        return float(2.0 * area / HEX_AREA_M2[res])
    if _is_transmeridian(ext):
        ext = ext.copy()
        ext[:, 0] = _shift_lng(ext[:, 0])
    lng_min, lat_min = ext.min(axis=0)
    lng_max, lat_max = ext.max(axis=0)
    edge_deg = np.degrees(EDGE_LENGTH_M[res] / (EARTH_RADIUS_KM * 1000.0))
    return float(
        (lat_max - lat_min + 5 * edge_deg)
        * (lng_max - lng_min + 5 * edge_deg)
        / (0.7 * edge_deg) ** 2
    )


def _bbox_scan_cells(ext: np.ndarray, res: int) -> np.ndarray:
    """All cells whose centroid can lie in the (padded) bbox: lat/lng
    lattice scan at sub-inradius spacing, encoded and deduped. Raises
    when the scan would exceed MAX_POLYFILL_CELLS candidates.
    Transmeridian rings scan in the [0, 360) longitude domain (the
    lattice longitudes may exceed 180; geo_to_h3 wraps them exactly —
    test_world_wrapping). Polar rings scan the full-longitude cap with
    PER-ROW longitude stepping (one global step sized for the extreme
    latitude would undersample the low-latitude rows)."""
    pole = _polar_pole(ext)
    if pole is not None:
        est = bbox_cell_estimate(ext, res)
        if est > MAX_POLYFILL_CELLS * 4:
            raise ValueError(
                f"polyfill: polar cap at res {res} implies ~{est:.2e} "
                f"candidate cells (> {MAX_POLYFILL_CELLS}); fill coarser "
                "and uncompact distributively (operators.hierarchy_ops)"
            )
        edge_deg = np.degrees(EDGE_LENGTH_M[res] / (EARTH_RADIUS_KM * 1000.0))
        step_lat = 0.7 * edge_deg
        lo, hi = _polar_band(ext, res, pole)
        lats = np.clip(np.arange(lo, hi + step_lat, step_lat), -89.9999, 89.9999)
        rows_lat, rows_lng = [], []
        for la in lats:
            step_lng = step_lat / max(np.cos(np.radians(la)), 1e-4)
            lngs = np.arange(-180.0, 180.0, step_lng)
            rows_lng.append(lngs)
            rows_lat.append(np.full(lngs.shape, la))
        # the pole cell itself (the lattice rows stop short of ±90)
        rows_lat.append(np.array([89.9999 if pole > 0 else -89.9999]))
        rows_lng.append(np.array([0.0]))
        cells = np.unique(
            fk.geo_to_h3(np.concatenate(rows_lat), np.concatenate(rows_lng), res)
        )
        return cells[cells != 0]
    if _is_transmeridian(ext):
        ext = ext.copy()
        ext[:, 0] = _shift_lng(ext[:, 0])
    lng_min, lat_min = ext.min(axis=0)
    lng_max, lat_max = ext.max(axis=0)

    edge_deg = np.degrees(EDGE_LENGTH_M[res] / (EARTH_RADIUS_KM * 1000.0))
    est = bbox_cell_estimate(ext, res)
    if est > MAX_POLYFILL_CELLS * 4:
        raise ValueError(
            f"polyfill: bbox at res {res} implies ~{est:.2e} candidate "
            f"cells (> {MAX_POLYFILL_CELLS}); fill at a coarser res and "
            "uncompact distributively (operators.hierarchy_ops)"
        )

    pad = 2.5 * edge_deg
    step_lat = 0.7 * edge_deg
    cos_lat = max(
        0.05, np.cos(np.radians(max(abs(lat_min - pad), abs(lat_max + pad))))
    )
    step_lng = step_lat / cos_lat
    lats = np.arange(lat_min - pad, lat_max + pad, step_lat)
    lngs = np.arange(lng_min - pad, lng_max + pad, step_lng)
    glng, glat = np.meshgrid(lngs, lats)
    cells = np.unique(fk.geo_to_h3(glat.ravel(), glng.ravel(), res))
    return cells[cells != 0]


def polyfill(exterior, holes, res: int) -> np.ndarray:
    """All cells at `res` whose centroid is inside the polygon.

    Driver-side kernel for dimension-table polygons (SURVEY.md §2.6). A
    bbox whose estimated cell count exceeds MAX_POLYFILL_CELLS raises —
    at that scale fill coarse then `uncompact`/distribute via
    operators.hierarchy_ops instead of materializing on the driver."""
    ext = _close_ring(np.asarray(exterior, dtype=np.float64))
    cells = _bbox_scan_cells(ext, res)

    clat, clng = fk.h3_to_geo(cells)
    inside = points_in_polygon(clng, clat, exterior, holes)
    return cells[inside]


def polyfill_compact(exterior, holes, res: int) -> np.ndarray:
    """polyfill then compact (reference hardcodes Z9 at
    src/hierarchy.rs:112; here res is a real parameter)."""
    from .hierarchy import compact

    return compact(polyfill(exterior, holes, res))


def polygon_cover(exterior, holes, res: int):
    """Exact PIP-join build set: (interior_cells, boundary_cells).

    interior: cells entirely inside the polygon (centroid + all vertices)
    — points there match with no refinement.
    boundary: every other cell that could contain a point inside the
    polygon: cells with mixed vertex containment, cells containing a
    polygon ring vertex, and a one-ring dilation to catch corner slivers
    clipped by a polygon edge without flipping any hex vertex. Boundary
    matches are refined by exact ray casting, so over-inclusion here only
    costs a few extra broadcast rows, never correctness (exactness vs the
    brute-force oracle is asserted in tests/test_operators.py).
    """
    from .traversal import neighbors as _neighbors

    ext = _close_ring(np.asarray(exterior, dtype=np.float64))
    cells = _bbox_scan_cells(ext, res)

    # classify by centroid + vertex containment
    clat, clng = fk.h3_to_geo(cells)
    c_in = points_in_polygon(clng, clat, exterior, holes)
    blat, blng = fk.h3_to_geo_boundary(cells)
    flat_lat, flat_lng = blat.ravel(), blng.ravel()
    ok = ~np.isnan(flat_lat)
    v_in = np.zeros(flat_lat.shape, dtype=bool)
    v_in[ok] = points_in_polygon(flat_lng[ok], flat_lat[ok], exterior, holes)
    v_in_m = v_in.reshape(blat.shape)
    n_verts = (~np.isnan(blat)).sum(axis=1)
    n_in = np.where(~np.isnan(blat), v_in_m, False).sum(axis=1)

    all_in = c_in & (n_in == n_verts)
    none_in = (~c_in) & (n_in == 0)
    mixed = ~(all_in | none_in)

    # cells containing polygon ring vertices
    rings = [ext] + _clean_holes(holes)
    rv_lng = np.concatenate([r[:, 0] for r in rings])
    rv_lat = np.concatenate([r[:, 1] for r in rings])
    rv_cells = np.unique(fk.geo_to_h3(rv_lat, rv_lng, res))

    b0 = np.unique(np.concatenate([cells[mixed], rv_cells]))
    if b0.size:
        _, dil = _neighbors(b0)
        boundary = np.unique(np.concatenate([b0, dil]))
    else:
        boundary = b0
    interior = np.setdiff1d(cells[all_in], boundary, assume_unique=False)
    return interior, boundary


def cells_to_multipolygon(cells: np.ndarray):
    """Dissolve a cell set into polygons (h3SetToLinkedGeo / G4 — which
    the reference never implemented: its wrapper returns an empty
    MultiPolygon, src/region.rs:69-73 with tests commented out).

    Method: every interior edge appears in exactly two cells' boundaries
    (opposite directions); keep single-occurrence directed edges and
    stitch them into closed rings. Returns a list of rings, each a list
    of (lng, lat) tuples in traversal order; outer rings and holes are
    both present (holes wind opposite). Vertices are matched at 1e-9.
    """
    cells = np.unique(np.atleast_1d(np.asarray(cells, dtype=np.int64)))
    if cells.size == 0:
        return []
    # distortion=False: stitching matches shared edges between adjacent
    # cells by vertex identity; icosa-crossing vertices are computed in
    # each cell's own face frame and may differ in the last ulp
    blat, blng = fk.h3_to_geo_boundary(cells, distortion=False)

    def key(lat, lng):
        return (round(float(lat), 9), round(float(lng), 9))

    edge_count: dict[tuple, int] = {}
    edges = []
    for i in range(cells.shape[0]):
        verts = [
            (blat[i, v], blng[i, v])
            for v in range(6)
            if not np.isnan(blat[i, v])
        ]
        for v in range(len(verts)):
            a = key(*verts[v])
            b = key(*verts[(v + 1) % len(verts)])
            edges.append((a, b))
            und = (a, b) if a <= b else (b, a)
            edge_count[und] = edge_count.get(und, 0) + 1

    # directed boundary edges; a PINCH vertex (two cells touching only at
    # a vertex) has multiple outgoing edges, so walk edge-by-edge and at
    # junctions take the sharpest clockwise turn — that keeps each lobe
    # of a bowtie a separate simple ring instead of a self-crossing one
    out_edges: dict[tuple, list] = {}
    unused = set()
    for a, b in edges:
        und = (a, b) if a <= b else (b, a)
        if edge_count[und] == 1:
            out_edges.setdefault(a, []).append(b)
            unused.add((a, b))

    def _bearing(frm, to):
        # planar bearing with latitude-scaled longitude (adequate for
        # choosing among 2-3 candidate edges at one vertex)
        dlat = to[0] - frm[0]
        dlng = (to[1] - frm[1]) * np.cos(np.radians(frm[0]))
        return np.arctan2(dlat, dlng)

    rings = []
    while unused:
        start, cur = next(iter(unused))
        unused.discard((start, cur))
        ring = [start]
        prev = start
        guard = len(edges) + 1
        while cur != start and guard > 0:
            ring.append(cur)
            cands = [b for b in out_edges.get(cur, []) if (cur, b) in unused]
            if not cands:
                raise RuntimeError(
                    "cells_to_multipolygon: unclosed ring "
                    "(vertex-rounding split)"
                )
            if len(cands) == 1:
                nxt = cands[0]
            else:
                back = _bearing(cur, prev)
                # sharpest clockwise turn from the reversed incoming
                # direction: maximal angle measured clockwise from back
                def cw_turn(b):
                    return float(
                        np.mod(back - _bearing(cur, b), 2.0 * np.pi)
                    )
                nxt = max(cands, key=cw_turn)
            unused.discard((cur, nxt))
            prev, cur = cur, nxt
            guard -= 1
        if guard <= 0:
            raise RuntimeError(
                "cells_to_multipolygon: unclosed ring (walk did not "
                "terminate)"
            )
        rings.append([(lng, lat) for lat, lng in ring])
    return rings


def cells_to_boundary_split(cells: np.ndarray, exterior, holes=None):
    """Split a polyfill cell set into (interior, boundary) by whether the
    cell's boundary polygon crosses the polygon outline — boundary cells
    need exact per-point PIP refinement in the join, interior cells don't.
    A cell is interior iff all its vertices are inside the polygon."""
    cells = np.asarray(cells, dtype=np.int64)
    blat, blng = fk.h3_to_geo_boundary(cells)  # (N, 6), NaN-padded
    flat_lat = blat.ravel()
    flat_lng = blng.ravel()
    ok = ~np.isnan(flat_lat)
    inside = np.zeros(flat_lat.shape, dtype=bool)
    inside[ok] = points_in_polygon(flat_lng[ok], flat_lat[ok], exterior, holes)
    inside |= ~ok  # NaN padding doesn't disqualify
    all_in = inside.reshape(blat.shape).all(axis=1)
    return cells[all_in], cells[~all_in]
