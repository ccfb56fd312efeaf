"""Property-based kernel tests (hypothesis): invariants that must hold
for EVERY point/cell, not just the golden fixtures — roundtrip
containment, hierarchy closure, neighbor symmetry, distance metric
axioms, boundary sanity. Spark-free (pure numpy kernel), so hundreds of
examples run in seconds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from h3_rs_spark import h3core as h3
from h3_rs_spark.h3core import indexing as ix
from h3_rs_spark.h3core import traversal as tv
from h3_rs_spark.h3core.localij import h3_distance_batch

LAT = st.floats(-89.9, 89.9, allow_nan=False)
LNG = st.floats(-179.999, 179.999, allow_nan=False)
RES = st.integers(0, 12)


@settings(max_examples=150, deadline=None)
@given(lat=LAT, lng=LNG, res=RES)
def test_encode_decode_roundtrip(lat, lng, res):
    """The cell's centroid must encode back to the same cell."""
    cell = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    assert ix.is_valid(cell)[0]
    clat, clng = h3.h3_to_geo(cell)
    again = h3.geo_to_h3(clat, clng, res)
    assert int(again[0]) == int(cell[0])


@settings(max_examples=60, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(0, 10))
def test_parent_child_closure(lat, lng, res):
    """Every child at res+1 parents back; the center child shares the
    cell's centroid cell at the finer res."""
    cell = int(h3.geo_to_h3(np.array([lat]), np.array([lng]), res)[0])
    kids = ix.to_children(cell, res + 1)
    assert (ix.to_parent(kids, res) == cell).all()
    n_exp = 6 if bool(ix.is_pentagon(np.array([cell]))[0]) else 7
    assert len(kids) == n_exp
    clat, clng = h3.h3_to_geo(np.array([cell]))
    center_child = int(h3.geo_to_h3(clat, clng, res + 1)[0])
    assert center_child in set(kids.tolist())


@settings(max_examples=60, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(1, 10))
def test_neighbor_symmetry(lat, lng, res):
    """b in neighbors(a) implies a in neighbors(b); counts are 6 (5 for
    pentagons)."""
    a = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    _, nbs = tv.neighbors(a)
    n_exp = 5 if bool(ix.is_pentagon(a)[0]) else 6
    assert len(nbs) == n_exp
    for b in nbs:
        _, back = tv.neighbors(np.array([b]))
        assert int(a[0]) in set(back.tolist())


@settings(max_examples=40, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(1, 10), k=st.integers(1, 3))
def test_distance_matches_ring_index(lat, lng, res, k):
    """h3_distance(origin, c) must equal the BFS ring index for every
    cell of k_ring_distances, and be symmetric."""
    a = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    _, cells, dist = tv.k_ring_distances(a, k)
    got = h3_distance_batch(np.full(len(cells), int(a[0])), cells)
    assert (got == dist).all()
    back = h3_distance_batch(cells, np.full(len(cells), int(a[0])))
    assert (back == dist).all()


@settings(max_examples=60, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(0, 11))
def test_boundary_sane(lat, lng, res):
    """5..10 vertices, all finite, and the centroid encodes to the cell
    whose boundary it is (self-containment)."""
    cell = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    blat, blng = h3.h3_to_geo_boundary(cell)
    nv = int((~np.isnan(blat[0])).sum())
    assert 5 <= nv <= 10
    assert np.isfinite(blat[0][:nv]).all() and np.isfinite(blng[0][:nv]).all()
    # encoding a point nudged from each vertex toward the centroid (on
    # the sphere, not in lat/lng space — linear lat/lng mixing is wrong
    # across the antimeridian and for continent-sized res-0 cells) must
    # stay in this cell
    from h3_rs_spark.h3core import geom

    clat, clng = h3.h3_to_geo(cell)
    cxyz = geom.geo_to_xyz(np.radians(clat[0]), np.radians(clng[0]))
    vxyz = geom.geo_to_xyz(
        np.radians(blat[0][:nv]), np.radians(blng[0][:nv])
    )
    eps = 1e-3
    p = (1 - eps) * vxyz + eps * cxyz[None, :]
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    nlat = np.degrees(np.arcsin(np.clip(p[:, 2], -1, 1)))
    nlng = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    inner = h3.geo_to_h3(nlat, nlng, res)
    assert (inner == cell[0]).all()


@settings(max_examples=100, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(1, 12))
def test_edge_surface_roundtrip(lat, lng, res):
    """For ANY cell: its unidirectional edges are valid, origin
    round-trips, the destination set is exactly the neighbor set, and
    (origin, destination) -> edge rebuilds the identical indexes (r5:
    property-level generalization of the fixed-cell edge goldens)."""
    from h3_rs_spark.h3core import edges as ed

    cell = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    owner, es = ed.edges_from_cells(cell)
    n = es.shape[0]
    assert n in (5, 6)
    assert ed.edge_is_valid(es).all()
    assert (ed.edge_origin(es) == cell[0]).all()
    dests = ed.edge_destination(es)
    _, nbs = tv.neighbors(cell)
    assert set(dests.tolist()) == set(nbs.tolist())
    rebuilt = ed.edge_from_cells(np.full(n, cell[0]), dests)
    assert set(rebuilt.tolist()) == set(es.tolist())


@settings(max_examples=60, deadline=None)
@given(lat=LAT, lng=LNG, res=st.integers(1, 10), k=st.integers(1, 2))
def test_dissolve_disk_single_ring(lat, lng, res, k):
    """Dissolving ANY k-disk (any location: poles, antimeridian,
    pentagon neighborhoods, icosa edges) must stitch into exactly one
    closed ring with the hex-disk vertex count 6(2k+1) — or fewer
    when a pentagon's deficit is inside the disk."""
    from h3_rs_spark.h3core.regions import cells_to_multipolygon

    cell = h3.geo_to_h3(np.array([lat]), np.array([lng]), res)
    _, disk = tv.k_ring(cell, k)
    rings = cells_to_multipolygon(disk)
    assert len(rings) == 1
    assert 5 <= len(rings[0]) <= 6 * (2 * k + 1)


class TestVolumeFuzz:
    """VERDICT r5 #5: the goldens and the hypothesis properties above
    are point checks; the kernel's 100-TB job is to never be wrong
    ANYWHERE. Seed-pinned volume sweeps, pure numpy (no Spark):
    10^6 sphere points through encode->decode->encode at all 16
    resolutions, boundary->PIP self-containment at 2*10^5 cells, and
    random k-disk dissolve->polyfill exact round-trips — each batch
    salted with adversarial bands (poles, antimeridian, pentagon
    faces) where the planar shortcuts would break first."""

    @staticmethod
    def _fuzz_points(n: int, seed: int):
        rng = np.random.default_rng(seed)
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
        lng = rng.uniform(-180.0, 180.0, n)
        s = n // 30  # three adversarial bands, ~10% of the batch total
        # polar caps
        lat[:s] = np.where(rng.random(s) < 0.5, 1.0, -1.0) * rng.uniform(
            89.9, 89.9999, s
        )
        # antimeridian sliver
        lng[s : 2 * s] = np.where(
            rng.random(s) < 0.5, 1.0, -1.0
        ) * rng.uniform(179.9, 179.99999, s)
        # pentagon faces: jittered centroids of the 12 res-0 pentagons
        res0 = ix.from_components(
            np.arange(122, dtype=np.int64), 0, np.full((122, 15), 7)
        )
        pents = res0[ix.is_pentagon(res0)]
        assert len(pents) == 12
        plat, plng = h3.h3_to_geo(pents)
        pick = rng.integers(0, 12, s)
        lat[2 * s : 3 * s] = np.clip(
            plat[pick] + rng.normal(0, 0.5, s), -89.9999, 89.9999
        )
        lng[2 * s : 3 * s] = (
            (plng[pick] + rng.normal(0, 0.5, s) + 180.0) % 360.0
        ) - 180.0
        return lat, lng

    def test_volume_encode_decode_roundtrip(self):
        n = 1_000_000
        lat, lng = self._fuzz_points(n, seed=1234)
        res_of = np.arange(n) % 16
        for r in range(16):
            m = res_of == r
            cells = h3.geo_to_h3(lat[m], lng[m], r)
            assert ix.is_valid(cells).all(), f"res {r}: invalid encodes"
            clat, clng = h3.h3_to_geo(cells)
            again = h3.geo_to_h3(clat, clng, r)
            bad = int((again != cells).sum())
            assert bad == 0, f"res {r}: {bad}/{m.sum()} roundtrip failures"

    def test_volume_boundary_self_containment(self):
        from h3_rs_spark.h3core import geom

        n = 200_000
        lat, lng = self._fuzz_points(n, seed=987)
        res_of = np.arange(n) % 16
        for r in range(16):
            cells = np.unique(h3.geo_to_h3(lat[res_of == r], lng[res_of == r], r))
            blat, blng = h3.h3_to_geo_boundary(cells)
            nv = (~np.isnan(blat)).sum(axis=1)
            assert ((nv >= 5) & (nv <= 10)).all(), f"res {r}: vertex count"
            clat, clng = h3.h3_to_geo(cells)
            cxyz = geom.geo_to_xyz(np.radians(clat), np.radians(clng))
            vxyz = geom.geo_to_xyz(np.radians(blat), np.radians(blng))
            eps = 1e-3
            p = (1 - eps) * vxyz + eps * cxyz[:, None, :]
            p = p / np.linalg.norm(p, axis=-1, keepdims=True)
            nlat = np.degrees(np.arcsin(np.clip(p[..., 2], -1, 1)))
            nlng = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
            valid = ~np.isnan(blat)
            owner = np.broadcast_to(cells[:, None], blat.shape)[valid]
            got = h3.geo_to_h3(nlat[valid], nlng[valid], r)
            bad = int((got != owner).sum())
            assert bad == 0, (
                f"res {r}: {bad}/{valid.sum()} nudged boundary vertices "
                "escaped their cell"
            )

    def test_volume_disk_dissolve_polyfill_roundtrip(self):
        """Dissolve a random k-disk to its polygon, polyfill the polygon
        back at the same res -> the EXACT original cell set (polyfill is
        centroid-in-polygon; every disk centroid is strictly inside the
        dissolved boundary, every outside-neighbor centroid outside)."""
        from h3_rs_spark.h3core.regions import (
            cells_to_multipolygon, polyfill,
        )

        lat, lng = self._fuzz_points(150, seed=555)
        rng = np.random.default_rng(777)
        ks = rng.integers(1, 4, 150)
        res_list = rng.integers(3, 10, 150)
        n_checked = 0
        for i in range(150):
            r, k = int(res_list[i]), int(ks[i])
            cell = h3.geo_to_h3(lat[i : i + 1], lng[i : i + 1], r)
            _, disk = tv.k_ring(cell, k)
            rings = cells_to_multipolygon(disk)
            # disks dissolve to a single outer ring (no holes possible)
            assert len(rings) == 1, f"case {i}: {len(rings)} rings"
            back = polyfill(rings[0], [], r)
            assert set(back.tolist()) == set(disk.tolist()), (
                f"case {i} (res {r}, k {k}): polyfill round-trip "
                f"mismatch {len(back)} vs {len(disk)}"
            )
            n_checked += 1
        assert n_checked == 150
