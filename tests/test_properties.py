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
