"""Golden-vector tests for the from-scratch H3 kernel.

Every fixture below is taken from the reference crate's unit tests
(/root/reference/src/*.rs), themselves ported from h3-py / h3-js
(src/lib.rs:58-61) — i.e. the upstream H3 ecosystem's golden constants.
Where the reference's assertions test FFI buffer padding rather than
true cell sets (SURVEY.md §2.4-2.6 hazards), we assert the *true* sets.
"""

import numpy as np
import pytest

from h3_rs_spark import h3core as h3


GOLD_LNG, GOLD_LAT = -122.0553238, 37.3615593


class TestIndexing:
    def test_geo_to_h3_golden(self):
        # src/index.rs:111-117
        h = h3.geo_to_h3(np.array([GOLD_LAT]), np.array([GOLD_LNG]), 5)
        assert hex(int(h[0])) == hex(0x85283473FFFFFFF)

    def test_geo_to_h3_z7(self):
        # h3-sys/src/lib.rs:80-92
        h = h3.geo_to_h3(np.array([GOLD_LAT]), np.array([GOLD_LNG]), 7)
        assert int(h[0]) == 0x87283472BFFFFFF

    def test_all_resolutions_roundtrip_res(self):
        # src/index.rs:97-100 + src/inspection.rs:129-137
        for res in range(16):
            h = h3.geo_to_h3(np.array([GOLD_LAT]), np.array([GOLD_LNG]), res)
            assert int(h[0]) != 0
            assert int(h3.get_resolution(h)[0]) == res

    def test_world_wrapping(self):
        # src/index.rs:120-134
        full = 360.0
        base = int(h3.geo_to_h3(np.array([GOLD_LAT]), np.array([GOLD_LNG]), 5)[0])
        for dlat, dlng in [(0, full), (full, 0), (full, full)]:
            h = h3.geo_to_h3(
                np.array([GOLD_LAT + dlat]), np.array([GOLD_LNG + dlng]), 5
            )
            assert int(h[0]) == base

    def test_nan_is_error(self):
        # src/index.rs:102-107
        h = h3.geo_to_h3(np.array([np.nan, 0.0]), np.array([0.0, np.nan]), 0)
        assert (h == 0).all()

    def test_h3_to_geo_golden(self):
        # src/index.rs:141-153
        lat, lng = h3.h3_to_geo(np.array([0x85283473FFFFFFF]))
        assert abs(lat[0] - 37.34579337536848) < 1e-9
        assert abs(lng[0] - (-121.97637597255124)) < 1e-9


class TestInspection:
    def test_is_valid(self):
        # src/inspection.rs:110-126
        assert h3.is_valid(np.array([0x85283473FFFFFFF]))[0]
        assert h3.is_valid(np.array([0x850DAB63FFFFFFF]))[0]
        assert not h3.is_valid(np.array([0x5004295803A88]))[0]

    def test_resolution_base_cell(self):
        h = np.array([0x85283473FFFFFFF])
        assert int(h3.get_resolution(h)[0]) == 5
        assert int(h3.get_base_cell(h)[0]) == 20

    def test_is_res_class3(self):
        assert h3.is_res_class3(np.array([0x85283473FFFFFFF]))[0]  # res 5
        h4 = h3.geo_to_h3(np.array([GOLD_LAT]), np.array([GOLD_LNG]), 4)
        assert not h3.is_res_class3(h4)[0]

    def test_pentagon_flag(self):
        assert h3.is_pentagon(np.array([0x821C07FFFFFFFFF]))[0]
        assert not h3.is_pentagon(np.array([0x85283473FFFFFFF]))[0]

    def test_hex_codec(self):
        s = h3.h3_to_hex_str(np.array([0x85283473FFFFFFF]))
        assert s == ["85283473fffffff"]
        assert int(h3.hex_str_to_h3(s)[0]) == 0x85283473FFFFFFF


class TestResolutionStats:
    def test_grid_resolution_goldens(self):
        # src/resolution.rs:105-110
        assert abs(h3.edge_length_m(1) - 418676.0055) < 1e-4
        assert h3.num_hexagons(1) == 842
        assert abs(h3.hex_area_m2(1) - 607221000000.0) / 607221000000.0 < 1e-6


class TestTraversal:
    def test_k_ring_1(self):
        # src/traversal.rs:196-214 (count + membership, true set)
        _, cells = h3.k_ring(np.array([0x8928308280FFFFF]), 1)
        got = {int(c) for c in cells}
        assert len(got) == 7
        expected = {
            0x8928308280FFFFF, 0x8928308280BFFFF, 0x89283082807FFFF,
            0x89283082877FFFF, 0x89283082803FFFF, 0x89283082873FFFF,
            0x8928308283BFFFF,
        }
        assert got == expected

    def test_k_ring_2(self):
        # src/traversal.rs:217-246
        _, cells = h3.k_ring(np.array([0x8928308280FFFFF]), 2)
        got = {int(c) for c in cells}
        assert len(got) == 19
        expected = {
            0x89283082813FFFF, 0x89283082817FFFF, 0x8928308281BFFFF,
            0x89283082863FFFF, 0x89283082823FFFF, 0x89283082873FFFF,
            0x89283082877FFFF, 0x8928308287BFFFF, 0x89283082833FFFF,
            0x8928308282BFFFF, 0x8928308283BFFFF, 0x89283082857FFFF,
            0x892830828ABFFFF, 0x89283082847FFFF, 0x89283082867FFFF,
            0x89283082803FFFF, 0x89283082807FFFF, 0x8928308280BFFFF,
            0x8928308280FFFFF,
        }
        assert got == expected

    def test_k_ring_pentagon(self):
        # src/traversal.rs:249-265
        _, cells = h3.k_ring(np.array([0x821C07FFFFFFFFF]), 1)
        got = {int(c) for c in cells}
        assert len(got) == 6
        expected = {
            0x821C2FFFFFFFFFF, 0x821C27FFFFFFFFF, 0x821C07FFFFFFFFF,
            0x821C17FFFFFFFFF, 0x821C1FFFFFFFFFF, 0x821C37FFFFFFFFF,
        }
        assert got == expected

    def test_k_ring_distances(self):
        # src/traversal.rs:267-290
        _, cells, dist = h3.k_ring_distances(np.array([0x8928308280FFFFF]), 1)
        assert (dist == 0).sum() == 1
        assert (dist == 1).sum() == 6
        assert int(cells[dist == 0][0]) == 0x8928308280FFFFF

    def test_k_ring_distances_pentagon_adjacent(self):
        # src/traversal.rs:285-289 — the [1, 6, 11] pentagon distortion
        _, _, dist = h3.k_ring_distances(np.array([0x870800003FFFFFF]), 2)
        assert (dist == 0).sum() == 1
        assert (dist == 1).sum() == 6
        assert (dist == 2).sum() == 11

    def test_hex_ring_1(self):
        # src/traversal.rs:292-306 — true set (no zero padding)
        _, cells = h3.hex_ring(np.array([0x8928308280FFFFF]), 1)
        got = {int(c) for c in cells}
        expected = {
            0x8928308280BFFFF, 0x89283082807FFFF, 0x89283082877FFFF,
            0x89283082803FFFF, 0x89283082873FFFF, 0x8928308283BFFFF,
        }
        assert got == expected

    def test_hex_ring_2(self):
        # src/traversal.rs:308-328
        _, cells = h3.hex_ring(np.array([0x8928308280FFFFF]), 2)
        got = {int(c) for c in cells}
        expected = {
            0x89283082813FFFF, 0x89283082817FFFF, 0x8928308281BFFFF,
            0x89283082863FFFF, 0x89283082823FFFF, 0x8928308287BFFFF,
            0x89283082833FFFF, 0x8928308282BFFFF, 0x89283082857FFFF,
            0x892830828ABFFFF, 0x89283082847FFFF, 0x89283082867FFFF,
        }
        assert got == expected
        assert len(got) == 12

    def test_h3_distance(self):
        origin = 0x8928308280FFFFF
        _, cells, dist = h3.k_ring_distances(np.array([origin]), 2)
        for c, d in zip(cells, dist):
            assert h3.h3_distance(origin, int(c)) == int(d)

    def test_h3_line_endpoints(self):
        a = 0x8928308280FFFFF
        _, cells = h3.hex_ring(np.array([a]), 2)
        b = int(cells[0])
        path = h3.h3_line(a, b)
        assert path[0] == a and path[-1] == b
        assert len(path) == 3  # distance 2 -> 3 cells


class TestHierarchy:
    def test_children_counts(self):
        # src/hierarchy.rs:122-129
        h = 0x87283472BFFFFFF
        assert len(h3.to_children(h, 7)) == 1
        assert len(h3.to_children(h, 8)) == 7

    def test_parent_of_children(self):
        h = 0x87283472BFFFFFF
        ch = h3.to_children(h, 9)
        parents = h3.to_parent(ch, 7)
        assert (parents == h).all()

    def test_max_children(self):
        assert int(h3.max_children(7, 9)) == 49

    def test_pentagon_children(self):
        pent = 0x821C07FFFFFFFFF  # res 2 pentagon
        ch = h3.to_children(int(pent), 3)
        assert len(ch) == 6  # pentagons have 6 children
        assert h3.is_pentagon(ch).sum() == 1

    def test_compact_uncompact_roundtrip(self):
        h = 0x87283472BFFFFFF
        ch = h3.to_children(h, 9)
        compacted = h3.compact(ch)
        assert len(compacted) == 1 and int(compacted[0]) == h
        expanded = h3.uncompact(compacted, 9)
        assert set(expanded.tolist()) == set(ch.tolist())


SF_POLYGON = [
    (-122.4089866999972145, 37.813318999983238),
    (-122.3805436999997056, 37.7866302000007224),
    (-122.3544736999993603, 37.7198061999978478),
    (-122.5123436999983966, 37.7076131999975672),
    (-122.5247187000021967, 37.7835871999971715),
    (-122.4798767000009008, 37.8151571999998453),
]


class TestRegions:
    def test_boundary_golden(self):
        # src/region.rs:85-102 — 6 vertices at 1e-9 (order-sensitive up to
        # rotation: assert as an ordered cycle)
        expected = [
            (-121.91508032705622, 37.271355866731895),
            (-121.86222328902491, 37.353926450852256),
            (-121.9235499963016, 37.42834118609435),
            (-122.0377349642703, 37.42012867767778),
            (-122.09042892904395, 37.33755608435298),
            (-122.02910130919, 37.26319797461824),
        ]
        blat, blng = h3.h3_to_geo_boundary(np.array([0x85283473FFFFFFF]))
        keep = ~np.isnan(blat[0])
        verts = list(zip(blng[0][keep], blat[0][keep]))
        # mid-face cell: no icosa-edge crossings, exactly 6 true vertices
        assert len(verts) == 6
        # find rotation offset aligning to expected
        errs = []
        for off in range(6):
            rot = verts[off:] + verts[:off]
            err = max(
                max(abs(a - c), abs(b - d))
                for (a, b), (c, d) in zip(rot, expected)
            )
            errs.append(err)
        assert min(errs) < 1e-9, min(errs)
        assert int(np.argmin(errs)) == 0, "vertex order should match C exactly"

    def test_polyfill_sf(self):
        # src/region.rs:104-121 asserts > 1000; the exact count implied by
        # the h3-js/h3-py golden (and src/hierarchy.rs:145-148) is 1253
        cells = h3.polyfill(SF_POLYGON, [], 9)
        assert len(cells) == 1253

    def test_polyfill_sf_compact(self):
        # src/hierarchy.rs:131-149: compact 209, uncompact 1253
        cells = h3.polyfill(SF_POLYGON, [], 9)
        compacted = h3.compact(cells)
        assert len(compacted) == 209
        expanded = h3.uncompact(compacted, 9)
        assert len(expanded) == 1253
        assert set(expanded.tolist()) == set(cells.tolist())

    def test_polyfill_with_hole(self):
        # src/region.rs:126-147
        hole = [
            (-122.4471197, 37.7869802),
            (-122.4590777, 37.7664102),
            (-122.4137097, 37.7710682),
        ]
        full = h3.polyfill(SF_POLYGON, [], 9)
        holed = h3.polyfill(SF_POLYGON, [hole], 9)
        assert 0 < len(holed) < len(full)
        assert set(holed.tolist()) <= set(full.tolist())

    def test_polyfill_empty_hole_ignored(self):
        # src/raw.rs:122-125 + src/region.rs:183-218 (Sydney, interiors [[]])
        full = h3.polyfill(SF_POLYGON, [], 9)
        same = h3.polyfill(SF_POLYGON, [[]], 9)
        assert set(full.tolist()) == set(same.tolist())

    def test_polyfill_sydney(self):
        # src/region.rs:183-218 (> 10 cells at Z9)
        sydney = [
            (151.1979259, -33.8555555), (151.2074556, -33.8519779),
            (151.224743, -33.8579597), (151.2254986, -33.8582212),
            (151.235313348, -33.8564183032), (151.234799568, -33.8594049408),
            (151.233485084, -33.8641069037), (151.233181742, -33.8715791334),
            (151.223980353, -33.8876967719), (151.219388501, -33.8873877027),
            (151.2189209, -33.8869995), (151.2181177, -33.886283399999996),
            (151.2157995, -33.8851287), (151.2156925, -33.8852471),
            (151.2141233, -33.8851287), (151.2116267, -33.8847438),
            (151.2083456, -33.8834707), (151.2080246, -33.8827601),
            (151.2059204, -33.8816053), (151.2043868, -33.8827601),
            (151.2028176, -33.8838556), (151.2022826, -33.8839148),
            (151.2011057, -33.8842405), (151.1986114, -33.8842819),
            (151.1986091, -33.8842405), (151.1948287, -33.8773416),
            (151.1923322, -33.8740845), (151.1850566, -33.8697019),
            (151.1902636, -33.8625354), (151.1986805, -33.8612915),
            (151.1979259, -33.8555555),
        ]
        cells = h3.polyfill(sydney, [[]], 9)
        assert len(cells) > 10
        # all centroids must be inside
        lat, lng = h3.h3_to_geo(cells)
        assert h3.points_in_polygon(lng, lat, sydney).all()

    def test_polyfill_null_island(self):
        # src/region.rs:228-243 (> 10 cells at Z4)
        box = [
            (-3.218994140625, -3.0856655287215378),
            (-3.218994140625, 3.6888551431470478),
            (3.5815429687499996, 3.6888551431470478),
            (3.5815429687499996, -3.0856655287215378),
        ]
        cells = h3.polyfill(box, [], 4)
        assert len(cells) > 10

    def test_boundary_split(self):
        cells = h3.polyfill(SF_POLYGON, [], 9)
        interior, boundary = h3.cells_to_boundary_split(cells, SF_POLYGON)
        assert len(interior) + len(boundary) == len(cells)
        assert len(interior) > 0 and len(boundary) > 0


class TestKernelProperties:
    def test_encode_decode_roundtrip_grid(self):
        rng = np.random.default_rng(3)
        n = 20_000
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
        lng = rng.uniform(-180, 180, n)
        for res in (2, 7, 11):
            h = h3.geo_to_h3(lat, lng, res)
            clat, clng = h3.h3_to_geo(h)
            h2 = h3.geo_to_h3(clat, clng, res)
            assert (h == h2).all()

    def test_parent_children_identity(self):
        rng = np.random.default_rng(4)
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 200)))
        lng = rng.uniform(-180, 180, 200)
        h = h3.geo_to_h3(lat, lng, 6)
        for cell in np.unique(h)[:50]:
            ch = h3.to_children(int(cell), 8)
            assert (h3.to_parent(ch, 6) == cell).all()

    def test_boundary_contains_center(self):
        rng = np.random.default_rng(5)
        lat = np.degrees(np.arcsin(rng.uniform(-0.95, 0.95, 500)))
        lng = rng.uniform(-180, 180, 500)
        h = np.unique(h3.geo_to_h3(lat, lng, 6))
        clat, clng = h3.h3_to_geo(h)
        blat, blng = h3.h3_to_geo_boundary(h)
        for i in range(len(h)):
            ring = [
                (blng[i, v], blat[i, v])
                for v in range(6)
                if not np.isnan(blat[i, v])
            ]
            # skip antimeridian-crossing rings (PIP helper is planar)
            lngs = [p[0] for p in ring]
            if max(lngs) - min(lngs) > 180:
                continue
            inside = h3.points_in_polygon(
                np.array([clng[i]]), np.array([clat[i]]), np.array(ring)
            )
            assert inside[0], (i, hex(int(h[i])))


class TestExtendedParity:
    def test_hex_range_pentagon_flag(self):
        # T6 semantics: hexagons near a pentagon -> error flag set
        from h3_rs_spark.h3core.traversal import hex_range

        _, _, ok = hex_range(np.array([0x8928308280FFFFF]), 2)
        assert ok[0]  # far from any pentagon
        _, _, ok = hex_range(np.array([0x821C07FFFFFFFFF]), 1)
        assert not ok[0]  # pentagon origin

    def test_icosahedron_faces(self):
        from h3_rs_spark.h3core.faceijk import icosahedron_faces, max_face_count

        faces = icosahedron_faces(np.array([0x85283473FFFFFFF]))[0]
        assert faces == [7]  # mid-face cell touches one face
        pent_faces = icosahedron_faces(np.array([0x821C07FFFFFFFFF]))[0]
        assert len(pent_faces) == 5  # pentagons sit on icosa vertices
        assert int(max_face_count(np.array([0x821C07FFFFFFFFF]))[0]) == 5

    def test_cells_to_multipolygon_dissolve(self):
        from h3_rs_spark.h3core.regions import cells_to_multipolygon

        cells = h3.polyfill(SF_POLYGON, [], 8)
        rings = cells_to_multipolygon(cells)
        assert len(rings) >= 1
        outer = max(rings, key=len)
        # every cell centroid must be inside the dissolved outer ring
        lat, lng = h3.h3_to_geo(cells)
        inside = h3.points_in_polygon(lng, lat, np.array(outer))
        assert inside.all()
        # single compact blob -> hexagon-boundary vertex count matches
        # the single-occurrence edge count
        k = 1
        _, one_cell = h3.k_ring(np.array([0x85283473FFFFFFF]), 0)
        r1 = cells_to_multipolygon(one_cell)
        assert len(r1) == 1 and len(r1[0]) == 6

    def test_dissolve_pentagon_disk(self):
        """Dissolving a pentagon-containing set must stitch the 5-vertex
        boundary seamlessly: a lone pentagon gives one 5-vertex ring,
        its k=1 disk (pentagon + 5 neighbors) one closed outer ring of
        5*... = 15 single-occurrence edges, and every member centroid
        lies inside (r5 edge-case coverage for q44's operator)."""
        from h3_rs_spark.h3core import indexing
        from h3_rs_spark.h3core.constants import PENTAGON_BASE_CELLS
        from h3_rs_spark.h3core.regions import cells_to_multipolygon

        digits = np.full((1, 15), 7, dtype=np.int64)
        digits[:, :5] = 0
        pent = indexing.from_components(
            PENTAGON_BASE_CELLS[:1].astype(np.int64), 5, digits
        )
        lone = cells_to_multipolygon(pent)
        assert len(lone) == 1 and len(lone[0]) == 5
        _, disk = h3.k_ring(pent, 1)
        assert disk.shape[0] == 6  # pentagon deficit: 1 + 5 neighbors
        rings = cells_to_multipolygon(disk)
        assert len(rings) == 1
        lat, lng = h3.h3_to_geo(disk)
        inside = h3.points_in_polygon(lng, lat, np.array(rings[0]))
        assert inside.all()


class TestClassIIIDistortionVertices:
    """Class III cells whose edges cross icosahedron face edges get an
    extra vertex per crossing (H3 h3ToGeoBoundary; reference buffer
    MAX_CELL_BNDRY_VERTS=10, h3-sys/src/ffi.rs:3, trimmed at
    src/raw.rs:92-103). No external golden exists in this container, so
    the vertices are validated against the geometry itself: every
    inserted vertex must lie exactly on an icosahedron edge great
    circle, with the true 6 (5) vertices preserved in cyclic order."""

    def _icosa_edge_normals(self):
        from h3_rs_spark.h3core import geom
        from h3_rs_spark.h3core.constants import MAX_DIM_BY_CII_RES

        m = float(MAX_DIM_BY_CII_RES[2])
        s32 = np.sqrt(3.0) / 2.0
        ev = np.array([[3 * m, 0], [-1.5 * m, 3 * s32 * m], [-1.5 * m, -3 * s32 * m]])
        normals = []
        for f in range(20):
            la, lo = geom.hex2d_to_geo(ev, np.full(3, f), 2, substrate=True)
            c = geom.geo_to_xyz(la, lo)
            for a, b in ((0, 1), (1, 2), (2, 0)):
                nrm = np.cross(c[a], c[b])
                normals.append(nrm / np.linalg.norm(nrm))
        return np.array(normals)

    def test_hexagon_crossings_on_icosa_edges(self):
        from h3_rs_spark.h3core import geom

        normals = self._icosa_edge_normals()
        rng = np.random.default_rng(1)
        lats = rng.uniform(-85, 85, 8000)
        lngs = rng.uniform(-180, 180, 8000)
        checked = 0
        for res in (1, 3, 5):
            cells = np.unique(h3.geo_to_h3(lats, lngs, res))
            la10, lo10 = h3.h3_to_geo_boundary(cells, distortion=True)
            la6, lo6 = h3.h3_to_geo_boundary(cells, distortion=False)
            nv10 = (~np.isnan(la10)).sum(axis=1)
            assert (nv10 >= 6).all() and (nv10 <= 10).all()
            for i in np.flatnonzero(nv10 > 6):
                true6 = {
                    (round(la6[i, v], 9), round(lo6[i, v], 9))
                    for v in range(6)
                    if not np.isnan(la6[i, v])
                }
                seq10 = [
                    (round(la10[i, v], 9), round(lo10[i, v], 9))
                    for v in range(int(nv10[i]))
                ]
                for p in seq10:
                    if p in true6:
                        continue
                    xyz = geom.geo_to_xyz(np.radians(p[0]), np.radians(p[1]))
                    assert np.abs(normals @ xyz).min() < 1e-9
                    checked += 1
                # true vertices preserved in order
                assert [p for p in seq10 if p in true6] == [
                    (round(la6[i, v], 9), round(lo6[i, v], 9))
                    for v in range(6)
                    if not np.isnan(la6[i, v])
                ]
        assert checked > 50  # the sample must actually exercise crossings

    def test_class2_always_six(self):
        rng = np.random.default_rng(2)
        lats = rng.uniform(-85, 85, 3000)
        lngs = rng.uniform(-180, 180, 3000)
        for res in (2, 4, 6):
            cells = np.unique(h3.geo_to_h3(lats, lngs, res))
            la, _ = h3.h3_to_geo_boundary(cells, distortion=True)
            pent = h3.is_pentagon(cells)
            nv = (~np.isnan(la)).sum(axis=1)
            assert (nv[~pent] == 6).all()

    def test_pentagon_class3_ten_vertices(self):
        from h3_rs_spark.h3core import geom, indexing
        from h3_rs_spark.h3core.constants import BASE_CELL_IS_PENTAGON

        pent_bc = np.flatnonzero(BASE_CELL_IS_PENTAGON)
        h1 = indexing.from_components(
            pent_bc,
            np.full(len(pent_bc), 1),
            np.zeros((len(pent_bc), 15), dtype=np.int64),
        )
        la, lo = h3.h3_to_geo_boundary(h1)
        nv = (~np.isnan(la)).sum(axis=1)
        # all Class III pentagon edges cross icosa edges: 5 true + 5 extra
        assert (nv == 10).all()
        normals = self._icosa_edge_normals()
        la6, lo6 = h3.h3_to_geo_boundary(h1, distortion=False)
        for i in range(len(h1)):
            true5 = {
                (round(la6[i, v], 9), round(lo6[i, v], 9))
                for v in range(6)
                if not np.isnan(la6[i, v])
            }
            extra = 0
            for v in range(10):
                p = (round(la[i, v], 9), round(lo[i, v], 9))
                if p in true5:
                    continue
                xyz = geom.geo_to_xyz(np.radians(p[0]), np.radians(p[1]))
                assert np.abs(normals @ xyz).min() < 1e-9
                extra += 1
            assert extra == 5


class TestLocalFrame:
    """Local-face-frame distance and line (H3 localIJ analogue;
    reference src/traversal.rs:90-123). The BFS oracle is ground truth."""

    def test_distance_matches_bfs_including_cross_face(self):
        from h3_rs_spark.h3core import traversal as tv
        from h3_rs_spark.h3core.localij import h3_distance_batch

        rng = np.random.default_rng(3)
        lats = rng.uniform(-85, 85, 80)
        lngs = rng.uniform(-180, 180, 80)
        n = 0
        for res in (2, 5, 8):
            for o in np.unique(h3.geo_to_h3(lats, lngs, res))[:12]:
                _, ring = tv.k_ring(np.array([o]), 4)
                for p in rng.choice(ring, size=4, replace=False):
                    want = tv.h3_distance_bfs(int(o), int(p))
                    got = int(
                        h3_distance_batch(np.array([o]), np.array([p]))[0]
                    )
                    assert got == want, (hex(int(o)), hex(int(p)), got, want)
                    n += 1
        assert n > 100

    def test_distance_pentagon_adjacent(self):
        from h3_rs_spark.h3core import traversal as tv
        from h3_rs_spark.h3core.localij import h3_distance_batch

        _, cells, dist = tv.k_ring_distances(np.array([0x870800003FFFFFF]), 3)
        got = h3_distance_batch(np.full(len(cells), 0x870800003FFFFFF), cells)
        assert (got == dist).all()

    def test_line_properties(self):
        """gridPathCells contract: length == distance+1, consecutive
        cells are neighbors, endpoints exact, no duplicates."""
        from h3_rs_spark.h3core import indexing as ix
        from h3_rs_spark.h3core import traversal as tv
        from h3_rs_spark.h3core.localij import h3_distance_batch, h3_line_local

        rng = np.random.default_rng(4)
        lats = rng.uniform(-85, 85, 60)
        lngs = rng.uniform(-180, 180, 60)
        checked = 0
        for res in (3, 7):
            for o in np.unique(h3.geo_to_h3(lats, lngs, res))[:10]:
                _, ring = tv.k_ring(np.array([o]), 5)
                for p in rng.choice(ring, size=3, replace=False):
                    path = h3_line_local(int(o), int(p))
                    if path is None:
                        continue
                    d = int(h3_distance_batch(np.array([o]), np.array([p]))[0])
                    assert len(path) == d + 1
                    assert path[0] == o and path[-1] == p
                    assert ix.is_valid(path).all()
                    assert len(set(path.tolist())) == len(path)
                    for i in range(len(path) - 1):
                        _, nb = tv.neighbors(np.array([path[i]]))
                        assert path[i + 1] in nb
                    checked += 1
        assert checked > 30

    def test_h3_line_public_api_minimal(self):
        """h3_line now returns a minimal path wherever the local frame
        applies (old greedy walk was only connected, not minimal)."""
        from h3_rs_spark.h3core import traversal as tv

        a = 0x8928308280FFFFF
        _, ring = tv.hex_ring(np.array([a]), 4)
        for b in ring[:6]:
            path = tv.h3_line(a, int(b))
            assert len(path) == tv.h3_distance(a, int(b)) + 1

    def test_h3_line_batch_parity(self):
        """h3_line_batch (r7: greedy-fallback pairs walk together, one
        batched neighbors() call per step) must return bit-identical
        paths to the scalar h3_line — including pentagon-neighborhood
        pairs that force the greedy fallback (the q38 fixture shape)."""
        from h3_rs_spark.h3core import indexing as ix
        from h3_rs_spark.h3core import traversal as tv
        from h3_rs_spark.h3core.constants import PENTAGON_BASE_CELLS

        digits = np.full((1, 15), 7, dtype=np.int64)
        digits[:, :7] = 0
        pent = ix.from_components(
            PENTAGON_BASE_CELLS[:1].astype(np.int64), 7, digits
        )
        plat, plng = h3.h3_to_geo(pent)
        metros = [
            (37.76, -122.44), (-33.87, 151.21),
            (float(plat[0]), float(plng[0])),  # pentagon neighborhood
        ]
        a_list, b_list = [], []
        for m, (mlat, mlng) in enumerate(metros):
            lats = mlat + 0.11 * np.sin(2.7 * np.arange(16) + m)
            lngs = mlng + 0.11 * np.cos(1.9 * np.arange(16) + 3.0 * m)
            cells = h3.geo_to_h3(lats, lngs, 7)
            for x, y in zip(cells[:-1], cells[1:]):
                if x != y:
                    a_list.append(int(x))
                    b_list.append(int(y))
        batch = tv.h3_line_batch(np.array(a_list), np.array(b_list))
        n_fallback = 0
        from h3_rs_spark.h3core.localij import h3_line_local

        for x, y, got in zip(a_list, b_list, batch):
            if h3_line_local(x, y) is None:
                n_fallback += 1
            assert (got == tv.h3_line(x, y)).all()
        assert n_fallback > 0  # the pentagon metro must exercise greedy


class TestTransmeridian:
    """Antimeridian-crossing polygons (beyond the reference's fixtures —
    H3's own polyfill handles these; round 1 documented them as a bbox
    limitation, closed in round 2 by shifting into the [0,360) domain)."""

    BOX = [(179.0, -1.0), (-179.0, -1.0), (-179.0, 1.0), (179.0, 1.0)]

    def test_pip_across_seam(self):
        from h3_rs_spark.h3core import regions

        inside = regions.points_in_polygon(
            np.array([179.9, -179.9, 178.0, 0.0]),
            np.array([0.0, 0.0, 0.0, 0.0]),
            self.BOX,
        )
        assert inside.tolist() == [True, True, False, False]

    def test_polyfill_straddles_seam(self):
        from h3_rs_spark.h3core import regions

        cells = regions.polyfill(self.BOX, [], 5)
        clat, clng = h3.h3_to_geo(cells)
        assert (clng > 100).any() and (clng < -100).any()
        # count comparable to the identical box at lng 0 (grid alignment
        # differs slightly; same latitude band so same cell sizes)
        ref_box = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
        ref = regions.polyfill(ref_box, [], 5)
        assert abs(len(cells) - len(ref)) / len(ref) < 0.1
        # every returned centroid is truly inside (shifted-domain check)
        lngs = np.where(clng < 0, clng + 360.0, clng)
        assert ((lngs >= 179.0) & (lngs <= 181.0)).all()
        assert ((clat >= -1.0) & (clat <= 1.0)).all()

    def test_ring_area_transmeridian(self):
        from h3_rs_spark.h3core import regions

        a = regions.ring_area_m2(self.BOX)
        b = regions.ring_area_m2(
            [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
        )
        assert abs(a - b) / b < 1e-9


class TestDissolveShapes:
    def test_annulus_and_islands(self):
        from h3_rs_spark.h3core import regions
        from h3_rs_spark.h3core import traversal as tv

        A = 0x8928308280FFFFF
        _, hollow = tv.hex_ring(np.array([A]), 1)
        rings = regions.cells_to_multipolygon(hollow)
        assert sorted(len(r) for r in rings) == [6, 18]  # hole + outer
        _, disk = tv.k_ring(np.array([A]), 2)
        far = h3.geo_to_h3(np.array([-33.87]), np.array([151.21]), 9)
        _, far_disk = tv.k_ring(far, 1)
        rings = regions.cells_to_multipolygon(
            np.concatenate([disk, far_disk])
        )
        assert sorted(len(r) for r in rings) == [18, 30]


class TestLocalFramePentagonRegion:
    def test_distance_near_pentagons_matches_bfs(self):
        """Exhaustive BFS comparison for pairs AROUND pentagon homes —
        the region where a misplaced corner guard (the round-2 unfold
        ordering bug: rotate-then-translate instead of translate-then-
        rotate) would let wrong planar distances through."""
        from h3_rs_spark.h3core import indexing, traversal as tv
        from h3_rs_spark.h3core.constants import BASE_CELL_IS_PENTAGON
        from h3_rs_spark.h3core.localij import h3_distance_batch

        pent_bc = np.flatnonzero(BASE_CELL_IS_PENTAGON)[:4]
        rng = np.random.default_rng(9)
        checked = 0
        for bc in pent_bc:
            pent = int(
                indexing.from_components(
                    np.array([bc]), np.array([3]),
                    np.zeros((1, 15), dtype=np.int64),
                )[0]
            )
            _, disk = tv.k_ring(np.array([pent]), 3)
            picks = rng.choice(disk, size=min(12, len(disk)), replace=False)
            for i, a in enumerate(picks):
                for b in picks[i + 1 :][:4]:
                    want = tv.h3_distance_bfs(int(a), int(b))
                    got = int(
                        h3_distance_batch(np.array([a]), np.array([b]))[0]
                    )
                    assert got == want, (hex(int(a)), hex(int(b)), got, want)
                    checked += 1
        assert checked > 100


class TestPolarPolyfill:
    """Pole-containing polygons (beyond the reference: H3 v3.6 itself
    cannot fill them). Constant-latitude rings make containment
    enumerable exactly: every ring edge linearly interpolates latitude
    between equal endpoints, so the true interior of a lat-L polar cap
    is precisely {centroid lat > L} — checked against the FULL cell
    enumeration at the target res (uncompacted from the 122 base
    cells), cell-for-cell."""

    @staticmethod
    def _all_cells(res):
        from h3_rs_spark.h3core import hierarchy, indexing

        res0 = indexing.from_components(
            np.arange(122, dtype=np.int64), 0, np.full((122, 15), 7)
        )
        return hierarchy.uncompact(res0, res)

    @staticmethod
    def _ring(lat, eastward=True, n=12):
        lngs = np.linspace(-180.0, 180.0, n, endpoint=False)
        if not eastward:
            lngs = lngs[::-1]
        return [(float(lng), float(lat)) for lng in lngs]

    def test_north_cap_exact(self):
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import regions

        got = set(regions.polyfill(self._ring(80.0), [], 3).tolist())
        allc = self._all_cells(3)
        lat, _ = fk.h3_to_geo(allc)
        exp = set(allc[lat > 80.0].tolist())
        assert got == exp and len(exp) > 50

    def test_south_cap_exact(self):
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import regions

        # westward winding -> interior left of travel = south side
        got = set(
            regions.polyfill(self._ring(-80.0, eastward=False), [], 3).tolist()
        )
        allc = self._all_cells(3)
        lat, _ = fk.h3_to_geo(allc)
        exp = set(allc[lat < -80.0].tolist())
        assert got == exp and len(exp) > 50

    def test_polar_annulus_with_polar_hole(self):
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import regions

        got = set(
            regions.polyfill(
                self._ring(75.0), [self._ring(85.0)], 3
            ).tolist()
        )
        allc = self._all_cells(3)
        lat, _ = fk.h3_to_geo(allc)
        exp = set(allc[(lat > 75.0) & ~(lat > 85.0)].tolist())
        assert got == exp and len(exp) > 50

    def test_polar_annulus_rfc7946_hole_winding(self):
        """RFC 7946 holes wind OPPOSITE to the exterior. Containment
        must not depend on the hole's winding: a polar hole inside a
        polar exterior always excludes the exterior pole's cap, so an
        eastward exterior at 75N with a westward (clockwise) hole at
        85N yields the same annulus as the same-winding form above."""
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import regions

        same = set(
            regions.polyfill(self._ring(75.0), [self._ring(85.0)], 3).tolist()
        )
        opposite = set(
            regions.polyfill(
                self._ring(75.0), [self._ring(85.0, eastward=False)], 3
            ).tolist()
        )
        allc = self._all_cells(3)
        lat, _ = fk.h3_to_geo(allc)
        exp = set(allc[(lat > 75.0) & ~(lat > 85.0)].tolist())
        assert opposite == same == exp and len(exp) > 50

    def test_polar_cover_split_consistent(self):
        """polygon_cover over a polar cap: interior/boundary disjoint,
        every truly-contained centroid is in interior ∪ boundary."""
        from h3_rs_spark.h3core import faceijk as fk
        from h3_rs_spark.h3core import regions

        ring = self._ring(82.0)
        interior, boundary = regions.polygon_cover(ring, [], 3)
        assert not (set(interior.tolist()) & set(boundary.tolist()))
        filled = set(regions.polyfill(ring, [], 3).tolist())
        assert filled <= (set(interior.tolist()) | set(boundary.tolist()))
        # interior cells must be fully inside: all vertices above 82
        blat, _ = fk.h3_to_geo_boundary(interior)
        assert np.nanmin(blat) > 82.0

    def test_non_polar_rings_unaffected(self):
        """The polar branch must not fire for ordinary polygons: SF
        golden count is unchanged."""
        from h3_rs_spark.h3core import regions
        from h3_rs_spark.sources.datagen import SF_EXTERIOR

        assert regions.polyfill(SF_EXTERIOR, [], 9).shape[0] == 1253


class TestUnidirectionalEdges:
    """§2.8 uni-edge surface (h3-sys/src/ffi.rs:251-273 — the reference
    never wrapped these, so the contract is the public H3 semantics:
    round-trips, counts, validity, shared-boundary geometry). Edge
    numbering is this kernel's own deterministic convention
    (documented in h3core/edges.py)."""

    def _cells(self):
        from h3_rs_spark.h3core.constants import PENTAGON_BASE_CELLS
        from h3_rs_spark.h3core import indexing

        hexes = np.array(
            [0x8928308280FFFFF, 0x89283082803FFFF], dtype=np.int64
        )
        digits = np.full((1, 15), 7, dtype=np.int64)
        digits[:, :9] = 0
        pent = indexing.from_components(
            PENTAGON_BASE_CELLS[:1].astype(np.int64), 9, digits
        )
        return np.concatenate([hexes, pent])

    def test_counts_and_roundtrip(self):
        from h3_rs_spark.h3core import edges as ed

        cells = self._cells()
        owner, es = ed.edges_from_cells(cells)
        counts = np.bincount(owner, minlength=len(cells))
        assert counts.tolist() == [6, 6, 5]  # pentagon has 5 edges
        # every edge is valid, round-trips its origin, and reaches a
        # real neighbor of the origin
        assert ed.edge_is_valid(es).all()
        assert (ed.edge_origin(es) == cells[owner]).all()
        dests = ed.edge_destination(es)
        from h3_rs_spark.h3core import traversal

        for i, c in enumerate(cells):
            _, nbs = traversal.neighbors(np.array([c], dtype=np.int64))
            got = set(dests[owner == i].tolist())
            assert got == set(nbs.tolist()), i

    def test_edge_from_cells_inverse(self):
        from h3_rs_spark.h3core import edges as ed

        cells = self._cells()
        owner, es = ed.edges_from_cells(cells)
        dests = ed.edge_destination(es)
        rebuilt = ed.edge_from_cells(cells[owner], dests)
        assert (rebuilt == es).all()
        # the two adjacent hexes yield a real edge (ADVICE r4: the
        # `or True` made this vacuous); non-neighbors yield 0 below
        assert ed.edge_from_cells(cells[:1], cells[1:2])[0] != 0
        far = ed.edge_from_cells(
            np.array([0x8928308280FFFFF], dtype=np.int64),
            np.array([int(cells[2])], dtype=np.int64),
        )
        assert far[0] == 0

    def test_empty_and_mismatched_inputs(self):
        # ADVICE r4: empty Arrow batches must not IndexError, and
        # mismatched origin/destination lengths must raise clearly
        from h3_rs_spark.h3core import edges as ed
        from h3_rs_spark.h3core import traversal

        empty = np.empty(0, dtype=np.int64)
        o, d, nb = traversal.directed_neighbors(empty)
        assert o.size == d.size == nb.size == 0
        assert ed.edge_destination(empty).size == 0
        owner, es = ed.edges_from_cells(empty)
        assert owner.size == es.size == 0
        cells = self._cells()
        with pytest.raises(ValueError, match="length mismatch"):
            ed.edge_from_cells(cells[:1], cells)
        from h3_rs_spark.h3core import are_neighbors

        with pytest.raises(ValueError, match="length mismatch"):
            are_neighbors(cells[:2], cells)

    def test_validity_rejects_cells_and_bad_numbers(self):
        from h3_rs_spark.h3core import edges as ed

        cells = self._cells()
        assert not ed.edge_is_valid(cells).any()  # mode 1, not an edge
        # pentagon edge number 6 does not exist
        bad = ed._pack(cells[2:3], np.array([5]))
        assert not ed.edge_is_valid(bad).any()

    def test_boundary_shared_with_destination(self):
        """Every edge-boundary vertex — the two true endpoints AND any
        Class III distortion vertices between them (full H3 semantics
        since r5) — must coincide (1e-9 deg) with a vertex of the
        destination's distortion boundary: the segment is shared, so
        both cells see the same icosa-edge crossing points (each
        computed in its own face frame, hence the tolerance)."""
        from h3_rs_spark.h3core import edges as ed
        from h3_rs_spark.h3core import faceijk as fk

        cells = self._cells()
        owner, es = ed.edges_from_cells(cells)
        lat, lng = ed.edge_boundary(es)
        dests = ed.edge_destination(es)
        dlat, dlng = fk.h3_to_geo_boundary(dests, distortion=True)
        n_verts = 0
        for i in range(es.shape[0]):
            for v in range(lat.shape[1]):
                if np.isnan(lat[i, v]):
                    continue
                n_verts += 1
                d = np.nanmin(
                    np.hypot(
                        dlat[i] - lat[i, v],
                        (dlng[i] - lng[i, v])
                        * np.cos(np.radians(lat[i, v])),
                    )
                )
                assert d < 1e-9, (i, v, d)
        # the res-9 pentagon sits on an icosa vertex: its edges carry
        # distortion vertices, so the total must exceed 2 per edge
        assert n_verts > 2 * es.shape[0], n_verts

    def test_spark_surface(self, spark):
        """UDF + JVM-native exposure: edges explode per cell, origin
        recovered by pure bit math, destination/boundary via UDFs."""
        import pandas as pd
        from pyspark.sql import functions as F

        from h3_rs_spark.functions.native import (
            edge_number_col, edge_origin_col,
        )
        from h3_rs_spark.functions.udfs import (
            edge_destination_udf, edges_from_cell_udf,
        )

        cells = self._cells()
        df = spark.createDataFrame(
            pd.DataFrame({"cell": cells.tolist()})
        )
        out = (
            df.withColumn("edge", F.explode(edges_from_cell_udf()("cell")))
            .withColumn("origin", edge_origin_col("edge"))
            .withColumn("num", edge_number_col("edge"))
            .withColumn("dest", edge_destination_udf()("edge"))
            .collect()
        )
        assert len(out) == 17  # 6 + 6 + 5
        for r in out:
            assert r["origin"] == r["cell"]
            assert 1 <= r["num"] <= 6
            assert r["dest"] != 0 and r["dest"] != r["cell"]


class TestSysOnlyCompleteness:
    def test_km_variants(self):
        # §2.8 edgeLengthKm / hexAreaKm2 (ffi.rs:171-178): Z1 golden
        # in km units (resolution.rs:107-109 / 1000)
        assert abs(h3.edge_length_km(1) - 418.6760055) < 1e-7
        assert abs(h3.hex_area_km2(1) - 607221.0) / 607221.0 < 1e-6

    def test_are_neighbors(self):
        # §2.8 h3IndexesAreNeighbors (ffi.rs:251)
        a = np.array([0x8928308280FFFFF], dtype=np.int64)
        _, ring1 = h3.hex_ring(a, 1)
        _, ring2 = h3.hex_ring(a, 2)
        assert h3.are_neighbors(np.repeat(a, len(ring1)), ring1).all()
        assert not h3.are_neighbors(np.repeat(a, len(ring2)), ring2).any()
        assert not h3.are_neighbors(a, a).any()  # self is not a neighbor
