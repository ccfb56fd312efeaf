"""Derive the H3 lookup tables numerically and write h3core/_tables_gen.py.

Everything is derived from the public spec constants (face geometry +
base cell homes) in h3core/constants.py:

1. Res-0 cell centers of all 122 base cells (home-face projection).
2. Icosahedron face-neighbor transforms: for each face and quadrant, the
   neighbor face is found geometrically and the (ccw-rotation, translate)
   lattice isometry is solved exactly from cell-center correspondences.
3. FACE_IJK_BASE_CELLS: every res-0 face coordinate is matched to the
   nearest base-cell center (with a separation-ratio assertion).
4. Orientation rotations + pentagon cw offsets: exhaustive search for the
   unique values making encode(decode(cell)) == cell for all res-4
   children of every base cell (res-5/6 top-up for sliver coverage).
5. Global round-trip validation over random points at several
   resolutions before the file is written.

Run: python tools/generate_tables.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from h3_rs_spark.h3core import constants as C  # noqa: E402
from h3_rs_spark.h3core import coordijk as cj  # noqa: E402
from h3_rs_spark.h3core import geom  # noqa: E402
from h3_rs_spark.h3core import indexing as ix  # noqa: E402
from h3_rs_spark.h3core.tables import Tables, set_tables  # noqa: E402

R_CCW_AXIAL = np.array([[1, -1], [1, 0]], dtype=np.int64)


def axial(ijk):
    return np.stack(
        [ijk[..., 0] - ijk[..., 2], ijk[..., 1] - ijk[..., 2]], axis=-1
    )


def axial_to_ijk(ax):
    a, b = ax[..., 0], ax[..., 1]
    z = np.zeros_like(a)
    ijk = np.stack([a, b, z], axis=-1)
    return cj.ijk_normalize(ijk)


def forced_face_hex2d(lat, lng, face, res):
    """geo -> hex2d on a *given* face (not nearest-face)."""
    flat = C.FACE_CENTER_GEO[face, 0]
    flng = C.FACE_CENTER_GEO[face, 1]
    xyz = geom.geo_to_xyz(lat, lng)
    fxyz = geom.face_center_xyz()[face]
    dot = np.clip((xyz * fxyz).sum(axis=-1), -1.0, 1.0)
    r = np.arccos(dot)
    az = geom.geo_azimuth(flat, flng, lat, lng)
    theta = geom.pos_angle(C.FACE_AXES_AZ_RADS_CII[face, 0] - geom.pos_angle(az))
    if res % 2 == 1:
        theta = geom.pos_angle(theta - C.M_AP7_ROT_RADS)
    rt = np.tan(r) / C.RES0_U_GNOMONIC * C.M_SQRT7 ** res
    v = np.stack([rt * np.cos(theta), rt * np.sin(theta)], axis=-1)
    return np.where((r < C.EPSILON)[..., None], 0.0, v)


def base_cell_centers():
    """(lat, lng) radians of each base cell center via its home face."""
    v = cj.ijk_to_hex2d(C.BASE_CELL_IJK)
    return geom.hex2d_to_geo(v, C.BASE_CELL_FACE, 0, substrate=False)


def derive_face_neighbors():
    # res-0 hex2d positions of the icosahedron face-triangle vertices
    verts = np.array(
        [[2.0, 0.0], [-1.0, np.sqrt(3.0)], [-1.0, -np.sqrt(3.0)]]
    )  # i, j, k axis vertices
    edges = {1: (0, 1), 2: (2, 0), 3: (1, 2)}  # Q_IJ, Q_KI, Q_JK

    nb_face = np.zeros((20, 4), dtype=np.int64)
    nb_rot = np.zeros((20, 4), dtype=np.int64)
    nb_trans = np.zeros((20, 4, 3), dtype=np.int64)
    nb_face[:, 0] = np.arange(20)

    work_res = 2  # Class II, maxDim 14, unitScale 7
    for f in range(20):
        for q, (a, b) in edges.items():
            va, vb = verts[a], verts[b]
            mid = (va + vb) / 2.0
            plat, plng = geom.hex2d_to_geo(
                (mid * 1.2)[None, :], np.array([f]), 0, substrate=False
            )
            g, _ = geom.nearest_face(plat, plng)
            g = int(g[0])
            assert g != f, (f, q)

            # sample overage cells: points just past the edge (distortion
            # between the two gnomonic frames grows with distance past the
            # edge, so stay close and majority-vote below)
            samples_f, samples_g = [], []
            for t in np.linspace(0.1, 0.9, 17):
                for d in (1.02, 1.05, 1.08):
                    p = ((1 - t) * va + t * vb) * d
                    plat, plng = geom.hex2d_to_geo(
                        p[None, :], np.array([f]), 0, substrate=False
                    )
                    gf, _ = geom.nearest_face(plat, plng)
                    if int(gf[0]) != g:
                        continue
                    v_g = forced_face_hex2d(plat, plng, np.array([g]), work_res)
                    c_g = cj.hex2d_to_ijk(v_g)
                    # cell center in g's frame (canonical position)
                    clat, clng = geom.hex2d_to_geo(
                        cj.ijk_to_hex2d(c_g), np.array([g]), work_res, substrate=False
                    )
                    v_f = forced_face_hex2d(clat, clng, np.array([f]), work_res)
                    c_f = cj.hex2d_to_ijk(v_f)
                    if c_f.sum() <= C.MAX_DIM_BY_CII_RES[work_res]:
                        continue  # not actually in the overage region
                    samples_f.append(c_f[0])
                    samples_g.append(c_g[0])
            assert len(samples_f) >= 5, (f, q, len(samples_f))
            ax_f = axial(np.array(samples_f))
            ax_g = axial(np.array(samples_g))

            # majority vote: each sample proposes (rot, translate); the
            # exact lattice isometry wins with a clear majority
            votes = {}
            scale = int(C.UNIT_SCALE_BY_CII_RES[work_res])
            for rot in range(6):
                R = np.linalg.matrix_power(R_CCW_AXIAL, rot) if rot else np.eye(
                    2, dtype=np.int64
                )
                diff = ax_g - ax_f @ R.T
                for row in diff:
                    if (row % scale != 0).any():
                        continue
                    t_ijk = axial_to_ijk((row // scale)[None, :])[0]
                    if t_ijk.max() > 2 or t_ijk.min() < 0:
                        continue
                    key = (rot, tuple(int(x) for x in t_ijk))
                    votes[key] = votes.get(key, 0) + 1
            assert votes, (f, q)
            ranked = sorted(votes.items(), key=lambda kv: -kv[1])
            top_key, top_n = ranked[0]
            second_n = ranked[1][1] if len(ranked) > 1 else 0
            assert top_n >= max(5, 3 * second_n), (f, q, ranked[:3])
            solved = (top_key[0], np.array(top_key[1], dtype=np.int64))
            nb_face[f, q] = g
            nb_rot[f, q] = solved[0]
            nb_trans[f, q] = solved[1]
    return nb_face, nb_rot, nb_trans


def derive_base_cell_assignment(bc_lat, bc_lng):
    bc_xyz = geom.geo_to_xyz(bc_lat, bc_lng)  # (122, 3)
    cells = np.zeros((20, 3, 3, 3), dtype=np.int64)
    worst_ratio = 0.0
    for f in range(20):
        coords = []
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    coords.append((i, j, k))
        coords = np.array(coords, dtype=np.int64)
        norm = cj.ijk_normalize(coords)
        lat, lng = geom.hex2d_to_geo(
            cj.ijk_to_hex2d(norm), np.full(len(norm), f), 0, substrate=False
        )
        xyz = geom.geo_to_xyz(lat, lng)
        dots = xyz @ bc_xyz.T  # (27, 122)
        order = np.argsort(-dots, axis=1)
        best = order[:, 0]
        d_best = np.arccos(np.clip(dots[np.arange(27), best], -1, 1))
        d_second = np.arccos(
            np.clip(dots[np.arange(27), order[:, 1]], -1, 1)
        )
        ratio = np.max(d_best / np.maximum(d_second, 1e-12))
        worst_ratio = max(worst_ratio, float(ratio))
        for (i, j, k), b in zip(coords, best):
            cells[f, i, j, k] = b
    print(f"base-cell assignment worst nearest/second ratio: {worst_ratio:.4f}")
    assert worst_ratio < 0.6, worst_ratio
    return cells


def derive_rotations(cells_tab, nb_face, nb_rot, nb_trans):
    """Search rotations + pentagon cw offsets by round-trip consistency."""
    # install partial tables so decode works
    rot_tab = np.zeros((20, 3, 3, 3), dtype=np.int64)
    pent_cw = np.zeros((122, 20), dtype=bool)
    set_tables(
        Tables(cells_tab, rot_tab, nb_face, nb_rot, nb_trans, pent_cw)
    )
    from h3_rs_spark.h3core import faceijk as fk

    solved = {}  # (face, bc) -> rot
    solved_flip = {}  # (face, bc) -> bool (cw offset)

    def consume(res):
        need = _needed_pairs(cells_tab, solved)
        bcs = sorted({b for _, b in need})
        if not bcs:
            return
        hs = []
        canon = []
        for b in bcs:
            h0 = int(ix.from_components(np.array([b]), 0, np.full((1, 15), 7))[0])
            ch = ix.to_children(h0, res)
            hs.append(ch)
        hs = np.concatenate(hs)
        lat_d, lng_d = fk.h3_to_geo(hs)
        lat = np.radians(lat_d)
        lng = np.radians(lng_d)
        face, v = geom.geo_to_hex2d(lat, lng, res)
        ijk = cj.hex2d_to_ijk(v)
        digits_f, cur = fk._extract_digits(ijk, res)
        ok = (cur <= 2).all(axis=1)
        canon_digits = ix.get_digits(hs)
        bc_arr = ix.get_base_cell(hs)
        res_arr = np.full(hs.shape[0], res, dtype=np.int64)
        pent_arr = C.BASE_CELL_IS_PENTAGON[bc_arr]

        # candidate transforms: (flip, rot) -> transformed digits
        lead = ix.leading_nonzero_digit(digits_f, res_arr)
        variants = {}
        for flip in (None, "cw", "ccw"):
            d = digits_f
            if flip is not None:
                adj = pent_arr & (lead == 1)
                d_rot = (
                    ix.rotate60_cw_digits(digits_f, res_arr)
                    if flip == "cw"
                    else ix.rotate60_ccw_digits(digits_f, res_arr)
                )
                d = np.where(adj[:, None], d_rot, digits_f)
            for rot in range(6):
                dd = d
                for _ in range(rot):
                    dh = ix.rotate60_ccw_digits(dd, res_arr)
                    dp = ix.rotate_pent60_ccw_digits(dd, res_arr)
                    dd = np.where(pent_arr[:, None], dp, dh)
                # compare only digits 1..res (beyond res: extracted pads
                # with 0, canonical indexes pad with 7)
                variants[(flip, rot)] = (
                    dd[:, :res] == canon_digits[:, :res]
                ).all(axis=1)

        # group by (face, bc)
        import collections

        groups = collections.defaultdict(list)
        for idx in np.flatnonzero(ok):
            groups[(int(face[idx]), int(bc_arr[idx]))].append(idx)
        for (f, b), idxs in groups.items():
            if (f, b) in solved or (f, b) not in need:
                continue
            idxs = np.array(idxs)
            is_pent = bool(C.BASE_CELL_IS_PENTAGON[b])
            flips = ("cw", "ccw") if is_pent else (None,)
            matches = []
            for flip in flips:
                for rot in range(6):
                    if variants[(flip, rot)][idxs].all():
                        matches.append((flip, rot))
            if is_pent:
                # leading-K samples pin the flip; others accept either
                has_k = (
                    ix.leading_nonzero_digit(digits_f[idxs], res_arr[idxs]) == 1
                ).any()
                if not has_k:
                    matches = sorted({(None, r) for _, r in matches})
                # pentagon digit rotation has period 5: rot 5 == rot 0
                rots = {r for _, r in matches}
                if rots == {0, 5}:
                    matches = [m for m in matches if m[1] == 0]
            if len({r for _, r in matches}) == 1:
                flip, rot = matches[0]
                solved[(f, b)] = rot
                if is_pent and flip is not None:
                    solved_flip[(f, b)] = flip == "cw"

    def _needed_pairs(tab, done):
        need = set()
        for f in range(20):
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        if min(i, j, k) != 0:
                            continue
                        b = int(tab[f, i, j, k])
                        if (f, b) not in done:
                            need.add((f, b))
        return need

    for res in (3, 4, 5):
        consume(res)
        missing = _needed_pairs(cells_tab, solved)
        print(f"after res {res}: {len(missing)} (face, base-cell) pairs unsolved")
        if not missing:
            break
    missing = _needed_pairs(cells_tab, solved)
    if missing:
        # remaining pairs should be unreachable cube entries: coords whose
        # cells don't overlap the face triangle (points always encode via
        # their nearest face). Verify empirically with dense random
        # sampling, then leave their rotation at 0 (never used).
        rng = np.random.default_rng(11)
        n = 2_000_000
        lat = np.arcsin(rng.uniform(-1, 1, n))
        lng = rng.uniform(-np.pi, np.pi, n)
        hit = set()
        from h3_rs_spark.h3core import faceijk as fk2

        for res in (1, 2, 3, 4, 9, 15):
            face, v = geom.geo_to_hex2d(lat, lng, res)
            ijk = cj.hex2d_to_ijk(v)
            _, cur = fk2._extract_digits(ijk, res)
            okm = (cur <= 2).all(axis=1)
            bcs_hit = cells_tab[
                face[okm], cur[okm, 0], cur[okm, 1], cur[okm, 2]
            ]
            for f, b in zip(face[okm].tolist(), bcs_hit.tolist()):
                hit.add((f, b))
        reachable_missing = missing & hit
        assert not reachable_missing, f"reachable but unsolved: {reachable_missing}"
        print(
            f"{len(missing)} unreachable (face, base-cell) pairs left at rot 0 "
            f"(verified unreachable over {6 * n / 1e6:.0f}M encodes)"
        )

    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    b = int(cells_tab[f, i, j, k])
                    rot_tab[f, i, j, k] = solved.get((f, b), 0)
    for (f, b), is_cw in solved_flip.items():
        pent_cw[b, f] = is_cw
    return rot_tab, pent_cw


def validate(tables):
    set_tables(tables)
    from h3_rs_spark.h3core import faceijk as fk

    rng = np.random.default_rng(7)
    n = 50_000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    for res in (0, 1, 2, 5, 9, 15):
        h = fk.geo_to_h3(lat, lng, res)
        assert (h != 0).all(), res
        assert ix.is_valid(h).all(), res
        clat, clng = fk.h3_to_geo(h)
        h2 = fk.geo_to_h3(clat, clng, res)
        bad = h2 != h
        assert not bad.any(), (res, int(bad.sum()), h[bad][:5])
        # every point's cell center must be within one cell radius
        d = geom.haversine_m(
            np.radians(lat), np.radians(lng), np.radians(clat), np.radians(clng)
        )
        assert d.max() < 2.2 * C.EDGE_LENGTH_M[res], (res, d.max())
    print("round-trip validation passed (300k point-res checks)")


def main():
    bc_lat, bc_lng = base_cell_centers()
    order_ok = (np.diff(bc_lat) <= 1e-12).all()
    print(f"base cells sorted north->south: {bool(order_ok)}")
    if not order_ok:
        bad = np.flatnonzero(np.diff(bc_lat) > 1e-12)
        print("  ordering violations at base cells:", bad[:20])

    nb_face, nb_rot, nb_trans = derive_face_neighbors()
    cells_tab = derive_base_cell_assignment(bc_lat, bc_lng)

    # home coordinates must map to themselves
    for b in range(122):
        f = int(C.BASE_CELL_FACE[b])
        i, j, k = (int(x) for x in C.BASE_CELL_IJK[b])
        assert cells_tab[f, i, j, k] == b, (b, cells_tab[f, i, j, k])

    rot_tab, pent_cw = derive_rotations(cells_tab, nb_face, nb_rot, nb_trans)
    tables = Tables(cells_tab, rot_tab, nb_face, nb_rot, nb_trans, pent_cw)
    validate(tables)

    # compare derived pentagon offsets against the spec's published pairs
    for b in np.flatnonzero(C.BASE_CELL_IS_PENTAGON):
        derived = set(np.flatnonzero(pent_cw[b]))
        spec = {int(x) for x in C.BASE_CELL_CW_OFFSET[b] if x >= 0}
        flag = "OK" if derived == spec else "MISMATCH (derived wins)"
        print(f"pentagon {b}: cw-offset faces derived={sorted(derived)} "
              f"spec-recalled={sorted(spec)} {flag}")

    out = Path(__file__).resolve().parents[1] / "h3_rs_spark/h3core/_tables_gen.py"
    with out.open("w") as fh:
        fh.write(
            '"""Auto-generated by tools/generate_tables.py — do not edit.\n\n'
            "Derived numerically from the public H3 spec constants in\n"
            "constants.py; see tools/generate_tables.py for the method.\n"
            '"""\n\n'
        )
        fh.write(f"FACE_IJK_BASE_CELLS = {cells_tab.tolist()!r}\n\n")
        fh.write(f"FACE_IJK_BASE_CELL_ROT = {rot_tab.tolist()!r}\n\n")
        fh.write(f"FACE_NEIGHBORS_FACE = {nb_face.tolist()!r}\n\n")
        fh.write(f"FACE_NEIGHBORS_ROT = {nb_rot.tolist()!r}\n\n")
        fh.write(f"FACE_NEIGHBORS_TRANSLATE = {nb_trans.tolist()!r}\n\n")
        fh.write(f"PENT_CW_OFFSET = {pent_cw.tolist()!r}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
