"""Vectorized IJK hex-lattice coordinate math (H3 v3.6 semantics).

From-scratch numpy implementation of the cube-coordinate hex lattice used
by H3: normalization, aperture-7 / aperture-3 up/down sampling, 60-degree
rotations, digit <-> unit-vector mapping, and planar (hex2d) conversion
with exact H3 rounding.  All functions take/return int64 arrays of shape
(..., 3) and are branch-free (np.where) so they vectorize over batches.

Semantics parity targets are the reference crate's traversal/hierarchy
tests (/root/reference/src/traversal.rs, src/hierarchy.rs) — the
algorithms themselves are the published H3 grid math, re-derived here.
"""

from __future__ import annotations

import numpy as np

from .constants import M_SIN60

# digit (0..6) -> ijk unit vector; 7 = invalid
UNIT_VECS = np.array(
    [
        [0, 0, 0],  # 0 center
        [0, 0, 1],  # 1 K
        [0, 1, 0],  # 2 J
        [0, 1, 1],  # 3 JK
        [1, 0, 0],  # 4 I
        [1, 0, 1],  # 5 IK
        [1, 1, 0],  # 6 IJ
    ],
    dtype=np.int64,
)

# digit rotation permutations (index = digit)
ROTATE60_CCW_DIGIT = np.array([0, 5, 3, 1, 6, 4, 2, 7], dtype=np.int64)
ROTATE60_CW_DIGIT = np.array([0, 3, 6, 2, 5, 1, 4, 7], dtype=np.int64)

# axial (i-k, j-k) -> digit lookup for unit vectors.
# axial of UNIT_VECS: 0:(0,0) 1:(-1,-1) 2:(0,1) 3:(-1,0) 4:(1,0) 5:(0,-1) 6:(1,1)
_AXIAL_TO_DIGIT = np.full((3, 3), 7, dtype=np.int64)
for _d, (_i, _j, _k) in enumerate(UNIT_VECS):
    _AXIAL_TO_DIGIT[_i - _k + 1, _j - _k + 1] = _d


def ijk_normalize(ijk: np.ndarray) -> np.ndarray:
    """Normalize so min(i,j,k) == 0 (cube coords are redundant by +(1,1,1))."""
    # pairwise minimum over column views beats a strided axis-reduce
    m = np.minimum(np.minimum(ijk[..., 0], ijk[..., 1]), ijk[..., 2])
    return ijk - m[..., None]


_AXIAL_TO_DIGIT_FLAT = _AXIAL_TO_DIGIT.ravel().copy()


def ijk_to_digit(ijk: np.ndarray) -> np.ndarray:
    """Unit-vector ijk (normalized) -> digit 0..6, else 7."""
    a = ijk[..., 0] - ijk[..., 2]
    b = ijk[..., 1] - ijk[..., 2]
    idx = a * 3 + b + 4
    # non-unit vectors land outside [0, 8]; map them to the invalid slot
    bad = (idx < 0) | (idx > 8)
    if bad.any():
        out = np.where(bad, 7, _AXIAL_TO_DIGIT_FLAT[np.where(bad, 0, idx)])
        return out
    return _AXIAL_TO_DIGIT_FLAT[idx]


def _lin(ijk: np.ndarray, ivec, jvec, kvec) -> np.ndarray:
    # column-wise integer combination with inline normalize (hot path of
    # decode/traversal; avoids broadcast temporaries and axis reduces)
    i = ijk[..., 0]
    j = ijk[..., 1]
    k = ijk[..., 2]
    c0 = i * ivec[0] + j * jvec[0] + k * kvec[0]
    c1 = i * ivec[1] + j * jvec[1] + k * kvec[1]
    c2 = i * ivec[2] + j * jvec[2] + k * kvec[2]
    m = np.minimum(np.minimum(c0, c1), c2)
    return np.stack([c0 - m, c1 - m, c2 - m], axis=-1)


def down_ap7(ijk):  # res -> res+1, Class III (counter-clockwise)
    return _lin(ijk, (3, 0, 1), (1, 3, 0), (0, 1, 3))


def down_ap7r(ijk):  # res -> res+1, Class II (clockwise)
    return _lin(ijk, (3, 1, 0), (0, 3, 1), (1, 0, 3))


def down_ap3(ijk):
    return _lin(ijk, (2, 0, 1), (1, 2, 0), (0, 1, 2))


def down_ap3r(ijk):
    return _lin(ijk, (2, 1, 0), (0, 2, 1), (1, 0, 2))


def rotate60_ccw(ijk):
    return _lin(ijk, (1, 1, 0), (0, 1, 1), (1, 0, 1))


def rotate60_cw(ijk):
    return _lin(ijk, (1, 0, 1), (1, 1, 0), (0, 1, 1))


def _round_half_even_div7(x: np.ndarray) -> np.ndarray:
    # round(x/7) for integer x: x/7 never lands exactly on .5 (denominator
    # 7), so round-to-nearest == floor((2x+7)/14) — one fused floordiv
    return (2 * x + 7) // 14


def up_ap7(ijk: np.ndarray) -> np.ndarray:
    """Parent coordinate in the Class III (ccw) aperture-7 grid."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    ni = _round_half_even_div7(3 * i - j)
    nj = _round_half_even_div7(i + 2 * j)
    out = np.stack([ni, nj, np.zeros_like(ni)], axis=-1)
    return ijk_normalize(out)


def up_ap7r(ijk: np.ndarray) -> np.ndarray:
    """Parent coordinate in the Class II (cw) aperture-7 grid."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    ni = _round_half_even_div7(2 * i + j)
    nj = _round_half_even_div7(3 * j - i)
    out = np.stack([ni, nj, np.zeros_like(ni)], axis=-1)
    return ijk_normalize(out)


def ijk_to_hex2d(ijk: np.ndarray) -> np.ndarray:
    """IJK -> planar 2D (x along i-axis, +120deg j-axis)."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    x = i - 0.5 * j
    y = j * M_SIN60
    return np.stack([x, y], axis=-1)


def hex2d_to_ijk(v: np.ndarray) -> np.ndarray:
    """Planar 2D -> containing hex cell IJK (H3's exact rounding rules)."""
    x = v[..., 0]
    y = v[..., 1]
    a1 = np.abs(x)
    a2 = np.abs(y)

    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0

    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    # branch tree from H3 _hex2dToCoordIJK, vectorized
    i = np.empty_like(m1)
    j = np.empty_like(m2)

    c_a = r1 < 0.5
    c_b = r1 < 1.0 / 3.0
    # r1 < 1/3
    i_1 = m1
    j_1 = np.where(r2 < (1.0 + r1) / 2.0, m2, m2 + 1)
    # 1/3 <= r1 < 0.5
    j_2 = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_2 = np.where(((1.0 - r1) <= r2) & (r2 < 2.0 * r1), m1 + 1, m1)
    # 0.5 <= r1 < 2/3
    c_c = r1 < 2.0 / 3.0
    j_3 = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_3 = np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1), m1, m1 + 1)
    # r1 >= 2/3
    i_4 = m1 + 1
    j_4 = np.where(r2 < r1 / 2.0, m2, m2 + 1)

    i = np.where(c_a, np.where(c_b, i_1, i_2), np.where(c_c, i_3, i_4))
    j = np.where(c_a, np.where(c_b, j_1, j_2), np.where(c_c, j_3, j_4))

    # fold across axes for negative x / y
    neg_x = x < 0.0
    j_even = (j % 2) == 0
    axis_i = np.where(j_even, j // 2, (j + 1) // 2)
    diff = i - axis_i
    i_folded = np.where(j_even, i - 2 * diff, i - (2 * diff + 1))
    i = np.where(neg_x, i_folded, i)

    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)

    out = np.stack([i, j, np.zeros_like(i)], axis=-1)
    return ijk_normalize(out)
