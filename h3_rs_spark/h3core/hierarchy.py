"""Hierarchy ops: parent / children / compact / uncompact (exact sets).

Parity targets: /root/reference/src/hierarchy.rs tests (children counts,
SF polygon compact 209 / uncompact 1253). Unlike the reference (which
returns zero-padded buffers from the C FFI, src/hierarchy.rs:102), these
return exact minimal sets.

`compact` here is the in-memory kernel used inside UDFs for per-polygon
cell sets; the distributed relational variant for huge sets lives in
operators/ (groupBy-parent loop).
"""

from __future__ import annotations

import numpy as np

from .constants import BASE_CELL_IS_PENTAGON, MAX_RES
from . import indexing as ix


def to_parent(h, parent_res) -> np.ndarray:
    return ix.to_parent(h, parent_res)


def to_children(h, child_res: int) -> np.ndarray:
    return ix.to_children(h, child_res)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a multi-resolution set to uniform resolution `res`."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.int64))
    rs = ix.get_resolution(cells)
    if (rs > res).any():
        raise ValueError("uncompact: input cell finer than target res")
    out = [cells[rs == res]]
    for c in cells[rs < res]:
        out.append(ix.to_children(int(c), res))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def compact(cells: np.ndarray) -> np.ndarray:
    """Minimal multi-resolution covering set (all inputs same res).

    Vectorized sweep from finest to coarsest: a parent replaces its
    children when all 7 (6 for pentagons) are present.
    """
    cells = np.unique(np.atleast_1d(np.asarray(cells, dtype=np.int64)))
    if cells.size == 0:
        return cells
    res = ix.get_resolution(cells)
    if np.unique(res).size > 1:
        raise ValueError("compact: mixed input resolutions")
    r = int(res[0])

    result = []
    cur = cells
    while r > 0 and cur.size:
        parents = ix.to_parent(cur, r - 1)
        uniq, counts = np.unique(parents, return_counts=True)
        bc = ix.get_base_cell(uniq)
        pent = BASE_CELL_IS_PENTAGON[bc] & (
            ix.leading_nonzero_digit(ix.get_digits(uniq), ix.get_resolution(uniq))
            == 0
        )
        full = counts == np.where(pent, 6, 7)
        promoted = uniq[full]
        # cells whose parent was not promoted stay in the result
        promoted_set = np.isin(parents, promoted, assume_unique=False)
        result.append(cur[~promoted_set])
        cur = promoted
        r -= 1
    if cur.size:
        result.append(cur)
    return np.sort(np.concatenate(result)) if result else cells
