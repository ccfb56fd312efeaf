"""Derived lookup tables for the H3 kernel.

The tables are derived *numerically* from the public spec constants in
constants.py by tools/generate_tables.py (which writes _tables_gen.py):

  FACE_IJK_BASE_CELLS[face, i, j, k] -> base cell owning that res-0 coord
  FACE_IJK_BASE_CELL_ROT[face, i, j, k] -> ccw 60-degree rotations between
      that face's coordinate system and the base cell's home system
  FACE_NEIGHBORS_{FACE,ROT,TRANSLATE}[face, quadrant] -> icosahedron face
      adjacency transforms (quadrants: 0 central, 1 IJ, 2 KI, 3 JK)
  PENT_CW_OFFSET[base_cell, face] -> pentagon child grid is clockwise
      offset on that face

Derivation method (no hand-copied tables): res-0 cell centers are matched
geometrically across faces, rotations are solved by exhaustive search for
the unique value making encode(decode(cell)) == cell over all children of
every base cell, and face transforms are solved as exact lattice
isometries from point correspondences. See tools/generate_tables.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Tables:
    FACE_IJK_BASE_CELLS: np.ndarray       # (20,3,3,3) int64
    FACE_IJK_BASE_CELL_ROT: np.ndarray    # (20,3,3,3) int64
    FACE_NEIGHBORS_FACE: np.ndarray       # (20,4) int64
    FACE_NEIGHBORS_ROT: np.ndarray        # (20,4) int64
    FACE_NEIGHBORS_TRANSLATE: np.ndarray  # (20,4,3) int64
    PENT_CW_OFFSET: np.ndarray            # (122,20) bool


_TABLES: Tables | None = None


def set_tables(t: Tables) -> None:
    """Install tables (used by the derivation tool while bootstrapping)."""
    global _TABLES
    _TABLES = t


def get_tables() -> Tables:
    global _TABLES
    if _TABLES is None:
        from . import _tables_gen as g

        _TABLES = Tables(
            FACE_IJK_BASE_CELLS=np.array(g.FACE_IJK_BASE_CELLS, dtype=np.int64),
            FACE_IJK_BASE_CELL_ROT=np.array(g.FACE_IJK_BASE_CELL_ROT, dtype=np.int64),
            FACE_NEIGHBORS_FACE=np.array(g.FACE_NEIGHBORS_FACE, dtype=np.int64),
            FACE_NEIGHBORS_ROT=np.array(g.FACE_NEIGHBORS_ROT, dtype=np.int64),
            FACE_NEIGHBORS_TRANSLATE=np.array(
                g.FACE_NEIGHBORS_TRANSLATE, dtype=np.int64
            ),
            PENT_CW_OFFSET=np.array(g.PENT_CW_OFFSET, dtype=bool),
        )
    return _TABLES
