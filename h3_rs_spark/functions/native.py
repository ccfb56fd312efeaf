"""Pure-JVM column expressions (no Python worker round-trip).

Everything here stays inside WholeStageCodegen: bit ops for index
inspection/parent (SURVEY.md §2.3/§2.5 — H1/N4/N5/N7 need no UDF),
haversine re-ranking for kNN (§2.9), and the hex string codec.
Keeping these native is a core scale decision: at 10^12 rows the
per-row ops must not cross the JVM->Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h3_resolution(cell: Column | str) -> Column:
    """(cell >> 52) & 0xF — parity: /root/reference/src/inspection.rs:52-54."""
    return F.shiftright(F.col(cell) if isinstance(cell, str) else cell, 52).bitwiseAND(
        F.lit(0xF)
    )


def h3_base_cell(cell: Column | str) -> Column:
    """(cell >> 45) & 0x7F — parity: src/inspection.rs:47-49."""
    return F.shiftright(F.col(cell) if isinstance(cell, str) else cell, 45).bitwiseAND(
        F.lit(0x7F)
    )


def is_res_class3_col(cell: Column | str) -> Column:
    """Odd resolution — parity: src/inspection.rs:42-44."""
    return h3_resolution(cell) % 2 == 1


def h3_to_parent_col(cell: Column | str, parent_res: int) -> Column:
    """Ancestor at `parent_res` as pure bit math (src/hierarchy.rs:30-32).

    Sets the res nibble and fills digits below parent_res with 7s —
    runs fully inside codegen, which makes multi-resolution prefix joins
    (compacted PIP join) shuffle-free JVM work.
    """
    c = F.col(cell) if isinstance(cell, str) else cell
    fill = (1 << (3 * (15 - parent_res))) - 1
    res_cleared = c.bitwiseAND(F.lit(~(0xF << 52)))
    return res_cleared.bitwiseOR(F.lit(parent_res << 52)).bitwiseOR(F.lit(fill))


def h3_to_parent_sql(cell_expr: str, parent_res: int) -> str:
    """SQL-text twin of h3_to_parent_col (r7 driver-latency work): the
    same bit math as one string, for call sites that build plans in
    selectExpr/expr form to avoid py4j round-trips. Parity pinned by
    tests/test_functions.py::test_h3_to_parent_sql_parity."""
    fill = (1 << (3 * (15 - parent_res))) - 1
    return (
        f"((({cell_expr} & {~(0xF << 52)}) | {parent_res << 52})"
        f" | {fill})"
    )


def edge_origin_col(edge: Column | str) -> Column:
    """Unidirectional edge -> origin cell as pure bit math (clear mode
    + edge-number bits, set cell mode) — §2.8 surface, edges.py layout
    (mode bits 59-62, edge number bits 56-58)."""
    e = F.col(edge) if isinstance(edge, str) else edge
    cleared = e.bitwiseAND(F.lit(~(0xF << 59))).bitwiseAND(
        F.lit(~(0x7 << 56))
    )
    return cleared.bitwiseOR(F.lit(1 << 59))


def edge_number_col(edge: Column | str) -> Column:
    """Unidirectional edge -> 1-based edge number ((e >> 56) & 7)."""
    e = F.col(edge) if isinstance(edge, str) else edge
    return F.shiftright(e, 56).bitwiseAND(F.lit(0x7))


def cell_to_hex_str(cell: Column | str) -> Column:
    """u64 -> lowercase hex string (src/inspection.rs:81-95 semantics)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.lower(F.conv(c.cast("string"), 10, 16))


def hex_str_to_cell(s: Column | str) -> Column:
    """hex string -> int64 cell (src/inspection.rs:97-102 semantics)."""
    c = F.col(s) if isinstance(s, str) else s
    return F.conv(c, 16, 10).cast("long")


EARTH_RADIUS_M = 6371007.180918475


def haversine_m_col(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle meters, entirely JVM-side trig (kNN re-rank hot path)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))
