"""Distributed hierarchy operators for huge cell relations.

compact_cells_df implements H3 compact as pure relational algebra
(SURVEY.md §2.5 "relational algorithm"): iterate res from finest to
coarsest; groupBy(parent) counts promote complete families (7 children,
6 for pentagons) to their parent. Each round is one hash aggregation +
one join — partial aggregation makes the shuffle proportional to the
number of *parents*, so a 10^12-cell relation compacts in <= 15 rounds
of shrinking shuffles. The in-memory kernel variant (h3core.hierarchy)
is the per-polygon fast path; this is the table-scale path.

uncompact_cells_df is the inverse: children-UDF explode to uniform res.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import h3_base_cell, h3_resolution, h3_to_parent_col
from ..h3core.constants import PENTAGON_BASE_CELLS

_PENT_BCS = [int(b) for b in PENTAGON_BASE_CELLS]


def _is_pentagon_col(cell):
    """Pentagon test as a pure JVM expression: pentagon base cell and all
    digits are 0 (each 3-bit digit up to the cell res equals 0; digits
    beyond res are 7). Equivalent: the cell equals its own base-cell
    'center child' pattern."""
    res = h3_resolution(cell)
    # compare against the base cell's center-child pattern at this res
    # (2^k is exact in doubles for k <= 45, so pow-cast is lossless)
    fill = F.pow(F.lit(2.0), ((F.lit(15) - res) * 3).cast("double")).cast(
        "long"
    ) - 1
    center_pattern = (
        F.lit(1 << 59)
        .bitwiseOR((res.cast("long") * F.lit(1 << 52)))
        .bitwiseOR((h3_base_cell(cell).cast("long") * F.lit(1 << 45)))
        .bitwiseOR(fill)
    )
    return h3_base_cell(cell).isin(_PENT_BCS) & (cell == center_pattern)


# descendants of one cell, `d` levels down: hexagons fan out 7^d; a
# pentagon has 6 children (1 pentagon + 5 hexagons), so
# N_pent(d) = N_pent(d-1) + 5 * 7^(d-1)
_HEX_DESC = [7 ** d for d in range(16)]
_PENT_DESC = [1]
for _d in range(1, 16):
    _PENT_DESC.append(_PENT_DESC[-1] + 5 * 7 ** (_d - 1))


def compact_cells_df(
    cells: DataFrame,
    cell_col: str = "cell",
    res: int | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """Minimal multi-res covering set of a uniform-res cell relation.

    Returns a DataFrame with the same cell_col holding the compacted
    (mixed-res) set. Input must be distinct cells of one resolution.

    Single-pass form (r7, guide §2.4 — replaces the r6 finest-to-
    coarsest round loop, which ran 2 sequential jobs per resolution
    level): because the input is uniform-res, an ancestor A at res p
    is in the transitive-promotion closure iff ALL of its res-r leaf
    descendants are present, i.e. iff count(leaves under A) equals A's
    full descendant count (pentagon-aware _PENT_DESC/_HEX_DESC).
    Completeness is monotone down the tree (a complete ancestor's
    sub-ancestors are complete), so the compact output is exactly:
      - complete ancestors whose own parent is not complete, plus
      - leaves whose res-(r-1) parent is not complete.
    One ancestors-explode + partial-agg'd groupBy (shuffle bounded by
    DISTINCT ancestors — map-side combine collapses the r-way explode
    of spatially clustered cells to ~n/6 rows), one checkpoint of the
    complete set (<= n/6 rows), two anti-joins. A constant number of
    shuffles instead of O(res) sequential rounds; output pinned by the
    reference's own 1253 -> 209 golden (q36) and
    tests/test_operators.py round-trip/idempotence tests.

    res: optional caller-known uniform resolution — skips the one
    derivation job (r7; callers holding a fresh polyfill know it).

    assume_distinct: the contract above already REQUIRES distinct
    input; True additionally skips the defensive distinct() exchange
    (r7) — for callers whose relation is distinct by construction
    (a polyfill output). Passing duplicate rows with True inflates
    the ancestor counts and corrupts the result, so the safe default
    stays False."""
    if res is None:
        res = cells.select(F.max(h3_resolution(cell_col))).first()[0]
    if res is None:
        return cells
    res = int(res)
    if assume_distinct:
        distinct = cells.select(cell_col)
    else:
        distinct = cells.select(cell_col).distinct()
    if res == 0:
        return distinct
    anc = distinct.select(F.explode(ancestors_col(cell_col)).alias("_anc"))
    counts = anc.groupBy("_anc").agg(F.count("*").alias("_n"))
    depth = (F.lit(res) - h3_resolution(F.col("_anc")) + F.lit(1)).cast("int")
    expected = F.when(
        _is_pentagon_col(F.col("_anc")),
        F.element_at(F.array(*[F.lit(v) for v in _PENT_DESC]), depth),
    ).otherwise(F.element_at(F.array(*[F.lit(v) for v in _HEX_DESC]), depth))
    # lazy checkpoint: `complete` feeds two anti-joins below; the
    # checkpoint guarantees the explode+groupBy runs once per
    # materialization instead of once per join branch, and eager=False
    # folds that materialization into the caller's first action (one
    # fewer driver round-trip; a concurrent-AQE-stage race could at
    # worst compute it twice, which is waste, not wrongness)
    complete = (
        counts.where(F.col("_n") == expected)
        .select(F.col("_anc").alias(cell_col))
        .localCheckpoint(eager=False)
    )
    # a complete ancestor survives iff its own parent is not complete
    # (res-0 ancestors have no parent -> null key never anti-matches)
    anc_res = h3_resolution(cell_col)
    anc_parent = F.when(
        anc_res > 0,
        F.element_at(ancestors_col(cell_col), anc_res.cast("int")),
    )
    kept_anc = (
        complete.withColumn("_pk", anc_parent)
        .join(
            complete.select(F.col(cell_col).alias("_pk")), "_pk", "left_anti"
        )
        .select(cell_col)
    )
    # a leaf survives iff its immediate parent is not complete (monotone
    # completeness: no coarser ancestor can be complete either)
    kept_leaves = (
        distinct.withColumn("_pk", h3_to_parent_col(cell_col, res - 1))
        .join(
            complete.select(F.col(cell_col).alias("_pk")), "_pk", "left_anti"
        )
        .select(cell_col)
    )
    return kept_leaves.unionByName(kept_anc)


def ancestors_col(cell_col: str = "cell"):
    """array<long> of ALL coarser ancestors (res 0 .. res-1) of a cell,
    as one codegen'd expression — the dynamic-res generalization of
    h3_to_parent_col (2^k via pow-cast is exact for k <= 45, the
    largest digit-fill shift)."""
    c = F.col(cell_col)
    res = h3_resolution(cell_col)

    def parent_at(r):
        fill = F.pow(
            F.lit(2.0), ((F.lit(15) - r) * 3).cast("double")
        ).cast("long") - 1
        return (
            c.bitwiseAND(F.lit(~(0xF << 52)))
            .bitwiseOR(r.cast("long") * F.lit(1 << 52))
            .bitwiseOR(fill)
        )

    return F.when(
        res > 0, F.transform(F.sequence(F.lit(0), res - 1), parent_at)
    ).otherwise(F.array().cast("array<bigint>"))


def antichain_violations(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Rows of `cells` that have an ancestor ALSO in `cells` (empty ==
    the relation is an antichain, e.g. a valid compact output). Fully
    distributed: explode <= 15 ancestors per cell, one semi-join back —
    no driver collect, shuffle proportional to |cells| * avg_res."""
    anc = cells.select(
        F.col(cell_col).alias("_child"),
        F.explode(ancestors_col(cell_col)).alias(cell_col),
    )
    return anc.join(
        cells.select(cell_col), cell_col, "left_semi"
    ).select(F.col("_child").alias(cell_col), F.col(cell_col).alias("ancestor"))


_MAX_EXPLODE_LEVELS = 4  # resolution levels between redistributions


def children_one_level_col(cell_col):
    """array<long> of a cell's DIRECT children (res+1) as one codegen'd
    expression — the JVM twin of the kernel's to_children_batch level
    step (r7; retires the Arrow children UDF from the uncompact path):
    child = cell + 2^52 (res nibble bump) - 7*2^off + d*2^off, d in
    0..6, with pentagons (pentagon base cell + all-center digits, the
    same test as _is_pentagon_col) skipping the K digit d=1. 2^off via
    pow-cast is exact (off <= 42)."""
    c = F.col(cell_col) if isinstance(cell_col, str) else cell_col
    r1 = h3_resolution(c) + 1
    off = F.pow(F.lit(2.0), ((F.lit(15) - r1) * 3).cast("double")).cast(
        "long"
    )
    base = c + F.lit(1 << 52) - F.lit(7) * off
    digits = F.when(
        _is_pentagon_col(c),
        F.array(*[F.lit(d) for d in (0, 2, 3, 4, 5, 6)]),
    ).otherwise(F.array(*[F.lit(d) for d in range(7)]))
    return F.transform(digits, lambda d: base + d.cast("long") * off)


_PENT_IN_SQL = ", ".join(str(b) for b in _PENT_BCS)


def children_one_level_sql(x: str) -> str:
    """SQL-text twin of children_one_level_col (r7): the Column form
    costs ~120 py4j round-trips per call (~0.1-0.2 s of pure driver
    latency on a slow gateway), paid once per explode LEVEL in the
    uncompact loop; this string builds in Python and parses JVM-side
    in one call, producing the identical expression tree (literal
    subexpression duplication matches what Catalyst sees after the
    Column tree expands). Parity pinned by
    tests/test_operators.py::test_children_one_level_sql_parity."""
    r1 = f"((shiftright({x}, 52) & 15) + 1)"
    off = f"CAST(pow(2.0D, CAST((15 - {r1}) * 3 AS DOUBLE)) AS BIGINT)"
    base = f"({x} + 4503599627370496 - 7 * {off})"
    res = f"(shiftright({x}, 52) & 15)"
    fill = (
        f"(CAST(pow(2.0D, CAST((15 - {res}) * 3 AS DOUBLE)) AS BIGINT)"
        " - 1)"
    )
    center = (
        f"(576460752303423488 | (CAST({res} AS BIGINT) *"
        f" 4503599627370496) | (CAST((shiftright({x}, 45) & 127) AS"
        f" BIGINT) * 35184372088832) | {fill})"
    )
    pent = (
        f"((shiftright({x}, 45) & 127) IN ({_PENT_IN_SQL})"
        f" AND {x} = {center})"
    )
    digits = (
        f"(CASE WHEN {pent} THEN array(0, 2, 3, 4, 5, 6)"
        " ELSE array(0, 1, 2, 3, 4, 5, 6) END)"
    )
    return f"transform({digits}, d -> {base} + CAST(d AS BIGINT) * {off})"


def uncompact_cells_df(
    cells: DataFrame,
    res: int,
    cell_col: str = "cell",
    min_res: int | None = None,
    max_res: int | None = None,
) -> DataFrame:
    """Expand a mixed-res cell relation to uniform `res` (children
    explode; cells already at `res` pass through).

    One pure-JVM Generate per resolution level (children_one_level_col
    — rows already at `res` pass through as single-element arrays), so
    the whole expansion stays inside WholeStageCodegen with no
    JVM->Python Arrow transfer (r7; previously an Arrow children UDF
    shipped up to 7^4-element arrays per row across the boundary).
    Every _MAX_EXPLODE_LEVELS levels the relation is redistributed so
    a deep fan-out (7^4 per stage) spreads across the cluster instead
    of amplifying within one task.

    min_res: optional caller-known coarsest input res — skips the one
    derivation job. Understating it only adds pass-through explode
    levels (each row wraps in a 1-element array), never wrongness.

    max_res: optional caller-known FINEST input res. When max_res <
    res (a uniformly-coarse relation, e.g. a polygon cover), the
    already-at-res pass-through branch is provably empty and is
    skipped entirely — one fewer scan subtree, which on an un-reusable
    source (local relation, RDD scan) is a whole stage (r7). Unlike
    min_res this hint must be CORRECT: overstating it would route
    at-res rows into the explode (harmless) but understating it would
    drop finer-than-max_res rows from the pass-through."""
    spark = cells.sparkSession
    if max_res is not None and max_res < res:
        out = None
        todo = cells.select(cell_col)
    else:
        out = cells.where(h3_resolution(cell_col) == res).select(cell_col)
        todo = cells.where(h3_resolution(cell_col) < res).select(cell_col)
    if min_res is None:
        min_res = todo.agg(F.min(h3_resolution(cell_col))).first()[0]
    if min_res is None:
        # todo is empty (nothing coarser than res); out covers the input
        return out if out is not None else todo
    levels = res - int(min_res)
    # one selectExpr SQL string per level (r7): the Column form of the
    # children expression cost ~120 py4j round-trips per LEVEL — at 4
    # levels that was ~0.5-0.7 s of pure driver latency per call on a
    # slow gateway; the SQL text parses JVM-side in one call per level
    # and yields the identical plan
    level_expr = (
        f"explode(CASE WHEN (shiftright({cell_col}, 52) & 15) < {res}"
        f" THEN {children_one_level_sql(cell_col)}"
        f" ELSE array({cell_col}) END) AS {cell_col}"
    )
    for i in range(levels):
        todo = todo.selectExpr(level_expr)
        if (i + 1) % _MAX_EXPLODE_LEVELS == 0 and (i + 1) < levels:
            todo = todo.repartition(
                max(spark.sparkContext.defaultParallelism, 1)
            )
    return todo if out is None else out.unionByName(todo)
