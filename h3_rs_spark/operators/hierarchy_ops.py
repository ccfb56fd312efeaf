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
from ..functions.udfs import h3_to_children_udf
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


def compact_cells_df(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Minimal multi-res covering set of a uniform-res cell relation.

    Returns a DataFrame with the same cell_col holding the compacted
    (mixed-res) set. Input must be distinct cells of one resolution.
    """
    spark = cells.sparkSession
    res = cells.select(F.max(h3_resolution(cell_col))).first()[0]
    if res is None:
        return cells
    result = None
    cur = cells.select(cell_col).distinct()
    for r in range(int(res), 0, -1):
        # localCheckpoint: each round's isEmpty probe (and the final
        # result evaluation) would otherwise re-run the ENTIRE chain of
        # prior rounds — quadratic job work. The checkpointed relation
        # is the per-round parent set, which shrinks ~7x per round, so
        # materializing it is exactly the shrinking-shuffle design the
        # docstring promises; it also lets `parented` feed both the
        # family count and the anti-join without recomputation.
        parented = cur.withColumn(
            "_parent", h3_to_parent_col(cell_col, r - 1)
        ).localCheckpoint(eager=True)
        fam = parented.groupBy("_parent").agg(F.count("*").alias("_n"))
        full_n = F.when(_is_pentagon_col(F.col("_parent")), 6).otherwise(7)
        promoted = fam.where(F.col("_n") == full_n).select("_parent")
        kept = (
            parented.join(promoted, "_parent", "left_anti")
            .select(cell_col)
        )
        result = kept if result is None else result.unionByName(kept)
        cur = promoted.select(F.col("_parent").alias(cell_col))
        if cur.isEmpty():
            break
    else:
        result = result.unionByName(cur) if result is not None else cur
        return result
    return result if result is not None else spark.createDataFrame([], cells.schema)


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


_MAX_EXPLODE_LEVELS = 4  # 7^4 = 2401 children per row per stage


def uncompact_cells_df(
    cells: DataFrame, res: int, cell_col: str = "cell"
) -> DataFrame:
    """Expand a mixed-res cell relation to uniform `res` (children
    explode; cells already at `res` pass through).

    The explode is staged at most 4 resolution levels at a time: a
    single-stage explode of a res-0 cell to res 9 would materialize a
    7^9-element array in ONE row's UDF output (gigabytes); staging keeps
    every intermediate array <= 7^4 elements and lets the engine
    redistribute rows between stages."""
    spark = cells.sparkSession
    out = cells.where(h3_resolution(cell_col) == res).select(cell_col)
    todo = cells.where(h3_resolution(cell_col) < res).select(cell_col)
    min_res = todo.agg(F.min(h3_resolution(cell_col))).first()[0]
    if min_res is None:
        return out
    step_res = int(min_res)
    while step_res < res:
        step_res = min(res, step_res + _MAX_EXPLODE_LEVELS)
        # explode rows below the stage target; rows at/above it (but
        # still below `res`) carry through to the next stage unchanged
        exp = todo.where(h3_resolution(cell_col) < step_res).select(
            F.explode(h3_to_children_udf(step_res)(F.col(cell_col))).alias(
                cell_col
            )
        )
        keep = todo.where(h3_resolution(cell_col) >= step_res)
        todo = exp.unionByName(keep)
        if step_res < res:
            # redistribute between stages so the next fan-out spreads
            # across the cluster instead of amplifying within one task
            todo = todo.repartition(
                max(spark.sparkContext.defaultParallelism, 1)
            )
    return out.unionByName(todo)
