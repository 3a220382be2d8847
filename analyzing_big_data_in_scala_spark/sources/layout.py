"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Range-partitioning a table by ONE column gives min/max file skipping on
that column only; queries filtering the other dimension scan everything.
Interleaving the bits of two (or more) key columns into a single Z-value
and range-partitioning + sorting by it clusters rows that are close in
EVERY dimension into the same files — parquet min/max stats then prune
files for predicates on ANY of the interleaved columns (the Delta/Iceberg
OPTIMIZE ZORDER recipe, expressed with stock Spark writes).

The Z-value itself is pure bit arithmetic (shift/mask/or), identical in
DuckDB — so the transform is fully oracle-checkable, and the layout
effect (files pruned on both dimensions) is asserted by
tests/test_scale_layout.py over the actual parquet footers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code: interleave the low `bits` bits of each column (column
    i contributes bit j to output bit `j * len(cols) + i`). Inputs are
    masked to `bits` bits first, so the code never overflows a long for
    bits * len(cols) <= 62. Pure JVM bit arithmetic — codegen-friendly,
    no UDF; negative inputs are masked to their low bits like any other
    value (two's complement), so callers with signed keys should shift
    them non-negative first for meaningful locality.
    """
    ncols = len(cols)
    if ncols * bits > 62:
        raise ValueError(f"z_value: {ncols} cols x {bits} bits overflows a long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    parts = []
    for i, c in enumerate(cs):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            # bit j of column i -> output bit j*ncols + i
            parts.append(
                F.shiftleft(
                    F.shiftright(masked, j).bitwiseAND(F.lit(1)), j * ncols + i
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z")


def sql_z_value(exprs: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value` (same bit placement)."""
    ncols = len(exprs)
    parts = []
    for i, e in enumerate(exprs):
        masked = f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})"
        for j in range(bits):
            parts.append(f"((({masked} >> {j}) & 1) << {j * ncols + i})")
    return "(" + " | ".join(parts) + ")"


def minmax_scaled(col: Column | str, cmin: Column, cmax: Column, bits: int = 16) -> Column:
    """Scale a key into [0, 2^bits) by its global [min, max] — the
    required pre-step before interleaving keys of UNEQUAL ranges (a raw
    interleave is dominated by the wider column's high bits, leaving the
    narrow column unclustered). INTEGER arithmetic only — (x - min) *
    (2^bits - 1) `div` span — so the scaling is bit-identical across
    engines (no float rounding to diverge on); span ~2^40 keys still fit
    the intermediate product in a long at bits=16."""
    c = F.col(col) if isinstance(col, str) else col
    span = F.greatest(cmax.cast("long") - cmin.cast("long"), F.lit(1).cast("long"))
    scaled_num = (c.cast("long") - cmin.cast("long")) * F.lit((1 << bits) - 1)
    # `div` = Spark's exact BIGINT integer division (float `/` could land
    # an ulp under an integer and floor() off-by-one vs DuckDB's `//`).
    return F.call_function("div", scaled_num, span).cast("long")


def sql_minmax_scaled(expr: str, min_expr: str, max_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`minmax_scaled` (`//` = integer floor div)."""
    span = f"GREATEST(CAST({max_expr} AS BIGINT) - CAST({min_expr} AS BIGINT), 1)"
    return (
        f"((CAST({expr} AS BIGINT) - CAST({min_expr} AS BIGINT)) * {(1 << bits) - 1}) // {span}"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered along the Z-curve of `zorder_by`:
    min/max-scale each key to `bits` bits (one tiny stats aggregate —
    metadata, the same cost class as repartitionByRange's sampling pass),
    interleave into the Z-value, range-partition into `n_files` Z-ranges,
    sort within partitions, drop the helper column. Parquet min/max
    footers then carry tight ranges for EVERY interleaved column, so
    point/range predicates on any of them skip most files at plan time.
    """
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in zorder_by],
        *[F.max(c).alias(f"max_{c}") for c in zorder_by],
    ).first()
    scaled = [
        minmax_scaled(c, F.lit(stats[f"min_{c}"]), F.lit(stats[f"max_{c}"]), bits)
        for c in zorder_by
    ]
    zed = df.withColumn("__z", z_value(scaled, bits))
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
