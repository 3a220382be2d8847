"""Rank-exact order statistics from FREQUENCY TABLES — the scale-correct
form for bounded value domains (r11).

The repo's rank-exact quantile recipe ("value at rank k under a total
order" — no interpolated-percentile float boundary) has two physical
forms:

1. ROW window: `row_number()` over a (group)-partitioned corpus-sized
   window. Exact for ANY domain, but a low-cardinality group column
   (return flags, event types) makes each partition a single-task sort —
   the window-skew class salting can't fix.
2. FREQUENCY table (this module): when the value DOMAIN is small
   (integer days, cents, bounded gap seconds), aggregate to
   per-(group, value) COUNTS first — a map-side-combined hash aggregate —
   then run the cumulative over the TINY count table. "Value at rank k"
   == "smallest value whose cumulative count reaches k", identical to
   the row_number definition for every rank (the tiebreak column only
   ever disambiguates rows WITHIN one value, which all agree on the
   value). The only corpus-sized operator left is the hash aggregate.

Cross-engine note: keep the DuckDB oracle on the ROW_NUMBER formulation —
it is then an INDEPENDENT derivation of the same order statistics, not a
shared tree.

Used by `lineitem_ship_lag_profile` / `orders_customer_order_gaps`
(r11). The r12 migration moved every remaining bounded-domain query off
form 1: events_value_winsorized_stats (cents), events_conversion_time
_profile (gap seconds ≤ 7200), documents_volume_median (weighted median
— the VOLUME rides as the count column), events_value_deciles
(NTILE spans resolved as rank lookups, operators/quality.py), and
events_value_quartiles_by_type (percentile_cont interpolation over
boundary-rank values — positions (n-1)k/4 are exact doubles, so the
float tree matches the engine-native percentile bit-for-bit). No
registered query runs a corpus-sized low-cardinality rank window
anymore; unbounded domains take the KLL sketch path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def freq_table_rank_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rank_exprs: dict[str, str],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-group rank-exact order statistics via the frequency-table
    decomposition. `rank_exprs` maps output column name -> a Spark SQL
    expression over `n` (the group's total count, BIGINT) yielding the
    1-based target rank, e.g. ``{"median": "(n + 1) DIV 2",
    "p90": "(n * 9 + 9) DIV 10"}``. Returns one row per group with
    columns (group_col, n, *rank_exprs, *extra_aggs) where each rank
    column holds the group's value at that rank (ascending order).

    `extra_aggs` adds aggregates over the (value, count) table — e.g.
    ``{"min_v": F.min("v"), "max_v": F.max("v")}`` where the frequency
    table exposes the value as `v` and its count as `c`.

    Raises ValueError when the input carries the internal scratch names
    (_v/_c/cum/n, plus the v/c names the from_counts finalize
    introduces — r12 ADVICE fix: a group_col literally named 'v' or 'c'
    previously produced ambiguous duplicate columns downstream instead
    of this loud error)."""
    reserved = {"_v", "_c", "cum", "n", "v", "c"}
    clashes = reserved.intersection(df.columns) - {value_col}
    if clashes:
        raise ValueError(
            f"freq_table_rank_stats: input columns collide with internal "
            f"names: {sorted(clashes)}"
        )
    counts = (
        df.select(F.col(group_col), F.col(value_col).alias("_v"))
        .groupBy(group_col, "_v")
        .agg(F.count("*").alias("_c"))
    )
    return freq_table_rank_stats_from_counts(
        counts, group_col, "_v", "_c", rank_exprs, extra_aggs
    )


def freq_table_rank_stats_from_counts(
    counts: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str,
    rank_exprs: dict[str, str],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Finalize rank-exact order statistics from an ALREADY-AGGREGATED
    per-(group, value) count table — the form a STREAMING fold maintains:
    per-(group, value) counts are purely additive (micro-batch deltas
    merge with `merge.apply_agg_delta`, commutatively — file-arrival
    order cannot change a sum of counts), so the count table is the
    mergeable, sketch-free sufficient statistic for EXACT quantiles on
    bounded domains. Same rank semantics as
    :func:`freq_table_rank_stats` (which delegates here); `extra_aggs`
    expressions see the count table as columns `v` (value) and `c`
    (count).

    Raises ValueError when `group_col` collides with the scratch names
    (v/c/cum/n) — the value/count columns are aliased away, but the
    group column survives into the cum projection verbatim (r12 ADVICE
    fix for direct callers like streaming_value_exact_quantiles)."""
    if group_col in {"v", "c", "cum", "n"}:
        raise ValueError(
            f"freq_table_rank_stats_from_counts: group_col {group_col!r} "
            "collides with internal names (v/c/cum/n) — rename it first"
        )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        group_col,
        F.col(value_col).alias("v"),
        F.col(count_col).alias("c"),
        F.sum(count_col).over(wcum).alias("cum"),
        F.sum(count_col).over(Window.partitionBy(group_col)).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for out_name, rank_sql in rank_exprs.items():
        aggs.append(
            F.min(F.when(F.col("cum") >= F.expr(rank_sql), F.col("v"))).alias(
                out_name
            )
        )
    for out_name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(out_name))
    return cum.groupBy(group_col).agg(*aggs)
