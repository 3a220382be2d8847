"""As-of (point-in-time) join — a first-class operator Spark's DataFrame
API lacks (beyond-reference; the classic training-pipeline need of joining
each fact to the most recent dimension state at-or-before its timestamp).

Scale design: the naive formulation is a range join (`l.key = r.key AND
r.ts <= l.ts` + keep-latest), which Catalyst plans as a join with a
non-equi predicate — per-key quadratic fan-out before the keep-latest
filter. Instead we use the union + window trick, the standard Spark
pattern: tag both sides, union them by key/time, and carry the right
side's values forward with `last(..., ignorenulls=True)` over a
(key-partitioned, time-ordered) running window. One shuffle on the key,
one sort, strictly linear in |L| + |R| — the same shape Flink's temporal
join and kdb's `aj` use internally.

Ties (right row exactly at the left row's timestamp) match — "at or
before" — because right rows sort before left rows at equal timestamps.
Right-side rows must be unique per (key, ts); pre-aggregate (e.g.
`max_by`) to pick a deterministic survivor, or the carried value depends
on sort tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For every left row, attach `right_vals` from the latest right row of
    the same key with right_ts <= left_ts (NULLs when no such row — left
    join semantics). Returns all left columns + right_vals."""
    left_cols = left.columns
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_vals],
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *right_vals,
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_side",
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in right_vals],
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols, *[F.col(f"_asof_{c}").alias(c) for c in right_vals]
    )
