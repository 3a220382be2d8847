"""Multi-resolution time rollup (the "continuous aggregate" / hypertable
rollup pattern: TimescaleDB continuous aggregates, Druid/Pinot rollup
segments) — maintain the same aggregate at several time resolutions by
re-aggregating the FINER level's partials instead of rescanning raw data.

Scale shape: the raw corpus is scanned ONCE, into the finest-level
partials (one hash aggregate with map-side combine). Every coarser level
aggregates the previous level's output — at 100 TB / 1-second events, the
1-hour rollup reads 10-minute partial rows (~6 rows per key-hour), not
raw events, so each additional resolution costs a shuffle over data
proportional to the finer AGGREGATE's cardinality, which is bounded by
(time buckets x key cardinality) regardless of raw volume. Sums and
counts are associative, so re-aggregated partials are exactly equal to a
direct GROUP BY at the coarser resolution (the DuckDB oracle computes
each level directly from raw rows and must match bit-for-bit).

Cross-engine determinism: values are integerized per ROW at the finest
level (value -> 1e-4 units as BIGINT) so every sum at every level is an
order-independent exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (bucket seconds, label); each level's seconds must divide the next's so
# floor-of-floor bucketing is exact: p | L => floor(floor(e/p)*p/L) == floor(e/L).
DEFAULT_LEVELS: tuple[tuple[int, str], ...] = (
    (600, "10min"),
    (3600, "1h"),
    (86400, "1d"),
)


def multires_rollup(
    events: DataFrame,
    levels: tuple[tuple[int, str], ...] = DEFAULT_LEVELS,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(level, bucket_start, key_col, n, sum_value_e4) for every level in
    `levels` — finest level from raw rows, each coarser level from the
    finer level's partials (counts/sums re-aggregate associatively)."""
    for (p, _), (lv, _) in zip(levels, levels[1:]):
        if lv % p != 0:
            raise ValueError(f"multires_rollup: {p} must divide {lv}")
    finest, finest_label = levels[0]
    partials = events.groupBy(
        F.floor(F.unix_timestamp(ts_col) / finest).cast("long").alias("bucket"),
        key_col,
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col(value_col) * 10000).cast("bigint")).alias("sum_value_e4"),
    )
    # MATERIALIZE the finest partials: without this, Catalyst plans each
    # union branch as its own scan->aggregate chain (verified: 3x `Scan
    # parquet`, 0 ReusedExchange — the exchange-reuse rule does not fire
    # across the differently-shaped branch tops), i.e. THREE corpus scans
    # at 100 TB. The lazy localCheckpoint computes the partials once at
    # first use and serves every level from the materialized (buckets x
    # keys)-sized result — the actual continuous-aggregate contract.
    partials = partials.localCheckpoint(eager=False)

    def emit(df: DataFrame, secs: int, label: str) -> DataFrame:
        return df.select(
            F.lit(label).alias("level"),
            (F.col("bucket") * secs).cast("long").alias("bucket_start"),
            key_col,
            "n",
            "sum_value_e4",
        )

    out = emit(partials, finest, finest_label)
    cur, prev_secs = partials, finest
    for secs, label in levels[1:]:
        # Exact BIGINT division (`div`), never floor(a/b) on doubles — a
        # double quotient can land an ulp under an exact integer and
        # diverge from the oracle's integer `//` (see verify-skill note).
        # floor(b*p/L) == b div (L/p) for b >= 0 when p | L.
        step = secs // prev_secs
        cur = (
            cur.groupBy(
                F.expr(f"bucket div {step}").alias("bucket"),
                key_col,
            )
            .agg(F.sum("n").alias("n"), F.sum("sum_value_e4").alias("sum_value_e4"))
        )
        prev_secs = secs
        out = out.unionByName(emit(cur, secs, label))
    return out


def rollup_backfill(
    on_time: DataFrame,
    late: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    bucket_secs: int = 600,
) -> DataFrame:
    """Late-data RESTATEMENT of a non-mergeable rollup: the standing
    per-(bucket, key) aggregate carries COUNT(DISTINCT user) — which,
    unlike the sums the incremental fold handles, cannot absorb a late
    delta (per-batch distinct partials are not mergeable). The correct
    and scale-sane move is per-bucket recompute limited to the AFFECTED
    buckets:

      1. affected = distinct (bucket, key) of the late batch — small,
         broadcast;
      2. restated = recompute those buckets from (on_time ∪ late),
         semi-joined down BEFORE the aggregate — at 100 TB the bucket
         predicate prunes a time-partitioned history to the touched
         partitions, so the recompute cost tracks the affected buckets'
         raw rows, never the history;
      3. untouched standing rows pass through via an anti join.

    Output: (bucket, key_col, n, distinct_users) — row-identical to a
    full recompute over (on_time ∪ late), which is the oracle."""
    bucket = F.floor(F.unix_timestamp(ts_col) / bucket_secs).cast("long").alias("bucket")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy(bucket, key_col).agg(
            F.count("*").alias("n"),
            F.count_distinct(user_col).alias("distinct_users"),
        )

    standing = agg(on_time)
    affected = late.select(bucket, key_col).distinct()
    cols = [c for c in on_time.columns]
    combined = on_time.select(*cols).unionByName(late.select(*cols))
    # NULL is a key: both the semi join (pull affected raw rows) and the
    # anti join (drop stale standing rows) compare key_col null-safely —
    # plain == would let a late NULL-key row vanish (never restated) while
    # its stale standing row passed through. eqNullSafe still plans as a
    # hash equi-join key, so the broadcast shape is unchanged.
    # Alias every join input: `affected` shares scan lineage with both
    # `combined` and `standing` (all derive from the same events source in
    # the registered queries), so frame-qualified column access resolved
    # both sides of each key to the SAME attribute — value-correct here,
    # but Spark logged a trivially-true-predicate warning per join,
    # polluting the channel that catches REAL accidental self-compares.
    aff, cmb, st = affected.alias("_aff"), combined.alias("_cmb"), standing.alias("_st")
    touched_raw = cmb.join(
        F.broadcast(aff),
        on=[F.floor(F.unix_timestamp(F.col(f"_cmb.{ts_col}")) / bucket_secs)
            .cast("long").eqNullSafe(F.col("_aff.bucket")),
            F.col(f"_cmb.{key_col}").eqNullSafe(F.col(f"_aff.{key_col}"))],
        how="leftsemi",
    )
    restated = agg(touched_raw)
    untouched = st.join(
        F.broadcast(aff),
        on=[F.col("_st.bucket").eqNullSafe(F.col("_aff.bucket")),
            F.col(f"_st.{key_col}").eqNullSafe(F.col(f"_aff.{key_col}"))],
        how="left_anti",
    )
    return untouched.unionByName(restated)


def rollup_user_erasure(
    events: DataFrame,
    erase_users: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    bucket_secs: int = 600,
) -> DataFrame:
    """Right-to-be-forgotten propagation into a NON-mergeable rollup: the
    standing per-(bucket, key) aggregate carries COUNT(DISTINCT user), so
    a user's deletion cannot be folded as a negative delta — their
    buckets must be recomputed. Same affected-bucket discipline as
    `rollup_backfill`, driven by deletes instead of late arrivals:

      1. affected = distinct (bucket, key) the erased users ever touched
         (from an anti-joined? no — from THEIR rows, a broadcast-scale
         frame when the erasure list is bounded);
      2. restated = recompute those buckets from the history WITHOUT the
         erased users (one semi-join down to touched buckets, one
         anti-join out of erased users — both before the aggregate);
      3. untouched standing rows pass through an anti join.

    Output: (bucket, key_col, n, distinct_users) — row-identical to a
    full recompute over events minus the erased users, which is the
    oracle. Empty buckets (every row was the erased user's) disappear,
    matching the full recompute."""
    bucket = F.floor(F.unix_timestamp(ts_col) / bucket_secs).cast("long").alias("bucket")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy(bucket, key_col).agg(
            F.count("*").alias("n"),
            F.count_distinct(user_col).alias("distinct_users"),
        )

    standing = agg(events)
    erased_rows = events.join(
        F.broadcast(erase_users.select(user_col).distinct()), user_col, "leftsemi"
    )
    affected = erased_rows.select(bucket, key_col).distinct()
    kept = events.join(
        F.broadcast(erase_users.select(user_col).distinct()), user_col, "left_anti"
    )
    # Null-safe key comparison for the same reason as rollup_backfill: an
    # erased user's NULL-key rows must still restate (and evict) their
    # (bucket, NULL) standing row, or the stale pre-erasure count survives.
    # Aliased for the same shared-lineage reason as rollup_backfill.
    aff, kp, st = affected.alias("_aff"), kept.alias("_kp"), standing.alias("_st")
    touched_kept = kp.join(
        F.broadcast(aff),
        on=[F.floor(F.unix_timestamp(F.col(f"_kp.{ts_col}")) / bucket_secs)
            .cast("long").eqNullSafe(F.col("_aff.bucket")),
            F.col(f"_kp.{key_col}").eqNullSafe(F.col(f"_aff.{key_col}"))],
        how="leftsemi",
    )
    restated = agg(touched_kept)
    untouched = st.join(
        F.broadcast(aff),
        on=[F.col("_st.bucket").eqNullSafe(F.col("_aff.bucket")),
            F.col(f"_st.{key_col}").eqNullSafe(F.col(f"_aff.{key_col}"))],
        how="left_anti",
    )
    return untouched.unionByName(restated)
