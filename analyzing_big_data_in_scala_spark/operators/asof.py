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

Three variants ship: backward ("latest state at-or-before", the feature
join), forward ("earliest outcome at-or-after", the label join), and
nearest ("closest state in either direction", ties to the backward row),
each with an optional `tolerance` bounding the match distance (staleness
for features, horizon for labels, symmetric radius for nearest).

The right values ride the window as ONE struct, not one `last(...)`
per column: per-column carry would pull a NULL field from an OLDER
right row, splicing fields across right versions whenever any carried
field is NULLable. The struct is non-null for every right row, so
`last(ignorenulls=True)` always selects the latest right row wholesale
and NULL fields stay NULL.
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
    tolerance=None,
) -> DataFrame:
    """For every left row, attach `right_vals` from the latest right row of
    the same key with right_ts <= left_ts (NULLs when no such row — left
    join semantics). Returns all left columns + right_vals.

    `tolerance` bounds the STALENESS of the match (the feature-store
    freshness rule): a right row further than `tolerance` before the left
    timestamp is treated as no match (all right_vals NULL). Pass a value
    comparable to `left_ts - right_ts` in the columns' type — a number for
    numeric timestamps, `F.expr("INTERVAL 7 DAYS")` for real ones.

    Raises ValueError on column collisions the union-with-shared-names
    construction can't survive: a left column named like the internal
    scratch columns, or a right value column already present on the left
    (either would silently corrupt the carried values)."""
    return _asof_join(
        left, right, left_key, right_key, left_ts, right_ts, right_vals,
        forward=False, tolerance=tolerance, opname="asof_join_backward",
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance=None,
) -> DataFrame:
    """Mirror of :func:`asof_join_backward` looking FORWARD: for every left
    row, attach `right_vals` from the EARLIEST right row of the same key
    with right_ts >= left_ts (ties match; NULLs when no such row). The
    label-join form of the operator — "the next outcome at-or-after this
    event" (next order, next churn signal) — with `tolerance` bounding how
    far ahead a match may be (the label horizon, which is also the
    leakage guard: an unbounded forward join would let one terminal
    outcome label arbitrarily old events).

    Same union+window construction run time-reversed: one shuffle on the
    key, one sort descending on time, linear in |L| + |R|."""
    return _asof_join(
        left, right, left_key, right_key, left_ts, right_ts, right_vals,
        forward=True, tolerance=tolerance, opname="asof_join_forward",
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance=None,
) -> DataFrame:
    """NEAREST as-of: for every left row, attach `right_vals` from the
    right row of the same key whose timestamp is CLOSEST in either
    direction (the "closest state" join — sensor reading nearest to an
    inspection time, quote nearest to a trade). `tolerance` bounds the
    distance symmetrically; ties (one right row `d` before and another
    `d` after) resolve to the EARLIER right row — the backward match,
    the at-the-time-known state.

    The nearest right row is always one of: the latest right row
    at-or-before the left timestamp, or the earliest at-or-after — so
    ONE tagged union carries both: the same (key)-partitioned scan as
    the directional joins, sorted twice (ascending for the backward
    carry, descending for the forward carry). ONE exchange, two sorts,
    linear in |L| + |R| — never the naive key-join + per-key |L|x|R|
    distance argmin.

    Same preconditions as the directional joins (right rows unique per
    (key, ts); NULL timestamps never match)."""
    u, left_cols = _asof_union(
        left, right, left_key, right_key, left_ts, right_ts, right_vals,
        opname="asof_join_nearest",
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_side",
        F.col("_t"),
        *left_cols,
        F.last("_rv", ignorenulls=True).over(wb).alias("_rvb"),
        F.last("_rv", ignorenulls=True).over(wf).alias("_rvf"),
    )
    gap_b = F.col("_t") - F.col("_rvb").getField("t")
    gap_f = F.col("_rvf").getField("t") - F.col("_t")
    ok_b = F.col("_rvb").isNotNull() & F.col("_t").isNotNull()
    ok_f = F.col("_rvf").isNotNull() & F.col("_t").isNotNull()
    if tolerance is not None:
        ok_b = ok_b & (gap_b <= tolerance)
        ok_f = ok_f & (gap_f <= tolerance)
    payload = (
        # Both directions in range: the smaller gap wins; equal gaps go
        # backward (the earlier right row).
        F.when(ok_b & ok_f,
               F.when(gap_b <= gap_f, F.col("_rvb").getField("v"))
               .otherwise(F.col("_rvf").getField("v")))
        .when(ok_b, F.col("_rvb").getField("v"))
        .when(ok_f, F.col("_rvf").getField("v"))
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols, *[payload.getField(c).alias(c) for c in right_vals]
    )


def asof_join_backward_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    bucket_size: int,
    tolerance=None,
) -> DataFrame:
    """:func:`asof_join_backward` with TIME-RANGE PRE-BUCKETING — the
    skew-resistant form for hot keys (the mitigation the r10 Zipf-skew
    probe names: `window_asof` degrades 10x+ at 64x data when one key
    owns half the rows, because a (key)-partitioned time-ordered window
    puts that key's ENTIRE history on ONE task, and the order dependency
    rules out salt splits).

    Identical results to :func:`asof_join_backward` (same tie, NULL-ts,
    and tolerance semantics), different physical shape — the carry-stitch
    decomposition:

    1. Bucket every row by coarse time: `_bk = floor(ts / bucket_size)`.
       Timestamps must be NUMERIC (epoch seconds — convert with
       `F.unix_timestamp` first, like the interval-join family).
    2. LOCAL carry: the same running `last(right-row, ignorenulls)` but
       over a (key, bucket)-partitioned window — a hot key's history now
       splits across ~span/bucket_size tasks instead of one.
    3. STITCH: per (key, bucket), the latest right row in the bucket
       (one `max_by` aggregate row per bucket); a per-key running carry
       over STRICTLY PRECEDING bucket summaries yields each bucket's
       carry-in — the latest right row anywhere before the bucket. This
       window is per-key serial too, but over #buckets rows, not #events
       (the 50%-mass key's straggler work drops from its row count to
       its bucket count).
    4. Every left row matches `coalesce(local_carry, carry_in)`; the
       bucketing is monotone in time, so a right row in an earlier
       bucket is always at-or-before a left row in a later one.

    Pick `bucket_size` so a hot key's densest bucket fits one task
    comfortably (e.g. a day of a key that logs millions of rows/day is
    still one task — go hourly). Cost vs the plain form: one extra tiny
    aggregate + one (key, bucket) equi join back — both reuse the
    window's hash partitioning.

    Raises ValueError on non-positive bucket_size and on the same
    column collisions as the plain form (plus the `_bk`/`_rvl`/`_ci`/
    `_cik`/`_cib` scratch names). NULL join keys follow the plain form:
    the window semantics group NULL keys into one partition, so NULL-key
    left rows match NULL-key right rows (pinned by
    test_asof_bucketed_null_key_matches_plain)."""
    if bucket_size <= 0:
        raise ValueError(
            f"asof_join_backward_bucketed: bucket_size must be > 0, got {bucket_size}"
        )
    extra = {"_bk", "_rvl", "_ci", "_cik", "_cib"}
    clashes = extra.intersection(left.columns)
    if clashes:
        raise ValueError(
            "asof_join_backward_bucketed: left columns collide with internal "
            f"names: {sorted(clashes)}"
        )
    u, left_cols = _asof_union(
        left, right, left_key, right_key, left_ts, right_ts, right_vals,
        opname="asof_join_backward_bucketed",
    )
    u = u.withColumn(
        "_bk", F.floor(F.col("_t") / F.lit(bucket_size)).cast("long")
    )
    # (2) local carry within (key, bucket) — same ordering contract as the
    # plain form: right rows (side 0) before left rows at equal timestamps.
    w_local = (
        Window.partitionBy("_k", "_bk")
        .orderBy(F.col("_t").asc(), "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = u.select(
        "_side",
        "_k",
        "_bk",
        F.col("_t"),
        *left_cols,
        F.last("_rv", ignorenulls=True).over(w_local).alias("_rvl"),
    )
    # (3) one summary row per (key, bucket) present in the union (left OR
    # right rows — a left-only bucket still needs a carry-in), holding the
    # bucket's latest right row (max_by skips the NULL ordering the
    # when() gives left rows; NULL when the bucket has no right rows).
    # NULL _bk (left rows with NULL timestamps) sorts FIRST ascending, so
    # its summary's empty strictly-preceding frame yields no carry-in and
    # its NULL _last never pollutes later buckets through ignorenulls.
    w_stitch = (
        Window.partitionBy("_k")
        .orderBy(F.col("_bk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        u.groupBy("_k", "_bk")
        .agg(
            F.max_by(
                "_rv", F.when(F.col("_side") == 0, F.col("_t"))
            ).alias("_last")
        )
        .select(
            "_k",
            "_bk",
            F.last("_last", ignorenulls=True).over(w_stitch).alias("_ci"),
        )
    )
    # (4) join the tiny per-bucket carry-in back on the window's own
    # (key, bucket) partitioning and resolve each row's effective carry.
    # LEFT join: a NULL-ts left row has a NULL bucket, which an inner
    # equi join would silently DROP (NULL never equi-matches) — it must
    # survive as an unmatched row, exactly like the plain form.
    # NULL-SAFE on _k: the plain form's partitionBy(_k) window groups
    # NULL keys into ONE partition (NULL-key left rows match NULL-key
    # right rows), so the stitch must deliver cross-bucket carries to the
    # NULL-key group too — a plain `==` join would silently restrict
    # NULL-key rows to same-bucket local carries. eqNullSafe still plans
    # as a hash equi join, so the parity is free. (_bk is null-safe for
    # the same reason; NULL-_bk rows never match — _t is NULL — but the
    # carry_in side has a NULL-bucket summary row whose join multiplicity
    # must stay 1:1.)
    _ci_side = carry_in.withColumnRenamed("_k", "_cik").withColumnRenamed(
        "_bk", "_cib"
    )
    carried = (
        local.join(
            _ci_side,
            F.col("_k").eqNullSafe(F.col("_cik"))
            & F.col("_bk").eqNullSafe(F.col("_cib")),
            "left",
        )
        .drop("_cik", "_cib")
        .withColumn("_rv", F.coalesce("_rvl", "_ci"))
    )
    matched = F.col("_rv").isNotNull() & F.col("_t").isNotNull()
    if tolerance is not None:
        matched = matched & (
            (F.col("_t") - F.col("_rv").getField("t")) <= tolerance
        )
    payload = F.when(matched, F.col("_rv").getField("v"))
    return carried.filter(F.col("_side") == 1).select(
        *left_cols, *[payload.getField(c).alias(c) for c in right_vals]
    )


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    opname: str,
) -> tuple[DataFrame, list[str]]:
    """Shared validation + tagged-union construction for every as-of
    variant: returns (union frame, left column list). The union carries
    (_k, _t, _side, *left_cols, _rv) where _rv is the right row's
    (t, v=struct(right_vals)) — NULL on left rows."""
    left_cols = left.columns
    reserved = {"_k", "_t", "_side", "_rv"}
    clashes = reserved.intersection(left_cols)
    if clashes:
        raise ValueError(
            f"{opname}: left columns collide with internal names: {sorted(clashes)}"
        )
    overlap = set(right_vals).intersection(left_cols)
    if overlap:
        raise ValueError(
            f"{opname}: right_vals already exist on the left side: {sorted(overlap)}"
        )
    missing = [c for c in right_vals if c not in right.columns]
    if missing:
        raise ValueError(f"{opname}: right_vals not in right frame: {missing}")
    # Duplicate (or case-colliding, under Spark's default case-insensitive
    # resolution) names would build a struct with duplicate fields and make
    # the getField() extraction below fail with an ambiguous-field
    # AnalysisException at execution — fail clearly up front instead.
    if len({c.lower() for c in right_vals}) != len(right_vals):
        raise ValueError(
            f"{opname}: right_vals contains duplicate/case-colliding names: {right_vals}"
        )
    # One struct per right row: non-null for every right row regardless of
    # NULL fields inside, so the running last(ignorenulls) below carries the
    # latest right row WHOLE — never a field-spliced mix of right versions.
    # The matched right timestamp rides along as `t` (needed for the
    # tolerance check); the value payload nests under `v` so right_vals can
    # never collide with the internal field name.
    # A right row with a NULL timestamp can never satisfy "at-or-before" /
    # "at-or-after" — drop it before the union. Without this the two
    # directions diverged: backward's ascending sort put NULL _t rows FIRST
    # (so a NULL-ts right row could be carried as a 'match' when tolerance
    # is None), while forward's descending sort put them LAST (never
    # carried). Filtering makes both directions consistent regardless of
    # tolerance.
    right = right.filter(F.col(right_ts).isNotNull())
    rv_expr = F.struct(
        F.col(right_ts).alias("t"), F.struct(*right_vals).alias("v")
    )
    rv_type = right.select(rv_expr.alias("_rv")).schema["_rv"].dataType
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *left_cols,
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        rv_expr.alias("_rv"),
    )
    return lt.unionByName(rt), left_cols


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    forward: bool,
    tolerance,
    opname: str,
) -> DataFrame:
    u, left_cols = _asof_union(
        left, right, left_key, right_key, left_ts, right_ts, right_vals, opname
    )
    # Backward: ascending time, right rows (side 0) before left at equal
    # timestamps so "at or before" ties match. Forward is the same scan
    # time-REVERSED — descending time, right rows still first at equal
    # timestamps, so the running carry holds the nearest right row with
    # right_ts >= left_ts.
    order_t = F.col("_t").desc() if forward else F.col("_t").asc()
    w = (
        Window.partitionBy("_k")
        .orderBy(order_t, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_side",
        F.col("_t"),
        *left_cols,
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    # A LEFT row with a NULL timestamp never matches either (same
    # asymmetry, mirrored: forward's NULLS-LAST descending sort would have
    # carried the earliest right row into it when tolerance is None).
    matched = F.col("_rv").isNotNull() & F.col("_t").isNotNull()
    if tolerance is not None:
        gap = (
            (F.col("_rv").getField("t") - F.col("_t"))
            if forward
            else (F.col("_t") - F.col("_rv").getField("t"))
        )
        matched = matched & (gap <= tolerance)
    payload = F.when(matched, F.col("_rv").getField("v"))
    return carried.filter(F.col("_side") == 1).select(
        *left_cols, *[payload.getField(c).alias(c) for c in right_vals]
    )


def range_join_points_in_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_val: str,
    interval_start: str,
    interval_end: str,
    bucket_size: int,
) -> DataFrame:
    """Range join: every (point, interval) pair of the same key with
    interval_start <= point_val < interval_end (end-exclusive). The val
    columns must be numeric — callers with timestamps convert to epoch
    seconds first (`F.unix_timestamp`), which also sidesteps every
    session-timezone trap.

    Catalyst plans the raw formulation (`p.key = i.key AND s <= v AND
    v < e`) as an equi join on the key with a post-filter — per-key
    quadratic fan-out when one key has many points AND many intervals
    (the common shape: per-user activity windows × per-user events).
    Here each interval explodes into the coarse value buckets it covers
    (bounded: span / bucket_size + 1 rows) and each point lands in
    exactly ONE bucket, so the match becomes an EQUI join on
    (key, bucket) with the exact predicate applied after — fan-out drops
    from |P_k|·|I_k| to candidates sharing a bucket. This is the
    discretization trick behind Databricks' range-join optimization;
    pick bucket_size ≈ typical interval span. No dedup needed: a point's
    single bucket meets each interval at most once.

    Empty/inverted intervals (end <= start) are dropped up front — they
    can never match, and Spark's `sequence(start, stop)` would silently
    generate a DESCENDING bucket list for them.

    Returns all point columns + all interval columns (key column from
    the points side wins on name collision). Skewed keys: bucketing
    already splits a hot key's hash group by value; residual skew is
    AQE's skew-join territory.

    Raises ValueError when either input already carries the internal
    bucket column `_b` (withColumn would silently clobber it).
    """
    for side, df in (("points", points), ("intervals", intervals)):
        if "_b" in df.columns:
            raise ValueError(
                f"range_join_points_in_intervals: {side} frame already has a "
                "'_b' column (internal bucket name) — rename it first"
            )
    p = points.withColumn(
        "_b", F.floor(F.col(point_val) / F.lit(bucket_size)).cast("long")
    ).alias("_p")
    iv = (
        intervals.filter(F.col(interval_end) > F.col(interval_start))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(interval_start) / F.lit(bucket_size)).cast("long"),
                    F.floor(F.col(interval_end) / F.lit(bucket_size)).cast("long"),
                )
            ),
        )
        .alias("_i")
    )
    joined = p.join(
        iv,
        (F.col(f"_p.{point_key}") == F.col(f"_i.{interval_key}"))
        & (F.col("_p._b") == F.col("_i._b"))
        & (F.col(f"_p.{point_val}") >= F.col(f"_i.{interval_start}"))
        & (F.col(f"_p.{point_val}") < F.col(f"_i.{interval_end}")),
    )
    return joined.select(
        *[F.col(f"_p.{c}") for c in points.columns],
        *[F.col(f"_i.{c}") for c in intervals.columns if c not in points.columns],
    )


def interval_coalesce(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    max_gap: int = 0,
) -> DataFrame:
    """Per-key union of CLOSED intervals (the missing third member of the
    range-join family, next to the point-in-interval and overlap joins):
    merge every chain of overlapping-or-touching intervals into one
    maximal segment —

        (key, segment_id, seg_start, seg_end, seg_len, n_merged)

    segment_id is the 1-based segment ordinal within the key (ascending
    start time); per-key total covered time is SUM(seg_len) over the
    key's segments. Touching endpoints coalesce (closed-interval
    convention, same as :func:`interval_overlap_join`); inverted
    intervals (end < start) are dropped up front.

    `max_gap` (default 0) is the sessionization slack: intervals whose
    gap is at most `max_gap` units also merge — the interval-level twin
    of session windows ("one visit" = bursts <= 30 min apart). With the
    default only overlapping-or-touching intervals merge.

    Scale shape: classic gaps-and-islands over ONE (key)-partitioned
    window (the `run_length_encode` recipe): a running max of prior ends
    flags island openers (an interval starting past every earlier end),
    a running sum turns flags into island ids, and the closing
    (key, island) aggregate reuses the window's hash partitioning — one
    exchange total, linear in |intervals|, never a per-key quadratic
    pass. Deterministic under duplicate (start, end) rows: ties order by
    (start, end) and identical rows produce identical flags in either
    tie order, so segment ids are well-defined cross-engine.
    """
    reserved = {"_mx", "_new", "segment_id", "seg_start", "seg_end", "seg_len", "n_merged"}
    clashes = reserved.intersection(intervals.columns)
    if clashes:
        raise ValueError(
            f"interval_coalesce: input columns collide with output/internal "
            f"names: {sorted(clashes)}"
        )
    if max_gap < 0:
        raise ValueError(f"interval_coalesce: max_gap must be >= 0, got {max_gap}")
    w = Window.partitionBy(key_col).orderBy(F.asc(start_col), F.asc(end_col))
    flagged = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .select(
            key_col,
            start_col,
            end_col,
            # Max end over STRICTLY PRECEDING rows: NULL on the key's first
            # row, so `start <= NULL` is NULL and the otherwise-branch
            # opens island 1 — exactly DuckDB's empty-frame MAX semantics.
            F.max(end_col)
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
            .alias("_mx"),
        )
        .select(
            key_col,
            start_col,
            end_col,
            F.when(
                F.col(start_col) <= F.col("_mx") + F.lit(max_gap), F.lit(0).cast("long")
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("_new"),
        )
    )
    islands = flagged.select(
        key_col,
        start_col,
        end_col,
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("segment_id"),
    )
    return islands.groupBy(key_col, "segment_id").agg(
        F.min(start_col).alias("seg_start"),
        F.max(end_col).alias("seg_end"),
        (F.max(end_col) - F.min(start_col)).alias("seg_len"),
        F.count("*").alias("n_merged"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_size: int,
) -> DataFrame:
    """Interval-interval OVERLAP join: every (left, right) pair of the
    same key whose CLOSED intervals intersect — `ls <= re AND rs <= le`
    (touching endpoints count; genomics/temporal-overlap convention).
    Start/end columns must be numeric (callers convert timestamps to
    epoch seconds first). Inverted intervals (end < start) are dropped
    up front on both sides.

    The two-sided sibling of :func:`range_join_points_in_intervals`,
    with the same discretization: both sides explode into the coarse
    value buckets they cover, and the match becomes an EQUI join on
    (key, bucket) with the exact overlap predicate applied after.
    Unlike the point case, a pair can share MANY buckets — instead of a
    post-join `distinct` (a second corpus-sized shuffle), the join keeps
    a pair only in the bucket containing `greatest(ls, rs)`: floor is
    monotone, so that bucket is `greatest(floor(ls/B), floor(rs/B))`,
    BOTH intervals cover `greatest(ls, rs)` whenever they overlap, and
    exactly one bucket satisfies the equality — every overlapping pair
    is emitted exactly once with no dedup pass.

    Returns all left columns + all right columns (left wins on name
    collision) + `overlap_start` / `overlap_end` / `overlap_len`
    (exact integers when the inputs are integers). Pick bucket_size ≈
    the typical interval span; residual per-key skew is AQE territory.

    Raises ValueError when either input already carries the internal
    bucket column `_b` (withColumn would silently clobber it) or an
    input column collides with the three overlap output names (the
    output's select would silently shadow the input column).
    """
    out_names = {"overlap_start", "overlap_end", "overlap_len"}
    for side, df in (("left", left), ("right", right)):
        if "_b" in df.columns:
            raise ValueError(
                f"interval_overlap_join: {side} frame already has a '_b' "
                "column (internal bucket name) — rename it first"
            )
        clashes = out_names.intersection(df.columns)
        if clashes:
            raise ValueError(
                f"interval_overlap_join: {side} columns collide with output "
                f"names: {sorted(clashes)}"
            )
    l = (
        left.filter(F.col(left_end) >= F.col(left_start))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(left_start) / F.lit(bucket_size)).cast("long"),
                    F.floor(F.col(left_end) / F.lit(bucket_size)).cast("long"),
                )
            ),
        )
        .alias("_l")
    )
    r = (
        right.filter(F.col(right_end) >= F.col(right_start))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(right_start) / F.lit(bucket_size)).cast("long"),
                    F.floor(F.col(right_end) / F.lit(bucket_size)).cast("long"),
                )
            ),
        )
        .alias("_r")
    )
    ls, le = F.col(f"_l.{left_start}"), F.col(f"_l.{left_end}")
    rs, re_ = F.col(f"_r.{right_start}"), F.col(f"_r.{right_end}")
    joined = l.join(
        r,
        (F.col(f"_l.{left_key}") == F.col(f"_r.{right_key}"))
        & (F.col("_l._b") == F.col("_r._b"))
        & (ls <= re_)
        & (rs <= le)
        # single-emission bucket: the one containing greatest(ls, rs)
        & (
            F.col("_l._b")
            == F.greatest(
                F.floor(ls / F.lit(bucket_size)).cast("long"),
                F.floor(rs / F.lit(bucket_size)).cast("long"),
            )
        ),
    )
    return joined.select(
        *[F.col(f"_l.{c}") for c in left.columns],
        *[F.col(f"_r.{c}") for c in right.columns if c not in left.columns],
        F.greatest(ls, rs).alias("overlap_start"),
        F.least(le, re_).alias("overlap_end"),
        (F.least(le, re_) - F.greatest(ls, rs)).alias("overlap_len"),
    )
