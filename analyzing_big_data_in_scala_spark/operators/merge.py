"""MERGE INTO / CDC upsert compaction as a batch operator.

The lakehouse maintenance primitive (Delta/Iceberg `MERGE INTO`, Hudi
upsert): apply a change batch of inserts / updates / deletes to a base
snapshot, producing the next snapshot. Spark has no built-in MERGE on
plain parquet, but the semantics are exactly one outer join:

- latest change per key wins (when a sequence column is given, a window
  top-1 per key — partitioned by the key, never a global sort);
- ``D`` deletes the key, ``I``/``U`` both mean "the change payload is the
  new row state" (upsert semantics: U on an absent key inserts, I on a
  present key overwrites — no error channel, matching MERGE's
  WHEN MATCHED / WHEN NOT MATCHED arms);
- base rows with no change pass through untouched.

Scale shape: ONE shuffled equi-join on the key (both sides hash-partition;
AQE handles the typically much-smaller change side via broadcast), plus
the optional per-key window on the CHANGE side only — the base snapshot
is never windowed or sorted. This is the compaction step a streaming CDC
pipeline runs per micro-batch via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Next snapshot of `base` after applying `changes`.

    `changes` must carry `key`, `op_col` ('I' | 'U' | 'D') and the same
    payload columns as `base`; the result has exactly `base`'s schema.
    With `seq_col`, only the highest-sequence change per key applies
    (CDC log compaction); ties are broken by preferring 'D' then 'U'
    then 'I' so replays are deterministic.
    """
    payload = [c for c in base.columns if c != key]
    missing = [c for c in (key, op_col, *payload) if c not in changes.columns]
    if missing:
        raise ValueError(f"merge_upsert: changes missing columns {missing}")

    ch = changes
    if seq_col is not None:
        from pyspark.sql import Window

        op_rank = F.when(F.col(op_col) == "D", 0).when(F.col(op_col) == "U", 1).otherwise(2)
        w = Window.partitionBy(key).orderBy(F.desc(seq_col), op_rank)
        ch = (
            ch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    ch = ch.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in payload],
    )

    # Rename the base side's columns before joining: `changes` is often
    # derived from `base` itself (CDC against the same snapshot), and
    # resolving shared-lineage attribute refs across a self-join is exactly
    # the pattern Spark's AMBIGUOUS_SELF_JOIN detection exists to reject.
    # Unique names on both sides mean nothing resolves through lineage.
    b = base.select(
        F.col(key).alias("_bk"), *[F.col(c).alias(f"_b_{c}") for c in payload]
    )
    joined = b.join(ch, F.col("_bk") == F.col("_ck"), "full_outer")
    surviving = joined.filter(
        (F.col("_op").isNull()) | (F.col("_op") != "D")
    )
    return surviving.select(
        F.coalesce(F.col("_bk"), F.col("_ck")).alias(key),
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in payload
        ],
    )


def apply_agg_delta(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance for SUM/COUNT aggregates:
    next_agg = base_agg ⊕ delta, where `delta` carries per-key signed
    adjustments (+new for inserts, -old for deletes, new-old for updates)
    over the same `measures` columns. One outer join on the GROUP keys —
    the base facts are never rescanned, which is the whole point: at
    100 TB the view refresh cost tracks the CHANGE batch, not the corpus.

    Only works for re-aggregable measures (sum/count algebra); avg/min/max
    need their own state (min/max are not incrementally maintainable under
    deletes at all — recompute those). `count_col` names the measure whose
    post-merge zero means "group disappeared" (dropped to match a full
    recompute); omit it only when groups can never empty.
    """
    d = delta.select(*keys, *[F.col(m).alias(f"_d_{m}") for m in measures])
    joined = base_agg.join(d, keys, "full_outer")
    out = joined.select(
        *keys,
        *[
            (F.coalesce(F.col(m), F.lit(0)) + F.coalesce(F.col(f"_d_{m}"), F.lit(0))).alias(m)
            for m in measures
        ],
    )
    if count_col is not None:
        out = out.filter(F.col(count_col) > 0)
    return out


def scd2_history(
    changes: DataFrame,
    key: str,
    state_col: str,
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change/event log:
    (key, state, valid_from, valid_to, version, is_current) — one row per
    key per CONTIGUOUS run of the same state (gaps-and-islands collapse:
    consecutive events that don't change the state are merged into one
    validity interval), valid_to = next run's valid_from, NULL while
    current. This is the warehouse SCD2 build (Kimball type 2) and the
    point-in-time table an as-of join resolves against.

    Scale shape: ONE shuffle — both windows partition by `key` with the
    same ordering, so Catalyst plans a single Exchange+Sort and runs the
    lag-filter and the renumber/lead over the same sorted partitions.
    State per key during the sort is the key's row run, never the corpus.

    Determinism: ordering ties on (ts_col, tie_col) — pass the event id
    so replays across partitionings produce identical histories. Null
    states participate via null-safe comparison (NULL is a state; a
    NULL -> 'x' transition opens a new version).
    """
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    flagged = (
        changes.select(key, state_col, ts_col, *( [tie_col] if tie_col else [] ))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(state_col).over(w))
        .filter(
            (F.col("_rn") == 1) | ~F.col(state_col).eqNullSafe(F.col("_prev"))
        )
    )
    order2 = [F.col("valid_from").asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    keyed = flagged.select(
        key,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        *([tie_col] if tie_col else []),
    )
    w2 = Window.partitionBy(key).orderBy(*order2)
    return (
        keyed.withColumn("version", F.row_number().over(w2).cast("int"))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, "state", "valid_from", "valid_to", "version", "is_current")
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key: str,
    state_col: str,
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold an APPEND-ONLY change batch into
    an existing :func:`scd2_history` table, producing exactly the history a
    full rebuild over (old events ++ batch) would — the Delta Live Tables
    "APPLY CHANGES" / Kimball incremental type-2 load, as one batch-sized
    plan.

    Contract: every batch (ts, tie) ordering key must be STRICTLY greater
    than every ordering key folded into `history` (append-only ingest; the
    standard watermark guarantee). Strictness matters: a batch event tied
    on ts with a base event but sorting before it on `tie_col` would land
    earlier in a full rebuild's run order than the fold can place it, so
    ts-equality across the boundary is outside the guarantee. Runs:

    - the batch collapses to its own state runs (same gaps-and-islands as
      the full build);
    - a batch run continuing the key's CURRENT state is absorbed (no new
      version — the open interval simply stays open);
    - otherwise the open interval closes at the first surviving run's
      valid_from, and new versions continue the key's version sequence;
    - keys absent from the batch pass through untouched, keys new in the
      batch start at version 1.

    Scale shape: every step is an equi-join or window on `key` over the
    BATCH (plus the history's current rows — one row per live key); the
    closed history rows are touched by nothing but the final union. Per-
    batch cost tracks the batch and the live-key set, never the full
    history. Equality with the full rebuild is oracle-checked
    (`events_scd2_incremental`).
    """
    hist_cols = [key, "state", "valid_from", "valid_to", "version", "is_current"]
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    runs = (
        batch.select(key, state_col, ts_col, *([tie_col] if tie_col else []))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(state_col).over(w))
        .filter((F.col("_rn") == 1) | ~F.col(state_col).eqNullSafe(F.col("_prev")))
        .select(
            key,
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            *([tie_col] if tie_col else []),
        )
    )
    open_rows = history.filter(F.col("is_current")).select(
        key,
        F.col("state").alias("_open_state"),
        F.col("valid_from").alias("_open_from"),
        F.col("version").alias("_open_version"),
        # Distinguishes "key has an open row whose state is NULL" from "key
        # is new in the batch" after the left join below: without it, a new
        # key whose first state is NULL hits eqNullSafe(NULL, NULL) = true
        # and its version-1 run is wrongly absorbed.
        F.lit(True).alias("_has_open"),
    )
    # Absorb a first run that continues the current state; renumber what
    # survives so versions continue the key's sequence.
    order2 = [F.col("valid_from").asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w2 = Window.partitionBy(key).orderBy(*order2)
    ranked = runs.withColumn("_rn", F.row_number().over(w2)).join(
        open_rows, key, "left"
    )
    surviving = ranked.filter(
        ~(
            (F.col("_rn") == 1)
            & F.col("_has_open").isNotNull()
            & F.col("state").eqNullSafe(F.col("_open_state"))
        )
    )
    w3 = Window.partitionBy(key).orderBy(*order2)
    new_rows = surviving.select(
        key,
        "state",
        "valid_from",
        (F.coalesce(F.col("_open_version"), F.lit(0))
         + F.row_number().over(w3)).cast("int").alias("version"),
        F.lead("valid_from").over(w3).alias("valid_to"),
    ).select(
        key,
        "state",
        "valid_from",
        "valid_to",
        "version",
        F.col("valid_to").isNull().alias("is_current"),
    )
    # new_rows is BATCH-sized with two consumers (the close derivation and
    # the final union) — materialize it once.
    new_rows = new_rows.localCheckpoint(eager=False)
    # Close (or keep open) the previously-current row per touched key.
    closes = new_rows.groupBy(key).agg(F.min("valid_from").alias("_close_at"))
    updated_open = (
        history.filter(F.col("is_current"))
        .join(closes, key, "left")
        .select(
            key,
            "state",
            "valid_from",
            # _close_at is the first NEW version's start — NULL when the
            # whole batch was absorbed (or the key is untouched), keeping
            # the interval open. A min over versions > open_version is
            # exactly the first surviving run because versions continue
            # the open row's sequence.
            F.col("_close_at").alias("valid_to"),
            "version",
            F.col("_close_at").isNull().alias("is_current"),
        )
    )
    closed_rows = history.filter(~F.col("is_current")).select(*hist_cols)
    return closed_rows.unionByName(updated_open.select(*hist_cols)).unionByName(
        new_rows.select(*hist_cols)
    )


def idempotent_foreach_batch(fold):
    """Make a foreachBatch fold EXACTLY-ONCE under micro-batch redelivery:
    Structured Streaming guarantees at-least-once delivery to foreachBatch
    — after a failure between the fold's side effect and the checkpoint
    commit, the SAME (batch_df, batch_id) is delivered again, and a
    non-idempotent fold (like a += aggregate delta) double-counts it. The
    standard guard is batch-id dedup: `batch_id` is stable across
    redeliveries of the same data (that is its documented contract), so
    wrapping the fold skips exact replays while passing new batches
    through. State is per-wrapper (one streaming query's lifetime — the
    same scope as the fold's own accumulator closure)."""
    seen: set[int] = set()

    def guarded(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in seen:
            return
        fold(batch_df, batch_id)
        seen.add(batch_id)

    return guarded


def merge_change_feed(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """The change feed a MERGE emits (the Delta CDF idea on plain
    frames): one row per EFFECTIVE change, typed by what actually
    happened against the base snapshot rather than by the batch's
    claimed op —

        matched   + D       -> 'delete'  (before values, after NULL)
        matched   + U/I     -> 'update'  (before and after values)
        unmatched + U/I     -> 'insert'  (before NULL, after values)
        unmatched + D       -> no row    (deleting nothing is a no-op)

    Output: (key, change_type, before_<c>, after_<c> for every payload
    column). Downstream incremental consumers (aggregate refresh, index
    maintenance, replication) fold this feed instead of diffing
    snapshots — at 100 TB the feed is change-batch-sized, the diff is
    corpus-sized.

    Scale shape: ONE equi join of the batch against the base (the batch
    side is usually broadcast-able; the base side joins on its key
    partitioning) — the base is never rewritten or re-scanned beyond
    this join."""
    payload = [c for c in base.columns if c != key]
    missing = [c for c in (key, op_col, *payload) if c not in changes.columns]
    if missing:
        raise ValueError(f"merge_change_feed: changes missing columns {missing}")
    ch = changes.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in payload],
    )
    b = base.select(
        F.col(key).alias("_bk"), *[F.col(c).alias(f"_b_{c}") for c in payload]
    )
    joined = ch.join(b, F.col("_ck") == F.col("_bk"), "left")
    matched = F.col("_bk").isNotNull()
    change_type = (
        F.when(matched & (F.col("_op") == "D"), "delete")
        .when(matched, "update")
        .when(F.col("_op") != "D", "insert")
    )
    out = joined.withColumn("change_type", change_type).filter(
        F.col("change_type").isNotNull()
    )
    is_del = F.col("change_type") == "delete"
    is_ins = F.col("change_type") == "insert"
    return out.select(
        F.col("_ck").alias(key),
        "change_type",
        *[F.when(~is_ins, F.col(f"_b_{c}")).alias(f"before_{c}") for c in payload],
        *[F.when(~is_del, F.col(f"_c_{c}")).alias(f"after_{c}") for c in payload],
    )
