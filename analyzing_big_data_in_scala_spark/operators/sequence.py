"""Sequence analytics over event streams: first-order Markov transition
statistics between event types — the "what happens next" model behind
next-action prediction, anomalous-flow detection, and funnel design
(complements `association.py`, which ignores order).

Scale shape: ONE window shuffle partitioned by the sequence key (the same
partitioning a sessionization pass uses — at 100 TB this is the unavoidable
shuffle, and it is the only one), then two hash aggregates over the tiny
(|types|^2) transition space. Probabilities are integer ppm via the repo's
round-half-up BIGINT formula `(n*2e6 + tot) DIV (2*tot)` — no float
anywhere, so values hash identically on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def markov_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order transition matrix over per-key event sequences:

        (from_type, to_type, n_transitions, prob_ppm)

    where prob_ppm is the row-conditional probability
    P(to | from) = n_transitions / Σ_to' n(from, to'), in round-half-up
    integer ppm. Consecutive pairs come from LEAD over (key, order_cols) —
    the last event of each key emits nothing. Deterministic as long as
    `order_cols` is a total order within a key (the default ends with the
    unique event_id)."""
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    return _transition_matrix_finalize(pairs)


def _transition_matrix_finalize(pairs: DataFrame) -> DataFrame:
    """(from_type, to_type) pair stream -> the transition matrix with
    row-conditional ppm — shared by the plain and bucketed forms, so the
    two can only differ in how they derive the pairs."""
    counts = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
        # |types|^2 rows consumed by BOTH the totals aggregate and the
        # final join: without the lineage cut each consumer re-runs the
        # scan -> window -> count chain (measured: the whole upstream
        # appeared twice in the physical plan, 6 exchanges instead of 3).
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.call_function(
                "div",
                F.col("n_transitions") * F.lit(2_000_000).cast("long")
                + F.col("_tot"),
                F.lit(2).cast("long") * F.col("_tot"),
            ).alias("prob_ppm"),
        )
    )


def markov_transitions_bucketed(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_size: int = 86400,
) -> DataFrame:
    """SKEW-RESISTANT :func:`markov_transitions` (r13, VERDICT r12
    item 7) — the carry-stitch family applied to LEAD, after the r13
    probe measured the plain (key)-partitioned LEAD window at 13.1×
    wall growth under a 50%-mass Zipf key at 64× data (`window_lead`
    in SCALING.md; same single-hot-task sort class as rank_window /
    window_rle, the skew salting cannot fix because order forbids salt
    splits).

    Value-identical to the plain form: the LEAD runs LOCALLY within
    (key, bucket) where bucket = floor(epoch(ts)) DIV bucket_size (a
    monotone function of ts, so (bucket, ts, id) order == (ts, id)
    order); the ONE transition per bucket boundary — previous NON-EMPTY
    bucket's last event type → this bucket's first event type — is
    stitched from tiny per-(key, bucket) summaries via a LAG over the
    per-key bucket window (#buckets rows per key, never row count). A
    hot key's otherwise single corpus-sized sort task splits across its
    time buckets.

    The same stitch generalizes to LEAD-n (the trigram path query) with
    first-n/last-n summaries per bucket: a path spanning 3+ buckets
    forces every middle bucket to hold exactly one event, so n boundary
    rows per side always suffice — shipped when a fixture demonstrates
    that straggler; the LEAD-1 form here is the family's measured
    mitigation."""
    reserved = {"_mtb_t", "_mtb_b", "_mtb_first", "_mtb_last",
                "from_type", "to_type"}
    clashes = reserved.intersection(events.columns)
    if clashes:
        raise ValueError(
            f"markov_transitions_bucketed: input columns collide with "
            f"internal names: {sorted(clashes)}"
        )
    base = events.select(
        F.col(key_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(id_col),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("_mtb_t"),
    ).withColumn("_mtb_b", F.expr(f"_mtb_t DIV {int(bucket_size)}"))
    w_local = Window.partitionBy(key_col, "_mtb_b").orderBy(ts_col, id_col)
    local = (
        base.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w_local).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    summaries = base.groupBy(key_col, "_mtb_b").agg(
        F.min(F.struct(ts_col, id_col, type_col))
        .getField(type_col)
        .alias("_mtb_first"),
        F.max(F.struct(ts_col, id_col, type_col))
        .getField(type_col)
        .alias("_mtb_last"),
    )
    w_bucket = Window.partitionBy(key_col).orderBy("_mtb_b")
    boundary = (
        summaries.select(
            F.lag("_mtb_last").over(w_bucket).alias("from_type"),
            F.col("_mtb_first").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    return _transition_matrix_finalize(local.unionByName(boundary))


def transition_trigrams_bucketed(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_size: int = 86400,
) -> DataFrame:
    """SKEW-RESISTANT LEAD-2 trigram stream (r14, VERDICT r13 item 4) —
    the first-n/last-n generalization of :func:`markov_transitions_bucketed`
    designed in r13: the plain (key)-partitioned LEAD-2 window
    (events_top_transition_paths) measured 12.3× wall growth at 64× under
    a 50%-mass Zipf key (`window_lead` in SCALING.md), because the hot
    key's entire timeline sorts on ONE task.

    Returns the (t0, t1, t2) stream of consecutive event-type triples per
    key timeline, value-identical to two LEADs over the plain window:

    - LOCAL triples: both LEADs run within (key, bucket) where bucket =
      epoch(ts) DIV bucket_size (monotone in ts, so bucket order ==
      time order) — a hot key's sort splits across its time buckets.
    - BOUNDARY triples from tiny per-(key, bucket) FIRST-2/LAST-2
      summaries stitched over the per-key bucket window (#buckets rows
      per key, never row count). For a triple spanning buckets A<B
      (adjacent among the key's NON-EMPTY buckets): two events in A →
      (A.last2, A.last1, B.first1); two in B → (A.last1, B.first1,
      B.first2). A triple spanning THREE buckets A<B<C forces B to hold
      exactly one event (its event is consecutive with both neighbors),
      so (A.last1, B.last1, C.first1) with the LAG-2 summary — first-2/
      last-2 per side always suffices, the r13 design note proven here.

    The summaries come from the SAME local sort the LEADs use
    (row_number + a sortless windowed count), so the operator adds no
    extra corpus-sized exchange: one (key, bucket) window shuffle + one
    tiny summary aggregate."""
    reserved = {"_tp_t", "_tp_b", "_tp_rn", "_tp_n", "t0", "t1", "t2",
                "_f1", "_f2", "_l1", "_l2"}
    clashes = reserved.intersection(events.columns)
    if clashes:
        raise ValueError(
            f"transition_trigrams_bucketed: input columns collide with "
            f"internal names: {sorted(clashes)}"
        )
    base = events.select(
        F.col(key_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(id_col),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("_tp_t"),
    ).withColumn("_tp_b", F.expr(f"_tp_t DIV {int(bucket_size)}"))
    w_local = Window.partitionBy(key_col, "_tp_b").orderBy(ts_col, id_col)
    # the windowed count carries no ORDER BY -> no second sort
    w_part = Window.partitionBy(key_col, "_tp_b")
    marked = base.select(
        F.col(key_col),
        F.col(type_col),
        F.col("_tp_b"),
        F.col(type_col).alias("t0"),
        F.lead(type_col, 1).over(w_local).alias("t1"),
        F.lead(type_col, 2).over(w_local).alias("t2"),
        F.row_number().over(w_local).alias("_tp_rn"),
        F.count("*").over(w_part).alias("_tp_n"),
    )
    local = marked.where(F.col("t2").isNotNull()).select("t0", "t1", "t2")
    summaries = (
        marked.where(
            (F.col("_tp_rn") <= 2) | (F.col("_tp_rn") >= F.col("_tp_n") - 1)
        )
        .select(
            F.col(key_col),
            "_tp_b",
            F.when(F.col("_tp_rn") == 1, F.col(type_col)).alias("_w_f1"),
            F.when(F.col("_tp_rn") == 2, F.col(type_col)).alias("_w_f2"),
            F.when(F.col("_tp_rn") == F.col("_tp_n"), F.col(type_col)).alias(
                "_w_l1"
            ),
            F.when(
                F.col("_tp_rn") == F.col("_tp_n") - 1, F.col(type_col)
            ).alias("_w_l2"),
        )
        .groupBy(key_col, "_tp_b")
        .agg(
            F.max("_w_f1").alias("_f1"),
            F.max("_w_f2").alias("_f2"),
            F.max("_w_l1").alias("_l1"),
            F.max("_w_l2").alias("_l2"),
        )
    )
    w_bucket = Window.partitionBy(key_col).orderBy("_tp_b")
    stitched = summaries.select(
        F.col("_f1"),
        F.col("_f2"),
        F.lag("_l1").over(w_bucket).alias("_p_l1"),
        F.lag("_l2").over(w_bucket).alias("_p_l2"),
        F.lag("_f2").over(w_bucket).alias("_p_f2"),
        F.lag("_l1", 2).over(w_bucket).alias("_pp_l1"),
    ).localCheckpoint(eager=False)  # 3 boundary consumers, tiny frame
    # two-in-prev: (A.last2, A.last1, B.first1) — needs A.n >= 2
    tri_a = stitched.where(F.col("_p_f2").isNotNull()).select(
        F.col("_p_l2").alias("t0"),
        F.col("_p_l1").alias("t1"),
        F.col("_f1").alias("t2"),
    )
    # two-in-cur: (A.last1, B.first1, B.first2) — needs B.n >= 2
    tri_b = stitched.where(
        F.col("_p_l1").isNotNull() & F.col("_f2").isNotNull()
    ).select(
        F.col("_p_l1").alias("t0"),
        F.col("_f1").alias("t1"),
        F.col("_f2").alias("t2"),
    )
    # three-bucket span: (A.last1, B.only, C.first1) — needs B.n == 1
    tri_c = stitched.where(
        F.col("_p_l1").isNotNull()
        & F.col("_p_f2").isNull()
        & F.col("_pp_l1").isNotNull()
    ).select(
        F.col("_pp_l1").alias("t0"),
        F.col("_p_l1").alias("t1"),
        F.col("_f1").alias("t2"),
    )
    return local.unionByName(tri_a).unionByName(tri_b).unionByName(tri_c)


def run_length_encode(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    id_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands run-length encoding of per-key event sequences:

        (key, run_id, event_type, run_len, first_event_id)

    one row per maximal run of consecutive same-type events within a key —
    the compression pass behind "collapse repeated heartbeats", dwell-time
    analysis, and bot-burst detection. run_id is the 1-based run ordinal
    within the key (running sum of change flags).

    Scale shape: ONE shuffle on the sequence key. The lag flag and the
    running sum share the window's partitioning/ordering (one exchange,
    two Window nodes), and the closing groupBy keys (key, run_id) are a
    SUPERSET of the window's hash partitioning, which satisfies the
    aggregate's clustered distribution — Catalyst plans the final
    aggregate WITHOUT a new exchange (verified in tests via the plan).
    Deterministic: order_cols end with the unique event id, change flags
    use null-safe equality so the first row of a key always opens run 1.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    flagged = events.select(
        key_col,
        id_col,
        type_col,
        *[c for c in order_cols if c not in (key_col, id_col, type_col)],
        F.when(F.lag(type_col).over(w).eqNullSafe(F.col(type_col)), F.lit(0).cast("long"))
        .otherwise(F.lit(1).cast("long"))
        .alias("_chg"),
    )
    runs = flagged.select(
        key_col,
        id_col,
        type_col,
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("run_id"),
    )
    return runs.groupBy(key_col, "run_id").agg(
        F.min(type_col).alias(type_col),  # constant within a run; min = the value
        F.count("*").alias("run_len"),
        F.min(id_col).alias("first_event_id"),
    )


def run_length_encode_bucketed(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    id_col: str = "event_id",
    bucket_size: int = 86400,
) -> DataFrame:
    """:func:`run_length_encode` with TIME-RANGE PRE-BUCKETING — the
    skew-resistant form (the r10 Zipf probe's `window_rle` case degrades
    ~10x at 64x data under a 50%-mass hot key: the key's entire sequence
    sorts on ONE task and salting can't split an order-dependent window).

    Identical output (same run ids, lengths, first ids), two-level
    carry-stitch shape:

    1. LOCAL RLE within (key, time-bucket): the hot key's sort splits
       across ~span/bucket_size tasks. Buckets derive from
       `order_cols[0]` (epoch seconds via unix_timestamp for
       timestamp columns, floor-div for numerics) — monotone in the
       sort order, so bucket-concatenation preserves the global order;
       NULL order values bucket to NULL, which sorts first on both
       levels exactly like the plain form's NULLS FIRST.
    2. STITCH: consecutive local runs within a bucket NEVER share a
       type (RLE invariant), so merging across boundaries is just a
       second RLE over the per-key sequence of LOCAL RUNS ordered by
       (bucket, local_run_id) — same running-sum numbering as the plain
       form, so run ids come out identical. The second window is per-key
       serial but over #runs rows, not #rows: the straggler's work drops
       by the key's compression ratio (that is the honest bound — a key
       whose types alternate every row gains nothing; for the operator's
       use cases — heartbeat collapse, dwell runs — runs << rows).

    Raises ValueError on non-positive bucket_size or when the input
    carries the internal scratch names (_bk/_chg/_lrun/run_id).
    """
    if bucket_size <= 0:
        raise ValueError(
            f"run_length_encode_bucketed: bucket_size must be > 0, got {bucket_size}"
        )
    reserved = {"_bk", "_chg", "_lrun", "run_id", "run_len", "first_event_id"}
    clashes = reserved.intersection(events.columns)
    if clashes:
        raise ValueError(
            "run_length_encode_bucketed: input columns collide with internal "
            f"names: {sorted(clashes)}"
        )
    lead_col = order_cols[0]
    dtype = events.schema[lead_col].dataType.simpleString()
    t = (
        F.unix_timestamp(lead_col).cast("long")
        if dtype.startswith("timestamp")
        else F.col(lead_col).cast("long")
    )
    bucketed = events.withColumn(
        "_bk", F.floor(t / F.lit(bucket_size)).cast("long")
    )
    w1 = Window.partitionBy(key_col, "_bk").orderBy(*[F.asc(c) for c in order_cols])
    flagged = bucketed.select(
        key_col,
        "_bk",
        id_col,
        type_col,
        *[c for c in order_cols if c not in (key_col, id_col, type_col)],
        F.when(
            F.lag(type_col).over(w1).eqNullSafe(F.col(type_col)),
            F.lit(0).cast("long"),
        )
        .otherwise(F.lit(1).cast("long"))
        .alias("_chg"),
    )
    local = flagged.select(
        key_col,
        "_bk",
        id_col,
        type_col,
        F.sum("_chg")
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_lrun"),
    ).groupBy(key_col, "_bk", "_lrun").agg(
        F.min(type_col).alias(type_col),
        F.count("*").alias("_len"),
        F.min(id_col).alias("_fid"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.asc("_bk"), F.asc("_lrun"))
    stitched = local.select(
        key_col,
        "_bk",
        "_lrun",
        type_col,
        "_len",
        "_fid",
        F.when(
            F.lag(type_col).over(w2).eqNullSafe(F.col(type_col)),
            F.lit(0).cast("long"),
        )
        .otherwise(F.lit(1).cast("long"))
        .alias("_chg"),
    ).select(
        key_col,
        type_col,
        "_len",
        "_fid",
        F.sum("_chg")
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    return stitched.groupBy(key_col, "run_id").agg(
        F.min(type_col).alias(type_col),
        F.sum("_len").alias("run_len"),
        F.min("_fid").alias("first_event_id"),
    )


def interp_e2_sql(div_op: str) -> str:
    """Round-half-up linear interpolation in pure BIGINT, shared shape on
    both engines (Spark `DIV` / DuckDB `//` both truncate toward zero —
    measured r10 — so both carry the negative-remainder floor
    correction; values CAN fall between neighbors, so the numerator sign
    matters). Expects columns po_v/po_b (previous anchor value/bucket),
    no_v/no_b (next anchor), bucket; den > 0 on every gap row by
    construction."""
    num = "(2 * (no_v - po_v) * (bucket - po_b) + (no_b - po_b))"
    den = "(2 * (no_b - po_b))"
    return (
        f"po_v + CAST({num} {div_op} {den}"
        f" - (CASE WHEN {num} % {den} <> 0 AND {num} < 0 THEN 1 ELSE 0 END)"
        " AS BIGINT)"
    )


def resample_linear_interp(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    bucket_seconds: int = 600,
) -> DataFrame:
    """LINEAR-interpolation resampling — the gapfill sibling for
    continuous signals (sensor levels, prices), where LOCF/zero-fill
    biases downstream models:

        (group_col, bucket, value_e2, interpolated)

    one row per bucket of the group's dense [min, max] spine; observed
    buckets carry their LAST observation's exact cents (row_number over
    (ts, id) DESC — deterministic), empty buckets the straight-line
    value between nearest observed neighbors (sign-safe round-half-up
    BIGINT — the TWA division recipe). Spine edges are always observed
    (per-group min/max buckets), so every gap has both neighbors.

    Scale shape: spine generation is O(range/step) per group
    (sequence+explode, in-plan); ONE group-partitioned sort serves BOTH
    window carries (ascending prev anchors, following-frame next
    anchors); the exact interpolation evaluates in the final projection.
    """
    epoch = F.unix_timestamp(ts_col).cast("long")
    base = events.select(
        group_col,
        F.floor(epoch / bucket_seconds).cast("long").alias("bucket"),
        F.round(F.col(value_col) * 100).cast("long").alias("_v"),
        ts_col,
        id_col,
    )
    # max_by picks the LAST observation per bucket — same deterministic
    # (ts, id)-DESC winner as the r13 row_number window, but as an
    # ObjectHashAggregate with map-side partials instead of a
    # full sort of the corpus inside each (group, bucket) partition
    # (r14, guide §2.3 "aggregate before you shuffle": only one
    # surviving row per bucket reaches the exchange).
    obs = base.groupBy(group_col, "bucket").agg(
        F.max_by("_v", F.struct(F.col(ts_col), F.col(id_col))).alias("v")
    )
    bounds = base.groupBy(group_col).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = bounds.select(
        group_col, F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    j = spine.join(obs, [group_col, "bucket"], "left")
    wb = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # po_*/no_* are set ATOMICALLY (non-null exactly on observed rows), so
    # per-column ignorenulls carries always read the same anchor row — the
    # struct-carry splice trap of the as-of join doesn't apply here.
    carried = j.select(
        group_col,
        "bucket",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("po_v"),
        F.last(F.when(F.col("v").isNotNull(), F.col("bucket")), ignorenulls=True)
        .over(wb)
        .alias("po_b"),
        F.first("v", ignorenulls=True).over(wf).alias("no_v"),
        F.first(F.when(F.col("v").isNotNull(), F.col("bucket")), ignorenulls=True)
        .over(wf)
        .alias("no_b"),
    )
    return carried.select(
        group_col,
        "bucket",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.expr(interp_e2_sql("DIV")))
        .alias("value_e2"),
        F.col("v").isNull().alias("interpolated"),
    )


def pairwise_comovement(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Cross-signal co-movement: Pearson correlation between every PAIR
    of event types' per-bucket activity counts over the DENSE common
    spine (zero-filled — correlating only shared-active buckets biases
    toward +1):

        (type_a, type_b, n, corr_ppm)   for type_a < type_b

    Exact-BIGINT sufficient statistics; the only float math is the
    shared :data:`CORR_PPM_SQL` tree (bit-identical cross-engine).

    Scale shape: one global bounds aggregate (1 row) + spine explode;
    counts densify via a (type, bucket) left join; the pair join is
    BUCKET-keyed — per-bucket fan-out is |types|², never row-quadratic —
    and the five sums collapse in one two-phase hash aggregate. The
    densified frame is lineage-cut once (two consumers)."""
    base = events.select(
        type_col,
        F.floor(F.unix_timestamp(ts_col) / bucket_seconds).cast("long").alias(
            "bucket"
        ),
    )
    bounds = base.agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
    spine = bounds.select(F.explode(F.sequence("b0", "b1")).alias("bucket"))
    types = base.select(type_col).distinct()
    counts = base.groupBy(type_col, "bucket").agg(F.count("*").alias("c"))
    dense = (
        F.broadcast(types)
        .crossJoin(spine)
        .join(counts, [type_col, "bucket"], "left")
        .select(
            type_col, "bucket", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
        .localCheckpoint(eager=False)
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{type_col}") < F.col(f"b.{type_col}")),
    )
    stats = pairs.groupBy(
        F.col(f"a.{type_col}").alias("type_a"),
        F.col(f"b.{type_col}").alias("type_b"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("a.c").alias("sx"),
        F.sum("b.c").alias("sy"),
        F.sum(F.col("a.c") * F.col("b.c")).alias("sxy"),
        F.sum(F.col("a.c") * F.col("a.c")).alias("sxx"),
        F.sum(F.col("b.c") * F.col("b.c")).alias("syy"),
    )
    return stats.select(
        "type_a", "type_b", "n", F.expr(CORR_PPM_SQL).alias("corr_ppm")
    )


# Shared Spark/DuckDB expression for the pooled Pearson autocorrelation in
# integer ppm, over EXACT BIGINT sufficient statistics (n, sx, sy, sxy,
# sxx, syy). The integer SUMS are order-independent (exact), and every
# double op downstream (*, -, /, sqrt) is IEEE correctly rounded — the
# same expression tree therefore produces bit-identical doubles on both
# engines, and the single ROUND site sees the same value. Zero-variance
# groups (degenerate denominator) yield NULL, identically.
ACF_PPM_SQL = (
    "CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0"
    "      AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
    "          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0"
    " THEN CAST(ROUND(1000000.0"
    "   * (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    "   / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "      * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
    "             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)"
    " ELSE NULL END"
)


def pooled_acf(
    events: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3),
    group_col: str = "event_type",
    series_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Pooled autocorrelation function: Pearson correlation between a
    series value and its lag-L predecessor WITHIN each (group, series)
    sequence, pooled into one coefficient per (group, lag):

        (group_col, lag, n_pairs, acf_ppm)

    The pooling unit is the per-`series_col` sequence (a user's own event
    history), not a global per-group timeline — that is both the
    statistically honest series (cross-user adjacency is arbitrary) and
    the scale-correct partitioning: the ONE window shuffle partitions by
    (group, series), so parallelism tracks series count and no partition
    ever holds more than one user's history. A global per-group series
    would serialize each group onto a single partition at 100 TB.

    Determinism: values integerize to exact BIGINT cents (x100) before
    any sum, `order_cols` ends with the unique event_id, and the one
    float formula is the shared `ACF_PPM_SQL` tree over exact integer
    sufficient statistics — see its comment. All `lags` come from ONE
    window pass (stacked into rows before the single aggregate)."""
    w = Window.partitionBy(group_col, series_col).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    x = F.round(F.col(value_col) * 100).cast("long")
    lagged = events.select(
        F.col(group_col),
        x.alias("_x"),
        *[F.lag(x, L).over(w).alias(f"_y{L}") for L in lags],
    )
    # Unpivot the lag columns into (lag, _y) rows: one explode instead of
    # one aggregate branch per lag — a single (group, lag) hash aggregate
    # with map-side partials follows.
    stacked = lagged.select(
        group_col,
        "_x",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(L).alias("lag"), F.col(f"_y{L}").alias("_y"))
                    for L in lags
                ]
            )
        ).alias("_p"),
    ).select(group_col, "_x", F.col("_p.lag").alias("lag"), F.col("_p._y").alias("_y"))
    stats = (
        # BOTH ends of a pair must be observed: filtering on the lagged
        # end alone counted a NULL-value row in n_pairs while its sums
        # silently dropped the NULL side — inconsistent sufficient
        # statistics (r9 ADVICE). A NULL value still occupies its series
        # position (the lag partner of its neighbors), matching the
        # oracle's LAG semantics.
        stacked.filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(group_col, "lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("_x").alias("sx"),
            F.sum("_y").alias("sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        )
    )
    return stats.select(
        group_col,
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.expr(ACF_PPM_SQL).alias("acf_ppm"),
    )


# Shared Spark/DuckDB expression for the OLS slope in integer ppm over
# exact BIGINT sufficient statistics (n, sx, sy, sxy, sxx): every product
# happens in DOUBLE (no BIGINT overflow) and *, -, / are IEEE correctly
# rounded, so the identical expression tree yields bit-identical doubles
# on both engines before the single ROUND site. A zero-variance x
# (degenerate denominator) yields NULL, identically.
SLOPE_PPM_SQL = (
    "CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0"
    " THEN CAST(ROUND(1000000.0"
    "   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    "   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)"
    " ELSE NULL END"
)

# Pearson correlation over the same statistics (plus syy) — ACF_PPM_SQL's
# formula with the trend operator's column names.
CORR_PPM_SQL = (
    ACF_PPM_SQL.replace("n_pairs", "n")
)


def grouped_trend(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-group OLS time trend over exact integer sufficient statistics
    (the drift detector / metric-regression pass — "is this series going
    up, and how coherently?"):

        (group_col, n, slope_ppm, corr_ppm)

    slope_ppm = 1e6 x the least-squares slope of value-CENTS per MINUTE;
    corr_ppm = 1e6 x the Pearson correlation between time and value
    (the trend's coherence; slope alone can be huge on noise). Both NULL
    for zero-variance inputs.

    Exactness recipe (the :func:`pooled_acf` pattern): x = minutes since
    the GROUP's earliest observation (exact BIGINT; centering per group
    keeps Σx² far under 2^63 — raw epoch seconds squared would overflow
    ANSI BIGINT at ~1e5 rows), y = cents. The five sums are exact
    integer aggregates (order-independent); the only float math is the
    shared `SLOPE_PPM_SQL` / `CORR_PPM_SQL` expression trees over those
    sums, bit-identical cross-engine.

    Scale shape: one map-side-partial MIN aggregate per group (tiny,
    broadcast back) + ONE hash aggregate over the corpus — no window,
    no per-group timeline sort, never a global sort. Σx² headroom: with
    x in minutes, a 10-year-span group supports ~1.7e9 rows before the
    BIGINT sum approaches 2^63."""
    t = F.unix_timestamp(ts_col).cast("long")
    base = events.select(
        F.col(group_col),
        t.alias("_t"),
        F.round(F.col(value_col) * 100).cast("long").alias("_y"),
        # Both coordinates must be observed — counting a NULL row in n
        # while the sums drop it would corrupt the sufficient statistics
        # (the pooled_acf r9 ADVICE lesson, applied from the start).
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    t0 = base.groupBy(group_col).agg(F.min("_t").alias("_t0"))
    xy = base.join(F.broadcast(t0), group_col).select(
        group_col,
        F.call_function("div", F.col("_t") - F.col("_t0"), F.lit(60).cast("long")).alias("_x"),
        "_y",
    )
    stats = xy.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    return stats.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.expr(SLOPE_PPM_SQL).alias("slope_ppm"),
        F.expr(CORR_PPM_SQL).alias("corr_ppm"),
    )


def trend_sufficient_stats(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    base_epoch: int = 1_600_000_000,
) -> DataFrame:
    """The six exact-BIGINT OLS sufficient statistics per group —
    (group, n, sx, sy, sxy, sxx, syy) — with x = minutes since a FIXED
    epoch base instead of :func:`grouped_trend`'s per-group minimum.
    Fixed-base centering is what makes the statistics MERGEABLE: two
    stat rows for the same group add component-wise, so micro-batch
    deltas fold into a standing aggregate without ever revisiting raw
    history (the streaming form; per-group-min centering would need a
    second pass over all data every refresh). Headroom: Σx² with x in
    minutes-since-2020 (~3e6 by 2026, so x² ≈ 1e13) stays under 2^63
    for ~1e6 rows per group; rebase `base_epoch` nearer the data (or
    coarsen x to hours) to widen — the knob is part of the contract,
    ENFORCED loudly (r10 handoff item): alongside the sums, the
    aggregate tracks max|x| and max|y| per group and the post-agg
    projection raises when the conservative worst-case bound
    n·max(|x|,|y|)² could pass 2^63 — so a group that outgrew the
    centering knob fails with the remediation in the message instead of
    returning silently-wrapped statistics (non-ANSI mode) or an opaque
    engine overflow (ANSI mode). The check is one CASE per group ROW
    (post-aggregation — not the per-input-row conditional the
    projection-operator docstring rules out for hot paths). The guard
    bounds each BATCH; a standing FOLDED aggregate doubles per merge at
    worst, so keep ~1 fold of headroom or re-center the fold's base.
    """
    t = F.unix_timestamp(ts_col).cast("long")
    base = events.select(
        F.col(group_col),
        F.call_function(
            "div", t - F.lit(base_epoch).cast("long"), F.lit(60).cast("long")
        ).alias("_x"),
        F.round(F.col(value_col) * 100).cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    agg = base.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.max(F.abs(F.col("_x"))).alias("_mx"),
        F.max(F.abs(F.col("_y"))).alias("_my"),
    )
    # Conservative overflow bound: Σx² ≤ n·max|x|², Σ|xy| ≤
    # n·max|x|·max|y|, Σy² ≤ n·max|y|² — so guarding on
    # n·max(|x|,|y|)² covers all three sums (shared guard helper).
    from ._util import sum_sq_overflow_guard

    agg = agg.withColumn("_m", F.greatest(F.col("_mx"), F.col("_my")))
    guarded_n = sum_sq_overflow_guard(
        "n",
        "_m",
        opname="trend_sufficient_stats",
        remediation="rebase base_epoch nearer the data or coarsen x to hours",
        group_col=group_col,
    )
    return agg.select(group_col, guarded_n, "sx", "sy", "sxy", "sxx", "syy")


def trend_from_stats(stats: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Finalize (group, n, slope_ppm, corr_ppm) from a sufficient-stats
    frame — the same shared SLOPE/CORR expression trees as
    :func:`grouped_trend`, so a FOLDED stats frame yields bit-identical
    results to a one-shot batch computation."""
    return stats.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.expr(SLOPE_PPM_SQL).alias("slope_ppm"),
        F.expr(CORR_PPM_SQL).alias("corr_ppm"),
    )


def time_weighted_avg(
    events: DataFrame,
    group_col: str = "event_type",
    series_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average (the TSDB `time_weight`/TWA aggregate,
    last-observation-carried-forward form): each observation's value
    holds until the NEXT observation in its own (group, series)
    sequence, so its weight is that gap in seconds; the per-group TWA is
    Σ(value·gap) / Σ(gap). A plain AVG over irregular samples
    over-weights bursts — TWA is the correct mean for
    unevenly-sampled series (sensor states, prices, feature values).

    Returns (group_col, n_segments, total_span_sec, twa_e4): exact
    BIGINTs — values integerize to cents before the multiply, gaps are
    exact epoch-second differences, and the single division is the
    repo's round-half-up pure-BIGINT formula, so the result
    value-checks bit-for-bit cross-engine. twa_e4 is the TWA in 1e-4
    units of the original value (e4, not ppm: the ppm numerator
    Σ(v_cents·gap)·2e4 would pass 2^63 under ANSI mode at ~40x this
    fixture; e4 keeps ~40x headroom at sf0.1 while still exceeding
    float32 value precision). Each series' LAST observation has no
    successor and is excluded (zero-width segment) — the standard
    right-open LOCF convention.

    Scale shape: ONE window shuffle partitioned by (group, series) —
    the same partitioning as :func:`pooled_acf`/sessionization, never a
    global per-group timeline — then one hash aggregate with map-side
    partials."""
    w = Window.partitionBy(group_col, series_col).orderBy(
        F.asc(ts_col), F.asc(tie_col)
    )
    t = F.unix_timestamp(ts_col).cast("long")
    seg = events.select(
        F.col(group_col),
        (F.round(F.col(value_col) * 100).cast("long")).alias("_v"),
        (F.lead(t).over(w) - t).alias("_gap"),
    ).filter(F.col("_gap").isNotNull())
    # twa_e4 = round_half_up(1e4 · Σ(v_cents·gap)/(100·Σgap)) — the 100
    # from cents and the 1e4 target scale fold into one ×100 on the
    # numerator; round-half-up (ties toward +∞) as
    # floor((2·num + den)/(2·den)). The floor must be SIGN-SAFE: Spark's
    # DIV *and* DuckDB's // BOTH truncate toward zero (measured r10 —
    # the r9 ADVICE's "DuckDB floors" premise was wrong), so a negative
    # numerator (negative series — temperature, PnL) was off by one vs
    # the documented round-half-up on BOTH engines; the oracle carries
    # the same correction. The divisor is > 0 by the guard, so flooring
    # = DIV minus one when the remainder is nonzero and the numerator
    # negative — pure BIGINT, no float floor ulp traps.
    # A group whose observations all share timestamps has total span 0 —
    # its time-weighted mean is undefined, emitted as NULL (the guard
    # matters: ANSI-mode DIV-by-zero THROWS; caught by the hypothesis fold
    # differential, not the fixture).
    agg = seg.groupBy(group_col).agg(
        F.count("*").alias("n_segments"),
        F.sum("_gap").alias("total_span_sec"),
        F.sum(F.col("_v") * F.col("_gap")).alias("_wsum"),
    )
    return agg.select(
        group_col,
        "n_segments",
        "total_span_sec",
        F.expr(
            "CASE WHEN total_span_sec > 0 THEN CAST("
            "(_wsum * 200L + total_span_sec) DIV (2L * total_span_sec)"
            " - (CASE WHEN (_wsum * 200L + total_span_sec) % (2L * total_span_sec) != 0"
            "         AND (_wsum * 200L + total_span_sec) < 0 THEN 1L ELSE 0L END)"
            " AS BIGINT) ELSE NULL END"
        ).alias("twa_e4"),
    )


def prefix_scan_bucketed(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    bucket_col: str,
    out_sum: str = "run_sum",
    out_min: str | None = None,
    anchor_zero: bool = True,
) -> DataFrame:
    """SKEW-RESISTANT running PREFIX AGGREGATES per key — the carry-stitch
    decomposition (r10 as-of/RLE pattern) generalized from order
    statistics to prefix sums and prefix minima (r11; the CUSUM drawup
    and ±1 concurrency sweeps are both this shape).

    Returns `df`'s columns plus `out_sum` = the running sum of
    `value_col` under the total (bucket, *order_cols) order within each
    key, and (when `out_min` is given) the running MINIMUM of that
    running sum — anchored at the implicit empty-prefix value 0 when
    `anchor_zero` (Page's CUSUM S₀ = 0 contract; set False for the pure
    observed-prefix minimum).

    `bucket_col` must be NON-DECREASING along `order_cols` within each
    key (e.g. the day of a timestamp the order starts with) — bucketing
    is what splits a hot key's otherwise single window task into
    ~#buckets tasks:

    1. LOCAL pass: running sum (and running min) within (key, bucket) —
       one corpus-sized window whose partitions are (key, bucket).
    2. Tiny per-(key, bucket) summaries (bucket total, bucket min of the
       local prefix) stitch through per-key windows over #buckets rows:
       carry C_b = Σ of STRICTLY PRECEDING bucket totals; prev-min
       M_b = min of strictly preceding (C + bucket-min).
    3. Row finalize: sum = C_b + local; min = least(anchor, M_b,
       C_b + local running min). Associativity of (+, min) over prefix
       segments makes this exactly the single-window answer.

    Raises ValueError when `df` carries the internal scratch names."""
    reserved = {"_psb_lrun", "_psb_lmin", "_psb_dtot", "_psb_dmin",
                "_psb_carry", "_psb_prevmin", "_psb_sk", "_psb_sb"}
    clashes = reserved.intersection(df.columns)
    if clashes:
        raise ValueError(
            f"prefix_scan_bucketed: input columns collide with internal "
            f"names: {sorted(clashes)}"
        )
    if out_sum in df.columns or (out_min and out_min in df.columns):
        raise ValueError(
            "prefix_scan_bucketed: output names already exist on the input"
        )
    w_local = (
        Window.partitionBy(key_col, bucket_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn("_psb_lrun", F.sum(value_col).over(w_local))
    if out_min is not None:
        local = local.withColumn("_psb_lmin", F.min("_psb_lrun").over(w_local))
    local = local.localCheckpoint(eager=False)  # summaries + row stitch

    summary_aggs = [F.sum(value_col).alias("_psb_dtot")]
    if out_min is not None:
        summary_aggs.append(F.min("_psb_lrun").alias("_psb_dmin"))
    days = local.groupBy(key_col, bucket_col).agg(*summary_aggs)
    w_carry = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    days = days.withColumn(
        "_psb_carry", F.coalesce(F.sum("_psb_dtot").over(w_carry), F.lit(0))
    )
    if out_min is not None:
        days = days.withColumn(
            "_psb_prevmin",
            F.min(F.col("_psb_carry") + F.col("_psb_dmin")).over(w_carry),
        )
    stitch_cols = [
        F.col(key_col).alias("_psb_sk"),
        F.col(bucket_col).alias("_psb_sb"),
        "_psb_carry",
    ] + (["_psb_prevmin"] if out_min is not None else [])
    # NULL-SAFE stitch (r12 ADVICE fix): a window partitionBy groups NULL
    # keys/buckets into one partition and KEEPS the rows, so the stitched
    # form must too — a plain equi-join would silently drop NULL-key or
    # NULL-bucket rows, diverging from the single-window formulation this
    # operator documents itself as value-identical to. eqNullSafe still
    # plans as a hash join (aliased stitch keys avoid self-join ambiguity).
    rows = local.join(
        days.select(*stitch_cols),
        F.col(key_col).eqNullSafe(F.col("_psb_sk"))
        & F.col(bucket_col).eqNullSafe(F.col("_psb_sb")),
    ).drop("_psb_sk", "_psb_sb")
    rows = rows.withColumn(out_sum, F.col("_psb_carry") + F.col("_psb_lrun"))
    if out_min is not None:
        candidates = [
            F.col("_psb_prevmin"),
            F.col("_psb_carry") + F.col("_psb_lmin"),
        ]
        if anchor_zero:
            candidates.insert(0, F.lit(0).cast("long"))
        # F.least skips NULLs, so a first bucket's NULL prev-min drops out.
        rows = rows.withColumn(out_min, F.least(*candidates))
    return rows.drop(
        "_psb_lrun", "_psb_lmin", "_psb_dtot", "_psb_dmin",
        "_psb_carry", "_psb_prevmin",
    )


def interarrival_gaps_bucketed(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    bucket_size: int = 86400,
) -> DataFrame:
    """SKEW-RESISTANT per-key interarrival gaps (r12) — the carry-stitch
    family applied to LAG: returns one row per consecutive event pair,

        (key_col, gap)   with gap = ts − previous ts under the total
                         (ts, id_col) order within the key,

    value-identical to ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY
    ts, id)`` with NULL first rows dropped. The LAG runs LOCALLY within
    (key, bucket) where bucket = ts DIV bucket_size (bucket is a pure
    function of ts, so (bucket, ts, id) order == (ts, id) order); the
    ONE gap per bucket boundary is stitched from tiny per-(key, bucket)
    summaries — first epoch of the bucket minus the previous NON-EMPTY
    bucket's last epoch, a LAG over the per-key bucket-summary window
    (#buckets rows per key). A hot key's otherwise single corpus-sort
    window task splits across its buckets; the stitch window's per-key
    cost is its bucket count, not its row count.

    Raises ValueError on the internal scratch-name collisions."""
    reserved = {"_iab_t", "_iab_b", "_iab_first", "_iab_last", "gap"}
    clashes = reserved.intersection(df.columns)
    if clashes:
        raise ValueError(
            f"interarrival_gaps_bucketed: input columns collide with "
            f"internal names: {sorted(clashes)}"
        )
    base = df.select(
        F.col(key_col),
        F.col(ts_col).cast("long").alias("_iab_t"),
        F.col(id_col),
    ).withColumn("_iab_b", F.expr(f"_iab_t DIV {int(bucket_size)}"))
    w_local = Window.partitionBy(key_col, "_iab_b").orderBy("_iab_t", id_col)
    local = (
        base.select(
            key_col,
            (F.col("_iab_t") - F.lag("_iab_t").over(w_local)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    summaries = base.groupBy(key_col, "_iab_b").agg(
        F.min(F.struct("_iab_t", id_col)).getField("_iab_t").alias("_iab_first"),
        F.max("_iab_t").alias("_iab_last"),
    )
    w_bucket = Window.partitionBy(key_col).orderBy("_iab_b")
    boundary = (
        summaries.select(
            key_col,
            (F.col("_iab_first") - F.lag("_iab_last").over(w_bucket)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return local.unionByName(boundary)
