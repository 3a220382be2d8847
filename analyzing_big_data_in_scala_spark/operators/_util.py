"""Shared operator utilities: small-input parallelism, skew salting."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def single_partition_key(col: Column | str) -> Column:
    """Constant-0 but NON-FOLDABLE partition key for windows that are
    single-partition BY DESIGN over a bounded frame (bucket partials,
    weeks of history, a post-limit top-k): `Window.partitionBy(
    single_partition_key("_bkt"))` keeps the values and the physical
    plan (one hash partition) identical to an unpartitioned window while
    keeping WindowExec's no-partition warning channel clean for REAL
    accidental full-data single-partition windows.

    A literal `partitionBy(F.lit(0))` does NOT work: Spark 4's
    `EliminateWindowPartitions` rule folds literal partition expressions
    away, restoring the empty spec (and the warning). Hashing a real
    column is non-foldable so it survives optimization, and xxhash64 is
    never NULL (it hashes NULL to a value), so the key is 0 for every
    row — NULL inputs cannot split the partition."""
    return F.pmod(F.xxhash64(F.col(col) if isinstance(col, str) else col), F.lit(1))


def ensure_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    file_backed_only: bool = False,
) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster has cores — e.g. a small parquet file read as one row group.

    Used by compute-bound operators (tokenize/shingle/hash/vector math)
    where map-side CPU dominates: a single-partition input would serialize
    the whole operator. At real scale inputs carry plenty of partitions and
    this is a no-op, so the extra shuffle never appears in big plans.

    ``file_backed_only=True`` (r15, VERDICT r14 item 8) skips the
    `df.rdd.getNumPartitions()` fallback entirely: non-file-backed frames
    (joins, checkpoints, streaming micro-batches) are returned unchanged
    instead of paying the ~1 s plan->RDD probe at plan-build time. Use it
    on hot paths that are sometimes fed derived frames (the ANN assign
    family) where the probe would cost more than the missed widening.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() is a cheap FileIndex lookup; df.rdd.getNumPartitions()
    # forces a full plan->RDD conversion (~1s per call), so it is only the
    # fallback for non-file-backed frames (joins, checkpoints, memory) —
    # where blindly repartitioning could otherwise REDUCE parallelism.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= min_partitions:
            return df
    elif file_backed_only or df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def fan_out_ready(df: DataFrame) -> DataFrame:
    """Lazy-localCheckpoint `df` and restore parallelism when the
    checkpoint would be narrower than the session's core count (r14,
    guide §2.5): an AQE-coalesced exchange (correct for the shuffle)
    leaves 1-2 partitions, and a downstream FAN-OUT stage — an
    inverted-index self-join emitting df(h) rows per probe row, a wedge
    join emitting deg(w) rows — then runs on 1-2 cores. Measured on the
    link-prediction scaffold: 2 tasks / 6.5 s vs 32 tasks / ~1 s.

    The checkpoint comes FIRST so the partition probe reads the planned
    RDD; probing a not-yet-checkpointed AQE plan executes its
    intermediate stages a second time (measured 3x slowdown). At real
    scale the checkpoint arrives with >= cores partitions and this adds
    nothing. Distinct from :func:`ensure_parallelism`, which handles
    file-backed scan inputs and must not checkpoint."""
    ck = df.localCheckpoint(eager=False)
    target = df.sparkSession.sparkContext.defaultParallelism
    if ck.rdd.getNumPartitions() < target:
        ck = ck.repartition(target).localCheckpoint(eager=False)
    return ck


_REAGGREGABLE = {"sum", "count", "min", "max"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_col: Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for SKEWED group keys: phase 1 aggregates on
    (keys + salt) so a hot key's rows spread over `buckets` reducers;
    phase 2 re-aggregates the per-salt partials on the real keys — a
    partition-count-sized input, trivially cheap.

    `aggs` maps output alias -> (fn, input_col) with fn one of
    'sum' | 'count' | 'min' | 'max' (the re-aggregable functions; avg =
    sum/count composed by the caller; count ignores input_col). `salt_col`
    must be a deterministic expression over the row (e.g.
    pmod(xxhash64(id), buckets)) so results are reproducible.

    At 100 TB a single hot key (one celebrity user, one dominant event
    type) otherwise lands on one reducer; AQE's skew-join split only covers
    joins, not aggregations — this covers the aggregation side.
    Hash-aggregation's map-side partials already mitigate skew for small
    key cardinality; salting matters when per-key state is large (e.g.
    collect_list-like payloads) or partial aggregation is disabled.
    """
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(buckets)))

    phase1_exprs, phase2_exprs = [], []
    for alias, (fn, col) in aggs.items():
        if fn not in _REAGGREGABLE:
            # e.g. 'avg' of per-salt averages is WRONG for unequal buckets —
            # refuse loudly instead of silently mis-aggregating.
            raise ValueError(
                f"salted_aggregate supports {sorted(_REAGGREGABLE)}; got {fn!r} for "
                f"{alias!r} (compose avg as sum/count yourself)"
            )
        if fn == "count":
            phase1_exprs.append(F.count("*").alias(alias))
            phase2_exprs.append(F.sum(alias).alias(alias))  # partials re-sum
        else:
            phase1_exprs.append(getattr(F, fn)(col).alias(alias))
            phase2_exprs.append(getattr(F, fn)(alias).alias(alias))

    phase1 = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives a SKEWED key distribution on the big (left)
    side: the left side gets a deterministic per-row salt, the right side
    is replicated `buckets` times (explode over a literal sequence), and
    the join runs on (keys + salt) — a hot key's rows spread over
    `buckets` reducers instead of one straggler task.

    Result == `left.join(right, on, how)` for 'inner'/'left' (each left
    row matches exactly the replica carrying its salt, so no duplicates
    and no misses). Other join types need the unsalted plan — refused.

    The salt is a hash of the WHOLE left row (`xxhash64` over all
    columns), so identical logical rows always land in the same bucket
    and the operator stays deterministic with zero caller setup. This is
    the manual fallback for when AQE's skew-join split can't kick in
    (e.g. the join is bucket-map or the skew is known up front); the
    replication factor costs `buckets` copies of the SMALL side only.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if buckets < 1:
        # buckets=0 would make the replicated right side EMPTY (sequence(0,-1))
        # — a silently-empty inner join, not an error. Refuse instead.
        raise ValueError(f"salted_equi_join: need buckets >= 1, got {buckets}")
    keys = [on] if isinstance(on, str) else list(on)
    clashes = {"_salt"}.intersection(left.columns).union(
        {"_salt"}.intersection(right.columns)
    )
    if clashes:
        raise ValueError(f"salted_equi_join: reserved column collision: {sorted(clashes)}")
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets)).cast("int")
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_left.join(replicated_right, [*keys, "_salt"], how).drop("_salt")


def sum_sq_overflow_guard(
    n_col: str,
    max_abs_col: str,
    opname: str,
    remediation: str,
    group_col: str | None = None,
    finalize_multiplier: float = 1.0,
) -> Column:
    """Loud BIGINT-overflow guard for exact sum-of-squares statistics —
    the enforcement pattern `trend_sufficient_stats` introduced in r10,
    shared so every Σx² family (trend, HHI, variance) gets the same
    contract: alongside the sums, the aggregate tracks max|x| per group;
    this post-aggregation expression returns `n_col` unchanged when the
    conservative worst-case bound n·max|x|² stays under 2^63, and raises
    with `remediation` in the message when the group outgrew the unit
    knob (instead of silently-wrapped statistics in non-ANSI mode or an
    opaque engine overflow under ANSI). The bound is computed in DOUBLE
    (the product itself would overflow BIGINT); threshold 9.0e18 < 2^63
    absorbs double rounding. One CASE per group ROW — post-aggregation,
    never the per-input-row conditional the codegen notes rule out for
    hot paths.

    `finalize_multiplier` declares the largest integer multiple of the
    guarded sum that a downstream FINALIZE expression forms (r12, ADVICE
    fix): e.g. the round-half-up `(2·s + n) DIV (2·n)` finalize computes
    2·s, so the guard must hold 2·(n·max|x|²) under 2^63, not just the
    sum itself — the threshold is divided by the multiplier so the guard
    covers the finalize's cross-multiplication, not only the raw sum."""
    m = F.col(max_abs_col).cast("double")
    bound = F.col(n_col).cast("double") * m * m * F.lit(float(finalize_multiplier))
    where = (
        F.concat(F.lit(" for group '"), F.col(group_col).cast("string"), F.lit("'"))
        if group_col is not None
        else F.lit("")
    )
    return (
        F.when(
            bound >= F.lit(9.0e18),
            F.assert_true(
                F.lit(False),
                F.concat(
                    F.lit(f"{opname}: BIGINT overflow risk"),
                    where,
                    F.lit(f" (n*max|x|^2 >= 2^63) — {remediation}"),
                ),
            ).cast("long"),
        )
        .otherwise(F.col(n_col))
        .alias(n_col)
    )


def product_overflow_guard(
    n_col: str,
    max_abs_col: str,
    opname: str,
    remediation: str,
    group_col: str | None = None,
    finalize_multiplier: float = 1.0,
) -> Column:
    """Sibling of :func:`sum_sq_overflow_guard` for exact sums of
    per-row PRODUCTS bounded by a tracked maximum: returns `n_col`
    unchanged while the conservative bound n·max|x| stays under 2^63,
    raises with `remediation` beyond (the Σc·lq / cross-multiplied-count
    families, where the square bound would be wildly over-conservative).
    Same DOUBLE-bound / post-aggregation / one-CASE-per-group-row /
    `finalize_multiplier` contract as the square form — callers whose
    finalize scales the guarded sum (the ppm cross-multiplication
    `2000000·Σ + …`, the round-half-up `2·s + n`) MUST pass the
    multiplier so the guard fires for the overflow the finalize can
    actually hit (r12, ADVICE fix: the mix-drift guard previously
    bounded only the per-row deviation products, ~4e6× below the
    finalize's wrap point)."""
    bound = (
        F.col(n_col).cast("double")
        * F.col(max_abs_col).cast("double")
        * F.lit(float(finalize_multiplier))
    )
    where = (
        F.concat(F.lit(" for group '"), F.col(group_col).cast("string"), F.lit("'"))
        if group_col is not None
        else F.lit("")
    )
    return (
        F.when(
            bound >= F.lit(9.0e18),
            F.assert_true(
                F.lit(False),
                F.concat(
                    F.lit(f"{opname}: BIGINT overflow risk"),
                    where,
                    F.lit(f" (n*max|x| >= 2^63) — {remediation}"),
                ),
            ).cast("long"),
        )
        .otherwise(F.col(n_col))
        .alias(n_col)
    )
