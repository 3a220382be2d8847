"""Data-quality operators: column profiling and declarative constraint
checks (the Deequ/Great-Expectations capability class, DataFrame-native).

Both are single-pass: `column_profile` computes every column's stats in
ONE aggregate (each stat an ordinary aggregate expression — map-side
partials apply; the exact distinct counts expand the aggregate by the
column count, the documented cost of exact profiling), then melts the
1-row result to a row-per-column report in a projection. `quality_checks`
evaluates every violation-count expression in one aggregate over one scan
— checks that need a second table (referential integrity) contribute one
anti-join each, still no per-check scans.

Numeric min/max stay typed DOUBLE columns and string min/max stay VARCHAR
(NULL on the other side) — a single stringly-typed min/max column would
tie the report to engine-specific float formatting and break
cross-engine value checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str). Numeric columns fill min/max_num
    (as double), string columns fill min/max_str; other types profile
    counts only."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"column_profile: unknown columns {missing}")

    aggs: list[Column] = [F.count("*").alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
        elif isinstance(fields[c], T.StringType):
            aggs.append(F.min(c).alias(f"_smin_{c}"))
            aggs.append(F.max(c).alias(f"_smax_{c}"))
    # ensure_parallelism (r14): the multi-countDistinct aggregate plans
    # as an Expand (one branch per distinct column) — len(cols)+1 rows per
    # input row into the partial aggregate; widen a 1-task scan first.
    one = ensure_parallelism(df).agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                (
                    F.col(f"_min_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_max_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"_smin_{c}")
                    if isinstance(fields[c], T.StringType)
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"_smax_{c}")
                    if isinstance(fields[c], T.StringType)
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def quality_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Declarative constraint validation: `checks` maps check name -> a
    VIOLATION-COUNT aggregate expression over `df` (0 = check passes).
    Returns (check, n_violations, passed), one row per check, computed in
    ONE aggregate pass. Compose referential checks by aggregating an
    anti-join's count into the expression's frame beforehand."""
    one = df.agg(*[expr.cast("long").alias(name) for name, expr in checks.items()])
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(name).alias("n_violations"),
                (F.col(name) == 0).alias("passed"),
            )
            for name in checks
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def value_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-width histogram per group — the profiling complement of the
    percentile sketches (shape, not just quantiles):

        (key_col, bin, bin_lo, bin_hi, n)

    with bin width (max-min)/n_bins computed per group and the max value
    clamped into the last bin (the standard closed-right convention for
    the final bin). Two passes by construction: group stats (min/max)
    then the binning aggregate — the stats frame is groups-sized and
    broadcast back, so the second pass is map-side until its final
    (group, bin) aggregate. Empty bins are emitted with n=0 via a
    per-group bin spine (groups x n_bins rows — tiny), so the histogram
    shape is complete.

    Cross-engine determinism: the bin index floor((v-min)*n/(max-min))
    is ONE shared expression tree over exact parquet doubles (+,-,*,/
    correctly rounded; ties at bin edges resolve identically); bin
    bounds are emitted rounded to 6 dp for display."""
    if n_bins < 1:
        raise ValueError("value_histogram: n_bins must be >= 1")
    stats = df.groupBy(key_col).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    binned = (
        df.select(key_col, F.col(value_col).alias("_v"))
        .join(F.broadcast(stats), key_col)
        .select(
            key_col,
            # Degenerate group (all values equal): everything in bin 0
            # rather than a 0/0 NaN bin.
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("_v") - F.col("_mn"))
                        * n_bins
                        / (F.col("_mx") - F.col("_mn"))
                    ),
                    F.lit(n_bins - 1).cast("long"),
                )
            )
            .cast("int")
            .alias("bin"),
        )
        .groupBy(key_col, "bin")
        .agg(F.count("*").alias("n"))
    )
    spine = stats.select(
        key_col,
        "_mn",
        "_mx",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    width = (F.col("_mx") - F.col("_mn")) / n_bins
    return (
        spine.join(binned, [key_col, "bin"], "left")
        .select(
            key_col,
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("_mn") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("_mn") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram per group (the dual of `value_histogram`'s
    equi-width bins: equal POPULATION per bucket, data-driven boundaries —
    what quantile-aware partitioning, salting decisions, and skew reports
    actually need, since equi-width collapses under heavy tails):

        (key_col, bucket, n, lo_ve4, hi_ve4)

    via NTILE(n_buckets) over the per-group total order (integerized
    value, id_col tiebreak — NTILE's extra-row placement is deterministic
    only under a total order, and both engines implement the standard
    first-(n mod b)-buckets-get-one-extra rule). Bounds are exact BIGINTs
    in 1e-4 units.

    Scale shape (r12: migrated from the NTILE window onto the
    FREQUENCY-TABLE decomposition, `operators/quantiles.py`'s recipe):
    the only corpus-sized operator is a map-side-combined hash aggregate
    to per-(key, value) counts; every bucket boundary is then a rank
    lookup over the TINY count table (NTILE's standard
    first-(n mod b)-buckets-get-one-extra rule fixes each bucket's rank
    span [start, end] exactly, and the value at rank r is the smallest
    value whose cumulative count reaches r — the id_col tiebreak only
    ever reorders rows WITHIN one value, which all agree on the value,
    so the per-bucket n/lo/hi are identical to the NTILE form; id_col
    is kept in the signature for that documented contract). The NTILE
    form made each group a SINGLE-TASK corpus sort at 100 TB — the
    window-skew class salting can't fix; here the windows and the
    bucket fan-out run over |distinct values| rows. Value domains too
    large to aggregate take the mergeable KLL sketch
    (`sketches.kll_value_rollup`) instead."""
    # id_col is contract-only after the freq-table migration (see above),
    # but it must still NAME A REAL COLUMN — a caller passing a stale or
    # misspelled tiebreak would otherwise silently succeed and then break
    # the moment anyone reverts to (or cross-checks against) the NTILE
    # form (ADVICE r12). Case-INSENSITIVE like Spark's own resolution
    # (spark.sql.caseSensitive defaults false — a guard stricter than
    # the engine would reject previously-working callers).
    existing = {c.lower() for c in df.columns}
    for col in (key_col, value_col, id_col):
        if col.lower() not in existing:
            raise ValueError(
                f"equi_depth_histogram: column {col!r} not in {df.columns}"
            )
    counts = (
        df.select(
            key_col, F.round(F.col(value_col) * 10000).cast("long").alias("_ve4")
        )
        .groupBy(key_col, "_ve4")
        .agg(F.count("*").alias("_c"))
    )
    wcum = (
        Window.partitionBy(key_col)
        .orderBy("_ve4")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        key_col,
        "_ve4",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(key_col)).alias("_n"),
    )
    spine = df.sparkSession.range(1, n_buckets + 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    b = F.col("bucket").cast("long")
    q, r = F.expr("_n DIV %d" % n_buckets), F.col("_n") % n_buckets
    size = q + F.when(b <= r, F.lit(1)).otherwise(F.lit(0))
    start = (b - 1) * q + F.least(b - 1, r) + 1
    fan = cum.crossJoin(F.broadcast(spine)).select(
        key_col,
        "bucket",
        "_ve4",
        "_cum",
        size.alias("_size"),
        start.alias("_start"),
        (start + size - 1).alias("_end"),
    )
    return (
        fan.filter(F.col("_size") > 0)
        .groupBy(key_col, "bucket")
        .agg(
            F.max("_size").alias("n"),
            F.min(F.when(F.col("_cum") >= F.col("_start"), F.col("_ve4"))).alias(
                "lo_ve4"
            ),
            F.min(F.when(F.col("_cum") >= F.col("_end"), F.col("_ve4"))).alias(
                "hi_ve4"
            ),
        )
    )
