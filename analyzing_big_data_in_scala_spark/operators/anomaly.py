"""Trailing-window z-score anomaly detection over an event stream — the
classic observability primitive (flag values far from their own recent
history), expressed as bounded-frame window aggregates.

Scale shape: ONE window pass partitioned by the series key, ordered by
(ts, id), frame `ROWS BETWEEN w PRECEDING AND 1 PRECEDING` — state per
partition is the w-row frame, never the series; partitions are
data-proportional keys (event_type here), so no single-partition global
window exists at any scale.

Cross-engine determinism (the round-3 recipe stack):
- values integerize PER ROW (1e-4 units as BIGINT) before any window sum,
  so frame sums/sum-of-squares are exact integers in any evaluation order
  (incremental frame maintenance vs recompute cannot diverge);
- the z computation is ONE expression string (`Z_EXPR_SQL`) compiled
  verbatim by both Spark and DuckDB over those exact integers — identical
  IEEE expression tree, sqrt is IEEE-exact;
- the variance numerator `ss·n − s²` stays in BIGINT: with
  `ss ≤ n·max(ve4)²`, `ss·n < 2^63` needs `|value| < 2^31.5/(n·1e4)`
  (≈ 6074 for the default window of 50). The operator validates the
  caller-declared `max_abs_value` against that bound eagerly; a data row
  beyond the declaration still fails LOUDLY (Spark 4 ANSI overflow), never
  silently. Rows with a zero/undefined std are filtered BEFORE z is
  evaluated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared Spark/DuckDB expression over the exact-integer window columns
# (ve4, s, ss, n): z = (x - mean) / std with
# mean = s/n and var = (ss*n - s^2) / n^2. Only evaluated on rows where
# n == window and ss*n - s^2 > 0 (filtered upstream on both engines).
Z_EXPR_SQL = (
    "(CAST(ve4 AS DOUBLE) - CAST(s AS DOUBLE) / n)"
    " / sqrt(CAST(ss * n - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * n))"
)


def rolling_zscore_anomalies(
    events: DataFrame,
    window: int = 50,
    z_threshold: float = 3.0,
    partition_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    max_abs_value: float = 5000.0,
) -> DataFrame:
    """(partition_col, id_col, value_e4, z) for every event whose value is
    >= `z_threshold` standard deviations from the mean of the PREVIOUS
    `window` values in its series (trailing frame excludes the current
    row, so an outlier cannot mask itself). Events without a full trailing
    window, or whose window has zero variance, are never flagged.

    `max_abs_value` is the caller's declared value envelope: the exact-
    integer variance arithmetic needs window²·(max_abs_value·1e4)² < 2^63
    (the association_rules-style upfront guard); a row that exceeds the
    declaration fails loudly via ANSI overflow rather than corrupting."""
    if window < 2:
        raise ValueError(f"rolling_zscore_anomalies: need window >= 2, got {window}")
    if window * window * (max_abs_value * 10000.0) ** 2 >= 2.0**63:
        raise ValueError(
            f"rolling_zscore_anomalies: window={window} with "
            f"max_abs_value={max_abs_value} overflows the exact BIGINT "
            f"variance bound (need window^2 * (max_abs_value*1e4)^2 < 2^63 — "
            f"shrink the window or the declared value range)"
        )
    ve4 = F.round(F.col(value_col) * 10000).cast("long")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-window, -1)
    )
    framed = events.select(
        partition_col,
        id_col,
        ve4.alias("ve4"),
        F.count("*").over(w).alias("n"),
        F.sum(ve4).over(w).alias("s"),
        F.sum(ve4 * ve4).over(w).alias("ss"),
    )
    eligible = framed.filter(
        (F.col("n") == window) & (F.col("ss") * F.col("n") - F.col("s") * F.col("s") > 0)
    )
    return (
        eligible.withColumn("z", F.expr(Z_EXPR_SQL))
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select(
            partition_col,
            id_col,
            F.col("ve4").alias("value_e4"),
            F.round("z", 6).alias("z"),
        )
    )


def mad_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Robust outlier profile per series: median + MAD (median absolute
    deviation) + the count of values beyond the standard 3σ-equivalent
    threshold 3·1.4826·MAD — the robust twin of the z-score detector
    (medians don't move when the outliers themselves contaminate the
    estimate, which is exactly when you need them).

    Scale shape: two hash aggregates over per-row integerized values with
    a types-sized broadcast join between them; exact percentiles per
    GROUP are sort-based within the group's partition, never a global
    sort.

    Cross-engine determinism without any rounding soak: values
    integerize per row (1e-4 units, BIGINT), so every median is the
    midpoint of two integers — kept EXACT by carrying 2x the quantity
    (`med2` = 2·median(ve4), `d2` = |2·ve4 − med2|, `mad2` =
    median(d2)): all integer-or-half-integer-valued doubles, identical
    bits on any engine and any interpolation formula. The only rounded
    ops are the final /20000 display divisions and ONE multiply in the
    threshold `d2 > 4.4478·mad2` (= 3·1.4826 in d2 units) — both
    correctly rounded IEEE, so even the boundary comparison is
    deterministic.

    Output: (key_col, n, median_value, mad_value, n_outliers)."""
    ve4 = F.expr(f"CAST(ROUND({value_col} * 10000) AS BIGINT)")
    base = events.select(key_col, ve4.alias("ve4")).localCheckpoint(eager=False)
    med = base.groupBy(key_col).agg(
        F.count("*").alias("n"),
        (F.percentile("ve4", 0.5) * 2).alias("med2"),
    )
    dev = (
        base.join(F.broadcast(med.select(key_col, "med2")), key_col)
        .select(key_col, F.abs(2 * F.col("ve4") - F.col("med2")).alias("d2"))
        .localCheckpoint(eager=False)  # consumed by the mad agg AND the count
    )
    mad = dev.groupBy(key_col).agg(F.percentile("d2", 0.5).alias("mad2"))
    out = (
        dev.join(F.broadcast(mad), key_col)
        .groupBy(key_col)
        .agg(
            F.sum(
                (F.col("d2") > F.lit(4.4478) * F.col("mad2")).cast("long")
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, key_col)
        .join(out, key_col)
        .select(
            key_col,
            "n",
            (F.col("med2") / 20000).alias("median_value"),
            (F.col("mad2") / 20000).alias("mad_value"),
            "n_outliers",
        )
    )


# --- Trailing EWMA smoother (exact-integer truncated exponential weights) --

# Decay ratio r = 3/4 over a 16-row trailing window (current row included).
# Scaling every weight (3/4)^j by 4^(W-1) makes them exact BIGINTs
# (COEF_j = 3^j * 4^(W-1-j)), so the weighted numerator and the constant
# denominator are pure integer arithmetic — bit-identical cross-engine with
# no float summation and no ln/exp. The truncation error vs the infinite
# EWMA is (3/4)^16 ≈ 1% of the weight mass, absorbed by the definition:
# this operator IS the 16-term smoother, both engines compute exactly it.
EWMA_WINDOW = 16
EWMA_COEFS = [3**j * 4 ** (EWMA_WINDOW - 1 - j) for j in range(EWMA_WINDOW)]
EWMA_DEN = sum(EWMA_COEFS)  # = 4^16 - 3^16
# Shift the weighted sum non-negative before the integer division: Spark's
# `div` truncates toward zero while DuckDB's `//` floors, so a NEGATIVE
# numerator (values may be negative) would diverge by one on non-exact
# quotients. |num| <= 5e7 (value envelope, 1e-4 units) * EWMA_DEN, so an
# offset of 6e7 value-units makes the shifted numerator strictly positive
# on both engines; positive // == positive div. Overflow stays < 2^63
# (audit in ewma_smooth's docstring).
EWMA_OFFSET_E4 = 60_000_000


def ewma_expr_sql(div_op: str, lag_prefix: str = "_x") -> str:
    """The Spark/DuckDB expression for the exact-integer EWMA: identical
    term tree on both engines, differing ONLY in the integer-division
    token (`div_op` = 'DIV' for Spark, '//' for DuckDB). `_x0` is the
    current row's integerized value, `_xj` the j-th lag."""
    num = " + ".join(f"{c} * {lag_prefix}{j}" for j, c in enumerate(EWMA_COEFS))
    shifted = f"({num}) + {EWMA_OFFSET_E4 * EWMA_DEN}"
    return f"(({shifted}) * 2 + {EWMA_DEN}) {div_op} (2 * {EWMA_DEN}) - {EWMA_OFFSET_E4}"


def ewma_smooth(
    events: DataFrame,
    partition_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(partition_col, id_col, ve4, ewma_e4) for every event with a full
    16-row trailing window in its series: the truncated exponential moving
    average (decay 3/4) of the per-row integerized values, as an exact
    BIGINT in 1e-4 units.

    Scale shape: ONE window pass partitioned by the series key — 15 lags +
    the weighted sum all evaluate inside the same Window/Project stages;
    partial windows are filtered (a renormalized partial weight mass would
    make early rows engine-dependent on count semantics for no analytical
    gain).

    Overflow audit: |ve4| <= 5e7 (the rolling_zscore value envelope),
    COEF_j <= 4^15 ~ 1.07e9, 16 terms -> |num| <= 8.6e17; the
    round-half-up form doubles it to 1.7e18 < 2^63. ANSI mode still fails
    loudly beyond the envelope, never silently."""
    w = Window.partitionBy(partition_col).orderBy(F.asc(ts_col), F.asc(id_col))
    ve4 = F.round(F.col(value_col) * 10000).cast("long")
    base = events.select(
        partition_col,
        id_col,
        ts_col,
        ve4.alias("_x0"),
    )
    lagged = base.select(
        partition_col,
        id_col,
        "_x0",
        *[F.lag("_x0", j).over(w).alias(f"_x{j}") for j in range(1, EWMA_WINDOW)],
        F.row_number().over(w).alias("_rn"),
    )
    return (
        lagged.filter(F.col("_rn") >= EWMA_WINDOW)
        .select(
            partition_col,
            id_col,
            F.col("_x0").alias("ve4"),
            F.expr(ewma_expr_sql("DIV")).alias("ewma_e4"),
        )
    )
