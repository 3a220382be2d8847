"""Market-basket association rules (support / confidence / lift) over
(basket, item) pairs — the classic co-occurrence analytics operator
(Agrawal & Srikant 1994's first level, pairwise rules).

Scale shape: distinct (basket, item) once, then pair generation is a
self-equi-join ON THE BASKET KEY — fan-out per basket is O(items²) with
items bounded by the catalog (event types here), never corpus-quadratic;
two hash aggregates (item counts, pair counts) and a broadcast of the
item-count table close it out. The distinct table is localCheckpoint-ed
(it feeds four consumers plus a build-time count), so the corpus pays one
distinct shuffle and one basket-key join shuffle total.

Cross-engine exactness: supports are integers; confidence and lift are
emitted as integer ppm via pure-BIGINT round-half-up division
(`(2·num·1e6 + den) div (2·den)`), the repo's standard ratio recipe —
no float anywhere in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Directed pairwise rules A -> B:
    (antecedent, consequent, n_both, n_ante, n_cons, confidence_ppm,
    lift_ppm) for every ordered pair co-occurring in >= `min_support`
    baskets.

    confidence = P(B|A) = n_both/n_ante; lift = confidence / P(B)
    = n_both·N / (n_ante·n_cons) with N = basket count — all emitted in
    exact integer ppm. Both directions of a pair appear (confidence is
    asymmetric)."""
    if min_support < 1:
        raise ValueError(f"association_rules: need min_support >= 1, got {min_support}")
    # localCheckpoint: the distinct (basket, item) table is consumed four
    # times (basket count, item counts, both sides of the pair join) and a
    # count() action runs at build time — without the cut, the corpus-wide
    # distinct would execute once for the count and again for the final
    # action. Materialized, the count is cheap and the distinct runs once.
    bi = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .localCheckpoint()
    )
    n_baskets = bi.select("_b").distinct().count()
    # Exact-ppm lift computes n_both·N·2e6 in BIGINT; with n_both <= N that
    # needs N² · 2e6 < 2^63 → N <= ~2.1e6 baskets. Beyond that, swap the
    # lift column to double (confidence stays exact at any scale) — refuse
    # loudly rather than let ANSI overflow kill the job mid-stage.
    if n_baskets > 2_000_000:
        raise ValueError(
            f"association_rules: {n_baskets} baskets exceeds the exact-ppm "
            "lift overflow bound (~2.1e6); compute lift in double at this scale"
        )
    item_n = bi.groupBy(F.col("_i").alias("antecedent")).agg(
        F.count("*").alias("n_ante")
    )
    pairs = (
        bi.alias("l")
        .join(bi.alias("r"), F.col("l._b") == F.col("r._b"))
        .filter(F.col("l._i") != F.col("r._i"))
        .groupBy(
            F.col("l._i").alias("antecedent"), F.col("r._i").alias("consequent")
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    cons_n = item_n.select(
        F.col("antecedent").alias("consequent"), F.col("n_ante").alias("n_cons")
    )
    out = (
        pairs.join(F.broadcast(item_n), "antecedent")
        .join(F.broadcast(cons_n), "consequent")
    )
    conf = "(n_both * 2000000L + n_ante) div (2L * n_ante)"
    lift = (
        f"(n_both * {n_baskets}L * 2000000L + n_ante * n_cons)"
        " div (2L * n_ante * n_cons)"
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_ante",
        "n_cons",
        F.expr(conf).alias("confidence_ppm"),
        F.expr(lift).alias("lift_ppm"),
    )
