"""Corpus drift monitoring (beyond-reference; the ML-ops check a
long-running ingestion pipeline runs between snapshots: "did the data
change under us?").

Token-distribution drift via the per-token chi-square statistic between a
baseline corpus and a current corpus: for token t with counts (cb, cc)
and corpus totals (Nb, Nc),

    eb = (cb + cc) * Nb / (Nb + Nc)      (expected under "no drift")
    ec = (cb + cc) * Nc / (Nb + Nc)
    chi2(t) = (cb - eb)^2 / eb + (cc - ec)^2 / ec

Chi-square over ln-free arithmetic is deliberate: +, -, *, / are
correctly-rounded IEEE ops, so the statistic is bit-identical across
engines when both evaluate the same expression tree — unlike KL/PSI,
whose ln() is not correctly rounded and needs the bm25-style per-site
quantization dance. Rounded to 6 decimals and ORDERED BY the rounded
value (token tie-break), the top-k "most drifted tokens" report is fully
value-checkable.

Scale shape: one tokenize+explode per side, one hash aggregate each, one
full-outer equi-join on the token, then the chi-square projection and a
TakeOrderedAndProject top-k — everything map-side-combinable, keys are
single tokens, nothing corpus-quadratic. `min_total` drops the long tail
of rare tokens whose chi-square is noise (and whose expected counts < 5
invalidate the statistic anyway — the textbook applicability rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def token_drift_chi2(
    base: DataFrame,
    current: DataFrame,
    k: int = 20,
    min_total: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-`k` drifted tokens between two corpora:
    (token, n_base, n_current, chi2 [rounded 6]). Tokens absent from one
    side count 0 there (full outer join) — appearing/disappearing
    vocabulary is exactly the drift a monitor must flag."""
    b = _token_counts(base, text_col).select(
        "token", F.col("cnt").alias("n_base")
    )
    c = _token_counts(current, text_col).select(
        "token", F.col("cnt").alias("n_current")
    )
    joined = (
        b.join(c, "token", "full_outer")
        .select(
            "token",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_current", F.lit(0)).cast("long").alias("n_current"),
        )
        .filter((F.col("n_base") + F.col("n_current")) >= min_total)
    )
    # Totals as a 1-row broadcast (no driver collect); the chi-square
    # expression uses only correctly-rounded double ops, in an order the
    # oracle mirrors verbatim.
    totals = joined.agg(
        F.sum("n_base").alias("_nb"), F.sum("n_current").alias("_nc")
    )
    cb = F.col("n_base").cast("double")
    cc = F.col("n_current").cast("double")
    nb = F.col("_nb").cast("double")
    nc = F.col("_nc").cast("double")
    eb = (cb + cc) * nb / (nb + nc)
    ec = (cb + cc) * nc / (nb + nc)
    chi2 = (cb - eb) * (cb - eb) / eb + (cc - ec) * (cc - ec) / ec
    return (
        joined.crossJoin(F.broadcast(totals))
        .select("token", "n_base", "n_current", F.round(chi2, 6).alias("chi2"))
        .orderBy(F.desc("chi2"), F.asc("token"))
        .limit(k)
    )
