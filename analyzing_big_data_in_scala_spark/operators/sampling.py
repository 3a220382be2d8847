"""Sampling operators for training-data pipelines (beyond-reference).

Two families:

- **Deterministic hash sampling** — membership decided by a content hash
  of a stable key, not an RNG. The property that matters at 100 TB: the
  sample is REPRODUCIBLE across runs, engines, and re-partitions (no seed
  to drift, no dependence on row order), and a document keeps its
  train/test assignment forever even as the corpus grows — the standard
  guard against train/test contamination. Uses
  `functions.text.portable_hash64` (md5-derived) so DuckDB computes the
  identical sample and the operator is fully oracle-checkable; swap in
  `F.xxhash64` on the hot path if cross-engine parity isn't needed.
  Narrow per-row projection, no shuffle, predicate evaluates in
  whole-stage codegen.

  Independent decisions on the SAME key (e.g. sample the corpus, then
  carve a test split) must use different `salt`s — with one hash the
  decisions are perfectly correlated (every test row would also be the
  first rows of any sample).

- **Stratified sampling** — `DataFrame.sampleBy` per-stratum Bernoulli
  rates (seeded RNG; deterministic for a fixed seed + partitioning but
  not portable across engines, hence unit-tested rather than
  oracle-checked). Used to rebalance skewed strata (languages, quality
  bins) before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash64


def hash_bucket(key: Column | str, buckets: int = 10_000, salt: str = "") -> Column:
    """Stable bucket id in [0, buckets) from the md5-derived portable hash
    of `key` (rendered as a string) + `salt`. DuckDB twin:
    `sql_portable_hash64("CAST(key AS VARCHAR) || 'salt'") % buckets`."""
    key_col = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(F.concat(key_col.cast("string"), F.lit(salt)))
    return h % F.lit(buckets)


def hash_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = 10_000, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below fraction*buckets — a
    deterministic, rerun-stable ~fraction sample keyed on `key`.

    `round`, not `int`: truncation turns binary-float artifacts into an
    off-by-one bucket count (0.29 * 10000 -> 2899.9999... -> 2899). Any
    oracle SQL must use the same rounded literal."""
    threshold = round(fraction * buckets)
    return df.filter(hash_bucket(key, buckets, salt) < F.lit(threshold))


def split_by_hash(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column ('test' for the low hash buckets, else 'train').
    Because membership is a pure function of `key`, a row can never migrate
    between splits across runs or dataset versions."""
    threshold = round(test_fraction * buckets)
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(key, buckets, salt) < F.lit(threshold), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): each value of
    `strata_col` is kept at its own rate (missing strata default to 0).
    One pass, no shuffle; rates are expectations, not exact counts."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def mixture_keep_rates(
    counts: dict[str, int], target_shares: dict[str, float]
) -> dict[str, float]:
    """Per-source keep rates that turn observed `counts` into the
    `target_shares` mixture by DOWNSAMPLING only (no rate exceeds 1).

    The binding source — the one whose observed share falls shortest of its
    target — is kept whole, and every other source is thinned relative to
    it. Driver-side arithmetic over a per-source count dict (one tiny
    aggregate at any corpus scale; the data itself never leaves executors).
    Sources absent from `target_shares` get rate 0."""
    missing = [s for s in target_shares if s not in counts]
    if missing:
        raise ValueError(f"target_shares name unknown sources: {missing}")
    total_share = sum(target_shares.values())
    if not 0.999999 <= total_share <= 1.000001:
        raise ValueError(f"target_shares must sum to 1, got {total_share}")
    # Scale chosen so the most-underrepresented source keeps rate 1.0:
    # kept_s = rate_s * count_s ∝ share_s  =>  rate_s = scale * share_s / count_s.
    scale = min(
        counts[s] / share for s, share in target_shares.items() if share > 0
    )
    return {
        s: (scale * share / counts[s] if share > 0 else 0.0)
        for s, share in target_shares.items()
    }


def source_mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    key: str,
    source_col: str = "source",
    buckets: int = 10_000,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic per-source downsampling to a target mixture: each row
    is kept iff its hash bucket (stable in `key`) falls under its source's
    rate threshold. Sources not in `rates` are dropped.

    The mixture version of :func:`hash_sample`: membership is a pure
    function of (key, source) — reruns, repartitions, and corpus growth
    never reshuffle which documents are in the blend, so training mixes
    are exactly reproducible. The per-source threshold is a broadcast-free
    CASE expression: one codegen'd projection + filter, no shuffle, no
    join, pushes down to the scan."""
    thresholds = {s: round(r * buckets) for s, r in rates.items()}
    expr = F.lit(0)
    for s, t in thresholds.items():
        expr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(expr)
    return df.filter(hash_bucket(key, buckets, salt) < expr)


def sql_source_mixture_filter(
    rates: dict[str, float],
    key_expr: str,
    source_expr: str = "source",
    buckets: int = 10_000,
    salt: str = "mixture",
) -> str:
    """DuckDB WHERE-clause twin of :func:`source_mixture_sample`."""
    from ..functions.text import sql_portable_hash64

    h = sql_portable_hash64(f"CAST({key_expr} AS VARCHAR) || '{salt}'")
    cases = " ".join(
        f"WHEN '{s}' THEN {round(r * buckets)}" for s, r in rates.items()
    )
    return f"({h} % {buckets}) < (CASE {source_expr} {cases} ELSE 0 END)"


def weighted_hash_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    buckets: int = 10_000,
    salt: str = "weighted",
) -> DataFrame:
    """Per-ROW weighted deterministic sampling: keep a row with
    probability equal to its `weight_col` value (in [0, 1]) — the
    quality-weighted upsampling/downsampling step of a training-mix
    recipe, with the same reproducibility contract as :func:`hash_sample`
    (membership is a pure function of key + weight: no RNG, no drift
    across runs/engines/partitionings).

    keep iff hash_bucket(key) < round(weight * buckets): identical float
    multiply + half-up rounding on any engine, so the sample is
    oracle-checkable. Weights outside [0, 1] clamp naturally (<=0 never
    keeps, >=1 always keeps)."""
    threshold = F.round(F.col(weight_col) * buckets, 0)
    return df.filter(hash_bucket(key, buckets, salt) < threshold)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key: str,
    salt: str = "strat",
) -> DataFrame:
    """EXACTLY `n_per_stratum` rows per stratum (or all of a smaller
    stratum), chosen by hash rank — the deterministic counterpart of
    `sampleBy`, whose Bernoulli rates only hit counts in expectation.
    The per-stratum choice is a pure function of (key, salt): stable
    across runs, engines, partitionings, AND corpus growth (a kept row
    stays kept until enough lower-hash rows join its stratum — no RNG
    churn). The standard tool for balanced per-class subsets (eval sets,
    per-source audit samples).

    One window pass partitioned by the stratum — per-partition state is
    the stratum's row count, never corpus-wide. Ties cannot happen: the
    rank orders by (hash, key) and `key` is unique."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key, buckets=1 << 30, salt=salt), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
