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
