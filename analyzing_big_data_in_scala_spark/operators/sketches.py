"""Count-min sketch (Cormode & Muthukrishnan 2005): fixed-memory frequency
estimation for heavy-hitter queries over unbounded key cardinality.

At 100 TB an exact per-term count table has vocabulary-sized cardinality
(hundreds of millions of keys); the CMS is a constant `depth × width`
integer grid that (a) builds in one explode + one map-side-combined hash
aggregate, (b) merges across partitions/batches by cell-wise addition (the
aggregate IS the merge), and (c) answers point queries with
`min_i grid[i][h_i(key)]`, guaranteed >= the true count and over by at
most ~2N/width with high probability.

Every hash is the md5-derived portable hash, so the ENTIRE sketch — every
cell, every estimate — is bit-reproducible in DuckDB and the operator is
fully value-checkable (not assertion-checked like the HLL/GK profile: CMS
arithmetic is pure integers, so the oracle can rebuild the grid exactly).
Production swap: xxhash64 rows (JVM-intrinsic) once cross-engine parity
isn't needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash64

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(key, row: int, width: int):
    # Row-salted portable hash -> bucket. The salt prefix ("cms<row>:")
    # gives depth independent hash functions from one base hash.
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"cms{row}:"), key)), F.lit(width)
    ).cast("int")


def _cells(key, depth: int, width: int):
    """Exploded (row, bucket) cells for one key — the SINGLE definition of
    cell derivation, used by both the build and the probe side (divergent
    copies would silently hash build and probe to different buckets)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row"),
                    _bucket(key, i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_build(
    keys: DataFrame,
    key_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt) — the sketch grid from one pass over the key
    stream. depth×width rows regardless of input size; partial aggregation
    does the per-partition sketching, the shuffle merges depth×width cells."""
    cells = keys.select(_cells(F.col(key_col), depth, width).alias("rb"))
    return cells.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key_col, cms_est) for each probe key: min over the key's depth
    cells. The sketch is depth×width rows — always broadcast.

    LEFT join from the probe cells: a probe key the stream never touched
    hashes to cells absent from the grouped sketch (count 0), and an inner
    join would silently drop it from the output instead of estimating 0
    (ADVICE r3). COALESCE(cnt, 0) restores the true CMS semantics
    `min_i grid[i][h_i(key)]` with empty cells reading 0."""
    pb = probes.select(
        key_col, _cells(F.col(key_col), depth, width).alias("rb")
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    keys: DataFrame,
    key_col: str = "term",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Exact top-k keys with their CMS estimates side by side:
    (key_col, exact_cnt, cms_est, overcount). overcount = cms_est −
    exact_cnt is always >= 0 (the CMS one-sided error guarantee, now a
    value-checked column). Ties in the top-k cut break on ascending key."""
    exact = (
        keys.groupBy(key_col)
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc(key_col))
        .limit(k)
    )
    sketch = cms_build(keys, key_col, depth, width)
    est = cms_estimate(sketch, exact.select(key_col), key_col, depth, width)
    return exact.join(est, key_col).select(
        key_col,
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


def hll_daily_rollup(
    events: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    rel_err_bound_pct: int = 5,
) -> DataFrame:
    """Mergeable-sketch rollup: per-(group, epoch-day) Apache DataSketches
    HLL partials (`hll_sketch_agg`) unioned per group (`hll_union_agg`) —
    the pre-aggregation pattern that answers "distinct users over ANY day
    range" at 100 TB by merging kilobyte sketches instead of re-scanning
    the fact table (exact COUNT(DISTINCT) shuffles every distinct value,
    and exact partials are NOT mergeable — 3 dedups/day don't sum to the
    cross-day dedup).

    Sketch bits are implementation-specific, so (like
    `lineitem_approx_profile`) the output carries the exact distinct
    count, the exact day count, and ONE integer assertion: the merged
    estimate is within `rel_err_bound_pct` of the exact count (HLL
    default lgK=12 ≈ 1.6% rsd, so 5% is a stable contract). The exact
    pass exists only to judge the sketches; a production rollup drops it.

    Output: (group_col, exact_users, n_days, hll_merge_ok)."""
    day = F.floor(F.unix_timestamp(ts_col) / F.lit(86400)).cast("long")
    daily = (
        events.select(group_col, day.alias("_day"), key_col)
        .groupBy(group_col, "_day")
        .agg(F.hll_sketch_agg(key_col).alias("_sk"))
    )
    merged = daily.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"),
        F.count("*").alias("n_days"),
    )
    exact = events.groupBy(group_col).agg(
        F.count_distinct(key_col).alias("exact_users")
    )
    return exact.join(merged, group_col).select(
        group_col,
        "exact_users",
        "n_days",
        (
            F.abs(F.col("_est") - F.col("exact_users")) * F.lit(100)
            <= F.col("exact_users") * F.lit(rel_err_bound_pct)
        )
        .cast("int")
        .alias("hll_merge_ok"),
    )
