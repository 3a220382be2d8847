"""Training-export packing: assign documents to token-budgeted shards.

The core primitive is a GLOBAL running sum in a deterministic order — the
textbook trap at scale: `SUM(x) OVER (ORDER BY k)` with no PARTITION BY
collapses the whole dataset into ONE window partition (Spark literally
warns "No Partition Defined for Window operation"), serializing 100 TB
through a single task. The scale-correct shape is the classic two-phase
distributed prefix sum:

1. bucket rows by a RANGE of the order key (caller-supplied expression —
   value-based, so it is deterministic across runs/engines, unlike
   `repartitionByRange`'s sampled boundaries);
2. cumsum WITHIN each bucket (window partitioned by bucket — parallel);
3. compute each bucket's total, prefix-sum those totals (the bucket-sum
   frame has one row per bucket — thousands, not billions — so its
   single-partition window is free), and broadcast-join the offsets back.

global_cumsum(row) = bucket_offset + within_bucket_cumsum(row).

Shard id = floor((cumsum - row_tokens) / budget): a shard is a contiguous
run of docs in key order holding ~budget tokens (a doc spanning the
boundary goes to the shard where it STARTS, so shards may overshoot by at
most one doc — the standard convention; oversized single docs should be
split upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import single_partition_key


def distributed_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Inclusive running sum of `value_col` in global `order_col` order,
    without a single-partition global window. `bucket` must be a
    monotonic, value-based function of `order_col` (e.g. ``F.floor(F.col(
    "doc_id") / 1000)``): all rows of bucket b sort before all rows of
    bucket b+1. `order_col` must be unique (it is the tiebreak-free sort
    key)."""
    tagged = df.withColumn("_bkt", bucket.cast("long"))
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = tagged.withColumn("_in_sum", F.sum(value_col).over(w_in))

    totals = tagged.groupBy("_bkt").agg(F.sum(value_col).alias("_tot"))
    # One row per bucket: this single-partition window is over a frame
    # thousands of rows long, not the dataset — the whole point. The
    # constant partition key is semantics-free (see single_partition_key).
    w_off = (
        Window.partitionBy(single_partition_key("_bkt"))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))

    return (
        within.join(F.broadcast(offsets.select("_bkt", "_off")), "_bkt")
        .withColumn(out_col, (F.col("_in_sum") + F.col("_off")).cast("long"))
        .drop("_bkt", "_in_sum")
    )


def pack_token_shards(
    docs: DataFrame,
    tokens_col: str,
    shard_tokens: int,
    order_col: str = "doc_id",
    bucket_width: int = 1000,
) -> DataFrame:
    """Assign each doc a `shard` id so consecutive docs (in `order_col`
    order) fill ~`shard_tokens`-token shards. Adds `running_tokens`
    (inclusive) and `shard`. Deterministic: a pure function of the input
    values, so re-runs and other engines produce identical shards."""
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width))
    summed = distributed_running_sum(
        docs, order_col, tokens_col, bucket, out_col="running_tokens"
    )
    return summed.withColumn(
        "shard",
        F.floor(
            (F.col("running_tokens") - F.col(tokens_col)) / F.lit(shard_tokens)
        ).cast("long"),
    )
