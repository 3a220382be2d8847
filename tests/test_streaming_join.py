"""Stream-stream interval join under real multi-batch streaming: a
purchase arriving batches after its click must still pair (the join
buffers both sides in the state store), and a purchase outside the
attribution gap must not — behavior a single-batch availableNow drain
exercises only degenerately.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.streaming import stream as ST

BASE = 1_700_000_400


def _rows(spark, rows):
    """rows: (id, minute_offset, user, typ)"""
    return spark.createDataFrame(
        rows, "id long, off long, user_id long, typ string"
    ).select(
        "id",
        F.timestamp_seconds(F.lit(BASE) + F.col("off") * 60).alias("ts"),
        "user_id",
        "typ",
    )


def _write_one_parquet(df, tmpdir: str, name: str, mtime: float) -> None:
    staging = os.path.join(tmpdir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    dest = os.path.join(tmpdir, "stream", name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    os.utime(dest, (mtime, mtime))


def test_interval_join_pairs_across_batches_and_bounds_gap(spark, tmp_path):
    tmpdir = str(tmp_path)
    now = time.time()
    # batch 1: two clicks (users 1 and 2), no purchases yet.
    _write_one_parquet(
        _rows(spark, [(1, 0, 1, "c"), (2, 5, 2, "c")]), tmpdir, "b1.parquet", now - 300
    )
    # batch 2: user 1 purchases 30 min after the click -> must pair with
    # the click BUFFERED from batch 1.
    _write_one_parquet(_rows(spark, [(3, 30, 1, "p")]), tmpdir, "b2.parquet", now - 200)
    # batch 3: user 2 purchases 395 min after the click -> outside the
    # 6-hour gap, must NOT pair; user 3 purchase has no click at all.
    _write_one_parquet(
        _rows(spark, [(4, 400, 2, "p"), (5, 401, 3, "p")]),
        tmpdir,
        "b3.parquet",
        now - 100,
    )

    source = (
        spark.readStream.schema("id long, ts timestamp, user_id long, typ string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(os.path.join(tmpdir, "stream"))
    )
    clicks = source.filter(F.col("typ") == "c").select(
        F.col("id").alias("click_id"), F.col("ts").alias("click_ts"), "user_id"
    )
    purchases = source.filter(F.col("typ") == "p").select(
        F.col("id").alias("purchase_id"), F.col("ts").alias("purchase_ts"), "user_id"
    )
    joined = ST.stream_stream_interval_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        max_gap="6 hours",
        watermark="12 hours",
    ).select("click_id", "purchase_id", "user_id")

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_interval_join")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.click_id, r.purchase_id) for r in spark.table("t_interval_join").collect()}
    assert got == {(1, 3)}, got


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    tmpdir = str(tmp_path)
    now = time.time()
    # batch 1: clicks for users 1 and 2; batch 2: user 1 purchases 30 min
    # later (pairs); batch 3: far-future click+purchase (user 9, +2000 min
    # = 33h) push BOTH sides' watermarks to ~BASE+21h — past user 2's
    # click + 6h gap, so its NULL row must flush.
    _write_one_parquet(
        _rows(spark, [(1, 0, 1, "c"), (2, 5, 2, "c")]), tmpdir, "b1.parquet", now - 300
    )
    _write_one_parquet(_rows(spark, [(3, 30, 1, "p")]), tmpdir, "b2.parquet", now - 200)
    _write_one_parquet(
        _rows(spark, [(6, 2000, 9, "c"), (7, 2001, 9, "p")]),
        tmpdir,
        "b3.parquet",
        now - 100,
    )

    source = (
        spark.readStream.schema("id long, ts timestamp, user_id long, typ string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(os.path.join(tmpdir, "stream"))
    )
    clicks = source.filter(F.col("typ") == "c").select(
        F.col("id").alias("click_id"), F.col("ts").alias("click_ts"), "user_id"
    )
    purchases = source.filter(F.col("typ") == "p").select(
        F.col("id").alias("purchase_id"), F.col("ts").alias("purchase_ts"), "user_id"
    )
    joined = ST.stream_stream_interval_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        max_gap="6 hours",
        watermark="12 hours",
        how="left_outer",
    ).select("click_id", "purchase_id", "user_id")

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_interval_join_outer")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("t_interval_join_outer").collect()
    got = {(r.click_id, r.purchase_id, r.user_id) for r in rows}
    # (1,3) matched; user 2's click emits ONCE with NULL purchase and the
    # LEFT key intact (the self-join ambiguity regression: the surviving
    # user_id used to be the right side's -> NULL here). User 9's pair
    # at +2000min matches within gap.
    assert (1, 3, 1) in got and (2, None, 2) in got, got
    # the unmatched row must not duplicate
    assert sum(1 for r in rows if r.click_id == 2) == 1
