"""Unit tests for the single-pass curation funnel's round-3 hardening:
kind-namespace parameter validation and the strided passage-dedup gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.operators.curation import (
    curation_funnel_stages,
    funnel_key_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_rejects_kind_collisions(spark):
    docs = _docs(spark, [(1, "a b c")])
    bench = F.col("doc_id") % 25 == 0
    # parameter values that collide with reserved kinds 0..3
    for contam_n, chunk_size in [(3, 32), (5, 2), (0, 32)]:
        with pytest.raises(ValueError, match="reserved kinds"):
            funnel_key_table(docs, bench, contam_n=contam_n, chunk_size=chunk_size)
    # contam_n == chunk_size merges the contamination and chunk families
    with pytest.raises(ValueError, match="reserved kinds"):
        funnel_key_table(docs, bench, contam_n=32, chunk_size=32)


def test_funnel_rejects_bad_stride(spark):
    docs = _docs(spark, [(1, "a b c")])
    bench = F.col("doc_id") % 25 == 0
    for stride in (0, -1, 33):
        with pytest.raises(ValueError, match="chunk_stride"):
            funnel_key_table(docs, bench, chunk_size=32, chunk_stride=stride)


def test_strided_windows_catch_grid_shifted_boilerplate(spark):
    # Doc 2 is doc 1 with a 4-token preamble: the duplicated text sits at a
    # +4 offset relative to doc 1's chunk grid. A shared window is only
    # caught when the two copies' offsets are congruent mod the stride —
    # with aligned 8-token chunks (stride=8, 4 ≢ 0 mod 8) NO chunk hash
    # collides and both docs sail through the passage gate; with stride=4
    # (4 ≡ 0 mod 4) every full window of the shared text collides and the
    # dup fraction crosses the 0.5 gate for both docs.
    filler_a = (
        "the quick brown fox jumps over a lazy dog while we watch it "
        "from this old wooden porch in the warm evening light today"
    )
    boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    filler_b = (
        "a small bird sings near the garden wall and children play games "
        "under tall green trees by the river bank before supper time"
    )
    body = f"{filler_a} {boiler} {filler_b}"
    docs = _docs(
        spark,
        [
            # ids 1/2 are off the doc_id % 25 == 0 bench split
            (1, body),
            (2, "pad1 pad2 pad3 pad4 " + body),
        ],
    )
    bench = F.col("doc_id") % 25 == 0

    def stage(df, name):
        return {r.stage: r.n_docs for r in df.collect()}[name]

    aligned = curation_funnel_stages(
        docs, bench, contam_n=5, chunk_size=8, chunk_stride=None
    )
    strided = curation_funnel_stages(
        docs, bench, contam_n=5, chunk_size=8, chunk_stride=4
    )
    # Both docs pass the text gates either way; only the chunk gate differs.
    assert stage(aligned, "03_not_repetitive") == 2
    assert stage(strided, "03_not_repetitive") == 2
    # Aligned grid misses the shifted duplicate entirely.
    assert stage(aligned, "05_passage_clean") == 2
    # Half-overlapping windows catch it and the gate drops both copies.
    assert stage(strided, "05_passage_clean") == 0
