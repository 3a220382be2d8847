"""MERGE/CDC upsert operator tests (operators/merge.py): arm semantics,
log compaction by sequence, deterministic tie-breaks, schema guards."""

from __future__ import annotations

import pytest

from analyzing_big_data_in_scala_spark.operators.merge import merge_upsert


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )


def test_merge_arms(spark, base):
    changes = spark.createDataFrame(
        [
            (2, "U", "b2", 21.0),   # update existing
            (3, "D", None, None),   # delete existing
            (4, "I", "d", 40.0),    # insert new
            (5, "U", "e", 50.0),    # U on absent key -> insert (upsert)
        ],
        "k long, op string, s string, v double",
    )
    got = sorted((r.k, r.s, r.v) for r in merge_upsert(base, changes, "k").collect())
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0), (5, "e", 50.0)]


def test_merge_seq_compaction_latest_wins(spark, base):
    changes = spark.createDataFrame(
        [
            (2, "U", "x", 1.0, 1),
            (2, "U", "y", 2.0, 3),   # latest seq wins
            (2, "D", None, None, 2),
            (3, "D", None, None, 5),
            (3, "U", "z", 9.0, 5),   # same seq: D preferred over U
        ],
        "k long, op string, s string, v double, seq int",
    )
    got = sorted(
        (r.k, r.s, r.v)
        for r in merge_upsert(base, changes, "k", seq_col="seq").collect()
    )
    assert got == [(1, "a", 10.0), (2, "y", 2.0)]


def test_merge_missing_columns_rejected(spark, base):
    bad = spark.createDataFrame([(1, "U")], "k long, op string")
    with pytest.raises(ValueError, match="missing columns"):
        merge_upsert(base, bad, "k")


def test_apply_agg_delta_group_lifecycle(spark):
    from pyspark.sql import functions as F

    from analyzing_big_data_in_scala_spark.operators.merge import apply_agg_delta

    base_agg = spark.createDataFrame(
        [("a", 2, 20.0), ("b", 1, 5.0)], "g string, n long, s double"
    )
    # empty group b entirely; create brand-new group c; bump a
    delta = spark.createDataFrame(
        [("a", 1, 7.0), ("b", -1, -5.0), ("c", 2, 9.0)], "g string, n long, s double"
    )
    got = sorted(
        (r.g, r.n, r.s)
        for r in apply_agg_delta(base_agg, delta, ["g"], ["n", "s"], count_col="n").collect()
    )
    assert got == [("a", 3, 27.0), ("c", 2, 9.0)]


def test_merge_changes_derived_from_base_self_join(spark, base):
    # The classic Spark self-join trap: `changes` built FROM `base` shares
    # attribute lineage with it. The operator renames both sides before the
    # full-outer join, so nothing resolves ambiguously (ADVICE r2).
    from pyspark.sql import functions as F

    changes = base.filter(F.col("k") <= 2).select(
        "k", F.lit("U").alias("op"), F.upper("s").alias("s"), (F.col("v") * 2).alias("v")
    )
    got = sorted((r.k, r.s, r.v) for r in merge_upsert(base, changes, "k").collect())
    assert got == [(1, "A", 20.0), (2, "B", 40.0), (3, "c", 30.0)]
