"""Data-quality operator tests: column profiling, constraint checks,
blocked fuzzy record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.operators.linkage import blocked_fuzzy_pairs
from analyzing_big_data_in_scala_spark.operators.quality import (
    column_profile,
    quality_checks,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", -3.0), (3, None, 10.0), (3, "beta", None)],
        "id long, s string, v double",
    )


def test_column_profile_stats(spark, frame):
    got = {r.column: r for r in column_profile(frame).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0 and got["id"].n_distinct == 3
    assert got["id"].min_num == 1.0 and got["id"].max_num == 3.0 and got["id"].min_str is None
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert got["s"].min_str == "alpha" and got["s"].max_str == "beta" and got["s"].min_num is None
    assert got["v"].n_nulls == 1 and got["v"].min_num == -3.0 and got["v"].max_num == 10.0


def test_column_profile_unknown_column_rejected(spark, frame):
    with pytest.raises(ValueError, match="unknown columns"):
        column_profile(frame, ["nope"])


def test_quality_checks_counts(spark, frame):
    got = {
        r.check: (r.n_violations, r.passed)
        for r in quality_checks(
            frame,
            {
                "pk_unique": F.count("*") - F.countDistinct("id"),
                "s_not_null": F.sum(F.col("s").isNull().cast("long")),
                "v_non_negative": F.sum((F.col("v") < 0).cast("long")),
            },
        ).collect()
    }
    assert got["pk_unique"] == (1, False)
    assert got["s_not_null"] == (1, False)
    assert got["v_non_negative"] == (1, False)


def test_blocked_fuzzy_pairs_blocks_and_distance(spark):
    people = spark.createDataFrame(
        [
            (1, "smith john"),
            (2, "smith jon"),    # distance 1 from id 1, same block
            (3, "smith joan"),   # distance 1 from 1 ("h"->"a"... actually sub+ins), <=2 from both
            (4, "zmith john"),   # leading typo: DIFFERENT block, never compared
        ],
        "id long, name string",
    )
    pairs = {
        (r.id_a, r.id_b): r.distance
        for r in blocked_fuzzy_pairs(
            people, "id", "name", block=F.substring("name", 1, 3), max_distance=2
        ).collect()
    }
    assert pairs[(1, 2)] == 1
    assert (1, 4) not in pairs and (2, 4) not in pairs  # blocking recall bound
    assert all(d <= 2 for d in pairs.values())


def test_stratified_exact_sample_counts_and_stability(spark):
    """Exactly n per stratum (all of a smaller stratum); membership is a
    pure function of the key, so adding UNRELATED rows to another stratum
    never changes an existing stratum's picks."""
    from analyzing_big_data_in_scala_spark.operators.sampling import (
        stratified_exact_sample,
    )

    rows = [(i, "a") for i in range(20)] + [(100 + i, "b") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_exact_sample(df, "source", 5, key="doc_id").collect()
    by = {}
    for r in out:
        by.setdefault(r.source, set()).add(r.doc_id)
    assert len(by["a"]) == 5
    assert by["b"] == {100, 101, 102}  # smaller stratum: kept whole
    # Growth in stratum b must not disturb stratum a's membership.
    more = df.union(
        spark.createDataFrame([(200 + i, "b") for i in range(50)], "doc_id long, source string")
    )
    out2 = stratified_exact_sample(more, "source", 5, key="doc_id").collect()
    a2 = {r.doc_id for r in out2 if r.source == "a"}
    assert a2 == by["a"]


def test_token_drift_chi2_flags_planted_shift(spark):
    """A token that explodes in the current snapshot dominates the drift
    report; a token with identical shares contributes ~zero chi-square."""
    from analyzing_big_data_in_scala_spark.operators.drift import token_drift_chi2

    base = spark.createDataFrame(
        [(i, "stable filler words " + ("old " * 10)) for i in range(10)],
        "doc_id long, text string",
    )
    cur = spark.createDataFrame(
        [(i, "stable filler words " + ("new " * 10)) for i in range(10)],
        "doc_id long, text string",
    )
    out = token_drift_chi2(base, cur, k=5, min_total=5).collect()
    top = out[0]
    assert top.token in ("old", "new")  # the swapped tokens dominate
    assert top.chi2 > 50
    by = {r.token: r.chi2 for r in out}
    # Identical-share tokens score ~0 (and sort last if present at all).
    assert by.get("stable", 0.0) < 1e-6


def test_value_histogram_bins_and_spine(spark):
    from analyzing_big_data_in_scala_spark.operators.quality import value_histogram

    rows = [("A", 0.0), ("A", 1.0), ("A", 5.0), ("A", 10.0), ("B", 7.0), ("B", 7.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {(r.k, r.bin): r for r in value_histogram(df, "k", "v", n_bins=5).collect()}
    # A: range [0,10], width 2 -> 0.0,1.0 in bin 0; 5.0 in bin 2; max 10.0
    # CLAMPS into the last bin (4); empty bins present with n=0
    assert len(got) == 10  # 2 groups x 5 bins
    assert got[("A", 0)].n == 2 and got[("A", 2)].n == 1 and got[("A", 4)].n == 1
    assert got[("A", 1)].n == 0 and got[("A", 3)].n == 0
    assert (got[("A", 0)].bin_lo, got[("A", 0)].bin_hi) == (0.0, 2.0)
    # B degenerate (all equal): everything in bin 0, no NaN bin
    assert got[("B", 0)].n == 2
    assert sum(r.n for r in got.values() if r.k == "B") == 2

    with pytest.raises(ValueError, match="n_bins"):
        value_histogram(df, "k", "v", n_bins=0)


def test_equi_depth_histogram_hand_computed(spark):
    from analyzing_big_data_in_scala_spark.operators.quality import (
        equi_depth_histogram,
    )

    # 7 rows, 3 buckets: NTILE puts 3,2,2 (first n mod b buckets get the
    # extra row); values chosen so bucket boundaries are obvious.
    rows = [(i, "A", float(v)) for i, v in enumerate([5, 1, 3, 2, 4, 7, 6])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {
        r.bucket: (r.n, r.lo_ve4, r.hi_ve4)
        for r in equi_depth_histogram(df, "event_type", "value", "event_id", n_buckets=3).collect()
    }
    assert got == {
        1: (3, 10000, 30000),
        2: (2, 40000, 50000),
        3: (2, 60000, 70000),
    }


def test_equi_depth_histogram_freq_table_shape(spark):
    """r12 migration: the corpus-sized operator must be ONE hash
    aggregate to per-(key, value) counts — no corpus NTILE window (a
    single-task per-group sort at 100 TB). The remaining window/bucket
    exchanges run over the tiny count table only."""
    from analyzing_big_data_in_scala_spark.operators.quality import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0)], "event_id long, event_type string, value double"
    )
    plan = (
        equi_depth_histogram(df, "event_type", "value", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ntile" not in plan.lower(), plan
    # corpus side: partial count aggregate before the first exchange
    # (map-side combine); post-aggregate exchanges are count-table-sized.
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "partial_count" in plan, plan
