"""Unit pins for the round-12 ADVICE fixes: finalize-aware overflow-guard
thresholds, NULL-safe prefix-scan stitching, and the freq-table
reserved-name contract. Each test exercises the exact failure mode the
advice named, so a regression re-opens loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_guard_finalize_multiplier_tightens_threshold(spark):
    """A sum whose raw bound fits under 2^63 but whose finalize doubles
    (or ppm-scales) it must trip the guard once the multiplier is
    declared — the factor-2/4e6 windows ADVICE r11 named."""
    from analyzing_big_data_in_scala_spark.operators._util import (
        product_overflow_guard,
        sum_sq_overflow_guard,
    )

    # bound = n*m = 5e18: under 9e18 raw, but 3x (the 2*s+n finalize
    # family) pushes it to 1.5e19 — the silent-wrap zone the old guard
    # let through.
    mid = spark.createDataFrame(
        [("u", 2_500_000_000, 2_000_000_000)], "g string, n long, m long"
    )
    assert mid.select(
        product_overflow_guard("n", "m", "op", "rescale", group_col="g")
    ).collect()[0]["n"] == 2_500_000_000
    with pytest.raises(Exception, match="overflow risk"):
        mid.select(
            product_overflow_guard(
                "n", "m", "op", "rescale", group_col="g", finalize_multiplier=3.0
            )
        ).collect()

    # square form: n*m^2 = 4e18 raw passes; multiplier 3 trips.
    sq = spark.createDataFrame([("u", 4_000_000_000_000_000_000, 1)],
                               "g string, n long, m long")
    assert sq.select(
        sum_sq_overflow_guard("n", "m", "op", "rescale", group_col="g")
    ).collect()[0]["n"] == 4_000_000_000_000_000_000
    with pytest.raises(Exception, match="overflow risk"):
        sq.select(
            sum_sq_overflow_guard(
                "n", "m", "op", "rescale", group_col="g", finalize_multiplier=3.0
            )
        ).collect()

    # mix-drift scale: n*m = 3e12 passes raw but wraps under the ppm
    # finalize's ~4e6x cross-multiplication.
    ppm = spark.createDataFrame(
        [("u", 3_000_000, 1_000_000)], "g string, n long, m long"
    )
    with pytest.raises(Exception, match="overflow risk"):
        ppm.select(
            product_overflow_guard(
                "n", "m", "op", "rescale", group_col="g",
                finalize_multiplier=4.0e6 + 1.0,
            )
        ).collect()


def test_prefix_scan_bucketed_keeps_null_keys(spark):
    """A window partitionBy groups NULL keys (and NULL buckets) into one
    partition and keeps the rows; the carry-stitch decomposition must
    too — the r12 fix replaced the inner equi-stitch (which silently
    dropped them) with eqNullSafe conditions."""
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        prefix_scan_bucketed,
    )

    rows = [
        # (id, key, bucket, t, v) — key NULL for ids 0..3, bucket NULL for 8
        (0, None, 0, 0, 5),
        (1, None, 0, 1, -2),
        (2, None, 1, 2, 7),
        (3, None, 1, 3, -9),
        (4, "a", 0, 0, 1),
        (5, "a", 0, 1, 2),
        (6, "a", 1, 2, 3),
        (7, "b", 0, 0, 4),
        (8, "b", None, -1, 6),  # NULL bucket sorts first (nulls first asc)
    ]
    df = spark.createDataFrame(
        rows, "id long, k string, b int, t long, v long"
    )
    got = {
        r.id: (r.s, r.m)
        for r in prefix_scan_bucketed(
            df, key_col="k", order_cols=("t", "id"), value_col="v",
            bucket_col="b", out_sum="s", out_min="m", anchor_zero=True,
        ).collect()
    }
    # single-window reference over the same total (bucket, t, id) order
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc_nulls_first("b"), "t", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    plain = df.select(
        "id",
        F.sum("v").over(w).alias("s"),
        F.least(F.lit(0), F.min(F.sum("v").over(w)).over(w)).alias("m"),
    )
    want = {r.id: (r.s, r.m) for r in plain.collect()}
    assert len(got) == len(rows), "NULL-key/bucket rows must not be dropped"
    assert got == want


def test_freq_table_reserved_names_rejected(spark):
    """group_col named 'v' or 'c' collides with the scratch names the
    count-table finalize introduces — must raise the documented
    ValueError instead of an ambiguous-column failure downstream."""
    from analyzing_big_data_in_scala_spark.operators.quantiles import (
        freq_table_rank_stats,
        freq_table_rank_stats_from_counts,
    )

    df = spark.createDataFrame([("g1", 1)], "v string, x long")
    with pytest.raises(ValueError, match="internal names"):
        freq_table_rank_stats(df, "v", "x", {"median": "(n + 1) DIV 2"})
    cdf = spark.createDataFrame([("g1", 1, 2)], "c string, val long, cnt long")
    with pytest.raises(ValueError, match="collides"):
        freq_table_rank_stats_from_counts(
            cdf, "c", "val", "cnt", {"median": "(n + 1) DIV 2"}
        )
    # value_col named 'v' is fine — it is aliased away before the finalize.
    ok = spark.createDataFrame([("g1", 3), ("g1", 1)], "g string, v long")
    out = freq_table_rank_stats(ok, "g", "v", {"median": "(n + 1) DIV 2"})
    assert out.collect()[0]["median"] == 1


def test_freq_table_quartiles_match_engine_percentile(spark):
    """The r12 freq-table quartile migration must reproduce the
    engine-native percentile() BIT-FOR-BIT (before the final rounding):
    the positions (n-1)*k/4 and fractions rem/4 are exact doubles and
    the interpolation tree mirrors Spark's Percentile.getPercentile."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: (r.n, r.p25, r.p50, r.p75)
        for r in QUERIES["events_value_quartiles_by_type"].fn(spark, sf).collect()
    }
    from analyzing_big_data_in_scala_spark.sources.catalog import load_events

    native = {
        r.event_type: (r.n, r.p25, r.p50, r.p75)
        for r in load_events(spark, sf)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        )
        .collect()
    }
    assert got == native


def test_language_profile_classifier_fixes_en_leak(spark):
    """Before/after pin for the r12 language-gate upgrade on a
    hand-built GENUINE multilingual micro-fixture (the synthetic driver
    corpus is language-signal-free — every lang label draws from one
    shared 31-term vocabulary — so the improvement can only be measured
    on real text): the old en-only hit-ratio gate mislabels German /
    French / Spanish sentences as 'en' because 'in'/'was'/'an'/'a'/'no'
    are stopwords in those languages too; the profile argmax labels each
    correctly, with zero non-English leak into 'en'."""
    from analyzing_big_data_in_scala_spark.functions.text import STOP_WORDS
    from analyzing_big_data_in_scala_spark.operators.curation import (
        language_profile_table,
    )

    rows = [
        (1, "en", "the cat sat on the mat and it was there with all of these things"),
        (2, "de", "was ist in dem haus und wer war in der stadt an dem tag"),
        (3, "fr", "il est la pour un an et il ne va pas a la table avec les chats"),
        (4, "es", "no se si es para el o para la casa en que vive"),
        (5, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    # OLD gate: en-stopword hit ratio >= 0.05 -> 'en'.
    old = {
        r.doc_id: r.pred
        for r in df.select(
            "doc_id",
            F.when(
                F.aggregate(
                    F.transform(
                        F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), r"\s+"),
                        lambda t: F.when(t.isin(*STOP_WORDS), 1.0).otherwise(0.0),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), r"\s+"))
                >= 0.05,
                "en",
            ).otherwise("unknown").alias("pred"),
        ).collect()
    }
    # The leak this upgrade exists to close: every non-English sentence
    # crossed the old gate's 5% en-stopword floor.
    assert old == {1: "en", 2: "en", 3: "en", 4: "en", 5: "unknown"}

    new = {
        r.doc_id: r.pred_lang
        for r in language_profile_table(df).collect()
    }
    assert new == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_kll_fold_matches_one_shot(spark):
    """Split-merge pin for the streaming KLL maintenance (r12): folding
    per-batch partials through pairwise kll_sketch_merge must grade
    identically to the one-shot per-day sketch build under the shared
    finalize. Small per-group cardinality keeps the k=400 sketches in
    exact mode, so equality is deterministic, not probabilistic."""
    from analyzing_big_data_in_scala_spark.operators.sketches import (
        kll_rollup_finalize,
        kll_value_base,
    )

    import datetime

    rows = [
        (i, "A" if i % 3 else "B", float(i % 37) / 10,
         datetime.datetime(2024, 1, 1 + i % 5, 12, 0, 0))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double, ts timestamp")
    base = kll_value_base(df)
    one_shot = base.groupBy("event_type", "_day").agg(
        F.expr("kll_sketch_agg_bigint(_ve4, 400)").alias("_sk")
    )
    # two "batches" split by event_id parity, folded via pairwise merge
    halves = [
        kll_value_base(df.filter(F.col("event_id") % 2 == p))
        .groupBy("event_type", "_day")
        .agg(F.expr("kll_sketch_agg_bigint(_ve4, 400)").alias(f"_sk{p}"))
        for p in (0, 1)
    ]
    folded = (
        halves[0]
        .join(halves[1], ["event_type", "_day"], "full_outer")
        .select(
            "event_type",
            "_day",
            F.expr(
                "CASE WHEN _sk0 IS NULL THEN _sk1 "
                "WHEN _sk1 IS NULL THEN _sk0 "
                "ELSE kll_sketch_merge_bigint(_sk0, _sk1) END"
            ).alias("_sk"),
        )
    )
    want = {r.event_type: tuple(r) for r in kll_rollup_finalize(one_shot, base).collect()}
    got = {r.event_type: tuple(r) for r in kll_rollup_finalize(folded, base).collect()}
    assert got == want
    assert all(r[2] == 1 for r in got.values())  # n_match: every row once


def test_interarrival_gaps_bucketed_matches_single_window(spark):
    """interarrival_gaps_bucketed must equal the plain single-window LAG
    for every bucket size — bucketing is a physical knob — including
    keys whose events cluster with empty buckets in between (the
    previous-NON-EMPTY-bucket stitch) and same-t tiebreaks."""
    import random

    from pyspark.sql import Window

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        interarrival_gaps_bucketed,
    )

    rng = random.Random(7)
    rows = []
    for i in range(400):
        # clustered timestamps: long dead stretches between bursts
        t = rng.choice([0, 5_000, 200_000, 900_000]) + rng.randint(0, 300)
        rows.append((i, i % 4, t))
    df = spark.createDataFrame(rows, "id long, k long, t long")
    w = Window.partitionBy("k").orderBy("t", "id")
    plain = (
        df.select("k", (F.col("t") - F.lag("t").over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    want = sorted((r.k, r.gap) for r in plain.collect())
    for bucket in (1, 777, 86400, 10_000_000):
        got = sorted(
            (r.k, r.gap)
            for r in interarrival_gaps_bucketed(
                df, key_col="k", ts_col="t", id_col="id", bucket_size=bucket
            ).collect()
        )
        assert got == want, bucket
    import pytest

    with pytest.raises(ValueError, match="internal names"):
        interarrival_gaps_bucketed(
            df.withColumn("gap", F.lit(1)), "k", "t", "id"
        )
