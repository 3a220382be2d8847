"""Unit tests for Bloom-filter join pruning (operators/bloomjoin.py) and
run-length encoding (operators/sequence.py run_length_encode): exactness
properties, pruning effectiveness, and the plan shapes the docstrings claim.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prune,
    bloom_pruned_join,
)
from analyzing_big_data_in_scala_spark.operators.sequence import run_length_encode


def test_bloom_join_equals_plain_join(spark):
    # 1000 fact rows keyed 0..199 (5x multiplicity), build side = 37 keys
    # (some with duplicate build rows, some matching nothing).
    big = spark.range(1000).select((F.col("id") % 200).alias("k"), F.col("id").alias("payload"))
    build = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 74, 2)] + [(4, "dup"), (9999, "nomatch")],
        ["k", "tag"],
    )
    got = bloom_pruned_join(big, build, "k", m_bits=1 << 10, k=3)
    want = big.join(build, on="k", how="inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_prune_is_superset_and_selective(spark):
    # No false negatives: every true match survives the prune. And with a
    # selective build side the prune actually removes most rows (fpp is
    # tiny at 1<<16 bits for 5 keys).
    big = spark.range(20000).select(F.col("id").alias("k"))
    keys = spark.createDataFrame([(i,) for i in (3, 7, 11, 13, 19999)], ["k"])
    bloom = bloom_build(keys, "k", m_bits=1 << 16, k=3)
    pruned = bloom_prune(big, "k", bloom, m_bits=1 << 16, k=3)
    kept = {r.k for r in pruned.collect()}
    assert {3, 7, 11, 13, 19999} <= kept
    assert len(kept) < 200  # 20000 rows cut to matches + a few false positives


def test_bloom_key_col_must_be_plain_identifier(spark):
    keys = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="identifier"):
        bloom_build(keys, "t.k")


def test_bloom_prune_stays_codegen_native(spark):
    # The probe is pure builtin expressions: no Python eval nodes anywhere.
    big = spark.range(100).select(F.col("id").alias("k"))
    keys = spark.range(5).select(F.col("id").alias("k"))
    pruned = bloom_prune(big, "k", bloom_build(keys, "k"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1, 0, 0, sec), uid, typ)
            for eid, sec, uid, typ in rows
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )


def test_run_length_encode_hand_computed(spark):
    # user 1: A A B A A A  -> runs (A,2)(B,1)(A,3); user 2: C -> (C,1)
    ev = _ev(
        spark,
        [
            (1, 1, 1, "A"),
            (2, 2, 1, "A"),
            (3, 3, 1, "B"),
            (4, 4, 1, "A"),
            (5, 5, 1, "A"),
            (6, 6, 1, "A"),
            (7, 1, 2, "C"),
        ],
    )
    got = {
        (r.user_id, r.run_id): (r.event_type, r.run_len, r.first_event_id)
        for r in run_length_encode(ev).collect()
    }
    assert got == {
        (1, 1): ("A", 2, 1),
        (1, 2): ("B", 1, 3),
        (1, 3): ("A", 3, 4),
        (2, 1): ("C", 1, 7),
    }


def test_run_length_encode_ts_ties_broken_by_event_id(spark):
    # Same ts for all three rows: order must fall back to event_id, so the
    # sequence is A(1) B(2) A(3) -> 3 runs, never 2.
    ev = _ev(spark, [(1, 5, 1, "A"), (2, 5, 1, "B"), (3, 5, 1, "A")])
    assert run_length_encode(ev).count() == 3


def test_run_length_encode_single_shuffle(spark):
    # The closing (user, run_id) aggregate must reuse the window's hash
    # partitioning on user_id (superset-key distribution): exactly ONE
    # shuffle in the whole plan.
    ev = _ev(spark, [(1, 1, 1, "A"), (2, 2, 1, "B")])
    plan = run_length_encode(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pooled_acf_matches_numpy(spark):
    """Differential: pooled_acf's per-(group, lag) coefficient equals a
    direct numpy Pearson over the same lag pairs (pooled across the two
    users' series, never across the user boundary)."""
    import numpy as np

    from analyzing_big_data_in_scala_spark.operators.sequence import pooled_acf

    rows = []
    series = {
        ("a", 1): [3.0, 5.0, 4.0, 8.0, 6.0, 7.0],
        ("a", 2): [1.0, 2.0, 4.0, 3.0],
        ("b", 1): [10.0, 10.5, 9.0, 12.0, 11.0],
    }
    eid = 0
    for (g, u), vals in series.items():
        for i, v in enumerate(vals):
            rows.append((eid, g, u, i, v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts long, value double"
    )
    got = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf_ppm"])
        for r in pooled_acf(df, lags=(1, 2)).collect()
    }

    for g in ("a", "b"):
        for lag in (1, 2):
            xs, ys = [], []
            for (gg, _u), vals in series.items():
                if gg != g:
                    continue
                iv = [round(v * 100) for v in vals]
                xs += iv[lag:]
                ys += iv[:-lag]
            if not xs:
                assert (g, lag) not in got
                continue
            x, y = np.array(xs, dtype=float), np.array(ys, dtype=float)
            n = len(x)
            num = n * (x * y).sum() - x.sum() * y.sum()
            den = np.sqrt(n * (x * x).sum() - x.sum() ** 2) * np.sqrt(
                n * (y * y).sum() - y.sum() ** 2
            )
            want = int(np.round(1e6 * num / den))
            assert got[(g, lag)][0] == n
            assert abs(got[(g, lag)][1] - want) <= 1  # float assoc in numpy only


def test_top_principal_direction_finds_dominant_axis(spark):
    """A corpus stretched along a known axis (dim 3, with small noise on
    dim 7) must converge to ±e3: component_e4[3] = 10000 (sign-fixed
    positive), every other |component| small. Degenerate corpora raise."""
    import pytest

    from analyzing_big_data_in_scala_spark.operators.projection import (
        top_principal_direction,
    )

    def vec(main, noise):
        v = [0.0] * 16
        v[3] = main
        v[7] = noise
        return v

    emb = spark.createDataFrame(
        [(i, vec((1.0 if i % 2 else -1.0) * (1.0 + i % 3), 0.05 * (i % 5 - 2)))
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    got = {r["dim_idx"]: r["component_e4"] for r in
           top_principal_direction(emb, iterations=8, in_dim=16).collect()}
    assert got[3] == 10000
    assert all(abs(got[i]) < 2000 for i in range(16) if i != 3)

    zeros = spark.createDataFrame(
        [(1, [0.0] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="all-zero"):
        top_principal_direction(zeros, in_dim=16)


def test_trend_stats_merge_equals_one_shot(spark):
    """The mergeability claim behind streaming_value_trend: folding the
    sufficient statistics of two disjoint halves (apply_agg_delta) must
    equal the one-shot statistics of the union, and the finalized
    slope/corr must match bit-for-bit."""
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.merge import apply_agg_delta
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        trend_from_stats,
        trend_sufficient_stats,
    )

    def ts(m):
        return datetime.fromtimestamp(1_700_000_000 + m * 60, tz=timezone.utc).replace(
            tzinfo=None
        )

    rows = [
        (i, "a" if i % 3 else "b", 1, ts(i * 7), (i % 11 - 5) / 4.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    )
    half1 = df.filter(F.col("event_id") < 20)
    half2 = df.filter(F.col("event_id") >= 20)
    folded = apply_agg_delta(
        trend_sufficient_stats(half1).localCheckpoint(),
        trend_sufficient_stats(half2),
        keys=["event_type"],
        measures=["n", "sx", "sy", "sxy", "sxx", "syy"],
        count_col="n",
    )
    got = {r["event_type"]: (r["n"], r["slope_ppm"], r["corr_ppm"])
           for r in trend_from_stats(folded).collect()}
    want = {r["event_type"]: (r["n"], r["slope_ppm"], r["corr_ppm"])
            for r in trend_from_stats(trend_sufficient_stats(df)).collect()}
    assert got == want and set(got) == {"a", "b"}


def test_trend_stats_overflow_guard(spark):
    """The Σ-headroom contract is ENFORCED, not just documented (r10
    handoff): a group whose conservative worst-case bound n·max(|x|,|y|)²
    could pass 2^63 fails loudly with the rebase/coarsen remediation —
    even when the actual sums happen to still fit (the silent-wrap zone
    in non-ANSI mode). One 2.2e9-cent row plus two zero rows keeps every
    actual sum under 2^63 (no engine overflow masks the guard) while the
    bound reads 3·(2.2e9)² ≈ 1.45e19."""
    from datetime import datetime, timezone

    import pytest

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        trend_sufficient_stats,
    )

    def ts(m):
        return datetime.fromtimestamp(1_700_000_000 + m * 60, tz=timezone.utc).replace(
            tzinfo=None
        )

    df = spark.createDataFrame(
        [(1, "a", ts(0), 2.2e7), (2, "a", ts(1), 0.0), (3, "a", ts(2), 0.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    with pytest.raises(Exception, match="overflow risk"):
        trend_sufficient_stats(df).collect()
    # Same shape at sane magnitudes passes through the guard untouched.
    ok = spark.createDataFrame(
        [(1, "a", ts(0), 2.5), (2, "a", ts(1), 0.0), (3, "a", ts(2), 1.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    rows = trend_sufficient_stats(ok).collect()
    assert [(r["n"], r["sy"]) for r in rows] == [(3, 350)]


def test_scatter_matrix_fixed_shuffle_shape(spark):
    """The scatter build must be two map-side Generates + ONE hash
    exchange (whose volume is the fixed in_dim² grid) — no self-join."""
    from analyzing_big_data_in_scala_spark.operators.projection import scatter_matrix

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    df = scatter_matrix(emb, in_dim=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Generate") == 2
    assert "Join" not in plan
    # exactness spot check: S_22 = n (component 2 is the constant 1.0
    # -> quantized to round(1/scale)... use the symmetric identity instead
    got = {(r["i"], r["j"]): r["s"] for r in df.collect()}
    assert all(got[(i, j)] == got[(j, i)] for i in range(4) for j in range(4))


def test_twa_negative_values_match_duckdb_oracle(spark):
    """Cross-ENGINE pin for the sign-safe floor division: run the
    registered TWA oracle SQL in DuckDB on a tiny NEGATIVE-value events
    table (the case the non-negative fixture can never exercise) and
    compare to the Spark operator. Guards the r10 finding that DuckDB's
    `//` truncates toward zero exactly like Spark's DIV — both sides
    need the explicit floor correction."""
    from datetime import datetime, timezone

    import duckdb

    from analyzing_big_data_in_scala_spark.plans.registry import QUERIES
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        time_weighted_avg,
    )

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc).replace(
            tzinfo=None
        )

    # -0.05 held 3s then 0: twa = round_half_up(-500.0 e4) = -500 — the
    # truncating form gave -499 on BOTH engines.
    rows = [(0, "a", 1, ts(0), -0.05), (1, "a", 1, ts(3), 0.0),
            (2, "b", 1, ts(0), -0.01), (3, "b", 1, ts(7), -3.33)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_type"]: (r["n_segments"], r["total_span_sec"], r["twa_e4"])
        for r in time_weighted_avg(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{g}', {u}, TIMESTAMP '{t}', {v})"
            for i, g, u, t, v in rows
        )
        + ") t(event_id, event_type, user_id, ts, value)"
    )
    want = {
        g: (int(n), int(s), int(x) if x is not None else None)
        for g, n, s, x in con.execute(
            QUERIES["events_time_weighted_avg"].oracle
        ).fetchall()
    }
    assert got == want
    assert got["a"] == (1, 3, -500)


def test_grouped_trend_matches_numpy(spark):
    """Differential: grouped_trend's slope/correlation equal numpy's OLS
    over the same (centered-minutes, cents) points; a zero-variance-x
    group yields NULLs."""
    from datetime import datetime, timezone

    import numpy as np

    from analyzing_big_data_in_scala_spark.operators.sequence import grouped_trend

    def ts(minutes):
        return datetime.fromtimestamp(
            1_700_000_000 + minutes * 60, tz=timezone.utc
        ).replace(tzinfo=None)

    series = {
        "up": [(0, 1.0), (10, 2.5), (20, 3.9), (35, 6.2)],
        "noise": [(0, 5.0), (7, 1.0), (13, 9.0), (21, 2.0), (40, 7.0)],
        "flat_x": [(5, 1.0), (5, 9.0)],  # zero time variance -> NULLs
    }
    rows = []
    eid = 0
    for g, pts in series.items():
        for m, v in pts:
            rows.append((eid, g, 1, ts(m), v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_type"]: (r["n"], r["slope_ppm"], r["corr_ppm"])
        for r in grouped_trend(df).collect()
    }
    assert got["flat_x"] == (2, None, None)
    for g in ("up", "noise"):
        x = np.array([m for m, _ in series[g]], dtype=float)
        y = np.array([round(v * 100) for _, v in series[g]], dtype=float)
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        den_s = n * (x * x).sum() - x.sum() ** 2
        den_c = np.sqrt(den_s) * np.sqrt(n * (y * y).sum() - y.sum() ** 2)
        assert got[g][0] == n
        assert abs(got[g][1] - int(np.round(1e6 * num / den_s))) <= 1
        assert abs(got[g][2] - int(np.round(1e6 * num / den_c))) <= 1


def test_grouped_trend_no_window_one_corpus_aggregate(spark):
    """Scale-shape guard: the trend must plan with NO Window operator
    (no per-group timeline sort) — the per-group MIN broadcasts back and
    the sufficient statistics come from one hash aggregate."""
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.sequence import grouped_trend

    df = spark.createDataFrame(
        [
            (
                i,
                "t",
                1,
                datetime.fromtimestamp(1_700_000_000 + i * 60, tz=timezone.utc).replace(
                    tzinfo=None
                ),
                float(i % 7),
            )
            for i in range(60)
        ],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )
    plan = grouped_trend(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_pooled_acf_zero_variance_is_null(spark):
    from analyzing_big_data_in_scala_spark.operators.sequence import pooled_acf

    df = spark.createDataFrame(
        [(i, "c", 1, i, 5.0) for i in range(10)],
        "event_id long, event_type string, user_id long, ts long, value double",
    )
    rows = pooled_acf(df, lags=(1,)).collect()
    assert len(rows) == 1 and rows[0]["n_pairs"] == 9
    assert rows[0]["acf_ppm"] is None  # degenerate denominator -> NULL, not a crash


def test_pooled_acf_single_window_pass(spark):
    """All lags must come from ONE (group, series) window shuffle: the
    physical plan has exactly one Exchange hashpartitioning and one Window."""
    from analyzing_big_data_in_scala_spark.operators.sequence import pooled_acf

    df = spark.createDataFrame(
        [(i, "t", i % 3, i, float(i % 7)) for i in range(60)],
        "event_id long, event_type string, user_id long, ts long, value double",
    )
    plan = pooled_acf(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1


def test_time_weighted_avg_hand_computed(spark):
    """Hand-computed LOCF weighting: value 10.0 holds 100s, then 20.0
    holds 300s -> TWA = (1000*100 + 2000*300)/400 cents = 1750 cents
    = 17.5 -> 175000 e4-units. A plain AVG of the three samples would be
    (10+20+30)/3 = 20 -> the burst-proof property is the difference."""
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        time_weighted_avg,
    )

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc).replace(
            tzinfo=None
        )

    df = spark.createDataFrame(
        [
            (1, "a", 7, ts(0), 10.0),
            (2, "a", 7, ts(100), 20.0),
            (3, "a", 7, ts(400), 30.0),  # last obs: excluded (no successor)
            # second user, constant series -> contributes its constant
            (4, "a", 8, ts(0), 40.0),
            (5, "a", 8, ts(50), 40.0),
        ],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )
    rows = {r["event_type"]: r for r in time_weighted_avg(df).collect()}
    a = rows["a"]
    assert a["n_segments"] == 3
    assert a["total_span_sec"] == 100 + 300 + 50
    # (1000*100 + 2000*300 + 4000*50) * 200 + 450) // (2*450)
    num = (1000 * 100 + 2000 * 300 + 4000 * 50) * 200
    assert a["twa_e4"] == (num + 450) // (2 * 450)


def test_time_weighted_avg_constant_series_equals_value(spark):
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        time_weighted_avg,
    )

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc).replace(
            tzinfo=None
        )

    df = spark.createDataFrame(
        [(i, "c", 1, ts(i * 37), 12.34) for i in range(6)],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )
    rows = time_weighted_avg(df).collect()
    assert len(rows) == 1
    assert rows[0]["twa_e4"] == 123400  # 12.34 in 1e-4 units, any weighting
