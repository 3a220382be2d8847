"""Unit pins for the round-13 ADVICE fixes: the burstiness 0/0 guard, the
norm-profile empty-vector guard, and equi_depth_histogram's id_col
validation. The two guard tests run BOTH engines on a crafted degenerate
fixture (the exact input ADVICE r12 named), so a regression re-opens as a
cross-engine divergence, not a silent NULL."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_check import compare


def _mini_sf(spark, tmp_path, events_rows=None, embeddings_rows=None) -> str:
    """Write a minimal sf-dir with just the tables a query loads."""
    sf = str(tmp_path / "sf")
    if events_rows is not None:
        spark.createDataFrame(
            events_rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    if embeddings_rows is not None:
        spark.createDataFrame(
            embeddings_rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{sf}/embeddings.parquet"
        )
    return sf


def test_burstiness_all_zero_gaps_is_null_on_both_engines(spark, tmp_path):
    """ADVICE r12: a type whose events all share one timestamp has every
    gap = 0 → sigma = mu = 0 → 0/0. Pre-guard, Spark's non-ANSI cast
    silently yielded NULL while DuckDB ERRORED on CAST(ROUND(nan) AS
    BIGINT). Post-guard both engines must return a NULL ppm row — checked
    with the driver-strength comparator."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # degenerate type: three events, ONE timestamp → gaps 0, 0
        (1, t0, 10, "burst", 1.0, "{}"),
        (2, t0, 11, "burst", 1.0, "{}"),
        (3, t0, 12, "burst", 1.0, "{}"),
        # healthy type: gaps 10 and 20 s → well-defined ppm
        (4, t0, 20, "ok", 1.0, "{}"),
        (5, t0 + dt.timedelta(seconds=10), 20, "ok", 1.0, "{}"),
        (6, t0 + dt.timedelta(seconds=30), 20, "ok", 1.0, "{}"),
    ]
    sf = _mini_sf(spark, tmp_path, events_rows=rows)
    spec = QUERIES["events_burstiness_index"]

    got = {
        r["event_type"]: (r["n_gaps"], r["burstiness_ppm"])
        for r in spec.fn(spark, sf).collect()
    }
    assert got["burst"] == (2, None)
    # gaps 10, 20: mu=15, sigma=5 → (5-15)/(5+15) = -0.5 → -500000 ppm
    assert got["ok"] == (2, -500_000)

    # DuckDB must RUN (pre-guard it raised) and hash-match Spark.
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    out = compare(spec.fn(spark, sf), con, spec.oracle)
    assert out["values_match"], out


def test_norm_profile_drops_empty_vectors_on_both_engines(spark, tmp_path):
    """ADVICE r12: a zero-length embedding made Spark's F.aggregate emit
    the 0 seed (bucket 0) while the oracle's scalar-subquery SUM emitted
    NULL. Post-guard both engines drop empties; the remaining vectors
    bucket identically."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    rows = [
        (1, [], 0),                 # the degenerate input
        (2, [0.6, 0.8], 0),         # norm 1.0 → bucket 10
        (3, [0.3, 0.4], 1),         # norm 0.5 → bucket 5
        (4, [0.0, 1.0], 1),         # norm 1.0 → bucket 10
    ]
    sf = _mini_sf(spark, tmp_path, embeddings_rows=rows)
    spec = QUERIES["embeddings_norm_profile"]

    got = {r["bucket"]: (r["n_vecs"], r["share_ppm"])
           for r in spec.fn(spark, sf).collect()}
    # empty vector gone: 3 vectors total, no bucket 0 row
    assert 0 not in got
    assert got[10] == (2, 666_667) and got[5] == (1, 333_333)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" '{sf}/embeddings.parquet/*.parquet'"
    )
    out = compare(spec.fn(spark, sf), con, spec.oracle)
    assert out["values_match"], out


def test_minhash_recall_sampling_commutes(spark):
    """VERDICT r12 item 4: the recall audit's id-space sampling dial.
    mod=1 must be byte-identical to the unsampled call, and a mod-2 run
    must equal the full audit applied to the pre-filtered doc set
    (sampling commutes with the audit), with invalid dials rejected."""
    import pytest as _pytest

    from analyzing_big_data_in_scala_spark.functions.text import portable_hash64
    from analyzing_big_data_in_scala_spark.operators.dedup import (
        minhash_recall_eval,
    )
    from analyzing_big_data_in_scala_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    full = rows(minhash_recall_eval(docs, num_perm=16, bands=4, k=3))
    assert full == rows(
        minhash_recall_eval(docs, num_perm=16, bands=4, k=3, sample_mod=1)
    )

    pre = docs.where(portable_hash64(F.col("doc_id")) % 2 == 0)
    assert rows(
        minhash_recall_eval(docs, num_perm=16, bands=4, k=3, sample_mod=2)
    ) == rows(minhash_recall_eval(pre, num_perm=16, bands=4, k=3))

    for mod, rem in ((0, 0), (2, 2), (2, -1)):
        with _pytest.raises(ValueError, match="sample_mod"):
            minhash_recall_eval(docs, sample_mod=mod, sample_rem=rem)


def test_temperature_guard_fires_at_finalize_wrap_point(spark):
    """r13 review: the e6-quantized temperature weight gives the ppm
    finalize 1e6x less headroom than the usual 2000000*count recipe —
    the guard must raise loudly where Spark's non-ANSI mode would wrap
    silently (~3.3e9 docs in one source), and pass below it."""
    from analyzing_big_data_in_scala_spark.plans.pipeline_queries import (
        _temp_total_guard,
    )

    ok = spark.createDataFrame(
        [(4_000_000_000_000, 4_000_000_000_000)], "t07 long, _m07 long"
    )
    assert ok.select(_temp_total_guard("t07", "_m07")).collect()[0][
        "t07"
    ] == 4_000_000_000_000
    hot = spark.createDataFrame(
        [(5_000_000_000_000, 5_000_000_000_000)], "t07 long, _m07 long"
    )
    with pytest.raises(Exception, match="overflow risk"):
        hot.select(_temp_total_guard("t07", "_m07")).collect()


def test_markov_transitions_bucketed_matches_plain(spark):
    """VERDICT r12 item 7: the bucketed LEAD twin must be value-identical
    to the plain window form — on the real fixture AND on a crafted
    micro-fixture exercising the stitch's edge cases (multi-day empty
    stretches between a user's buckets, single-event buckets chaining
    boundary transitions, same-timestamp ties resolved by event_id)."""
    import datetime as dt

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        markov_transitions,
        markov_transitions_bucketed,
    )
    from analyzing_big_data_in_scala_spark.sources.catalog import load_table

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert rows(markov_transitions(ev)) == rows(markov_transitions_bucketed(ev))

    t0 = dt.datetime(2024, 3, 1)

    def at(days, secs=0):
        return t0 + dt.timedelta(days=days, seconds=secs)

    micro = spark.createDataFrame(
        [
            # user 10: one event per day with 3-day empty stretches —
            # every transition is a boundary stitch across non-adjacent
            # buckets (single-event buckets chain a->b->c->d).
            (1, at(0), 10, "a", 0.0, "{}"),
            (2, at(3), 10, "b", 0.0, "{}"),
            (3, at(6), 10, "c", 0.0, "{}"),
            (4, at(9), 10, "d", 0.0, "{}"),
            # user 20: ties on one timestamp (order = event_id) plus a
            # within-day pair and one boundary.
            (5, at(0, 100), 20, "x", 0.0, "{}"),
            (6, at(0, 100), 20, "y", 0.0, "{}"),
            (7, at(0, 200), 20, "z", 0.0, "{}"),
            (8, at(1, 50), 20, "x", 0.0, "{}"),
            # user 30: single event — no transitions at all.
            (9, at(5), 30, "q", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got_plain = rows(markov_transitions(micro))
    got_bucketed = rows(markov_transitions_bucketed(micro))
    assert got_plain == got_bucketed
    # hand-derived: a->b, b->c, c->d (user 10); x->y, y->z, z->x (user 20)
    got = {(r[0], r[1]): r[2] for r in got_bucketed}
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("x", "y"): 1, ("y", "z"): 1, ("z", "x"): 1,
    }

    # reserved-name collision fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        markov_transitions_bucketed(micro.withColumn("_mtb_b", F.lit(1)))


def test_equi_depth_histogram_rejects_missing_columns(spark):
    """ADVICE r12: id_col is contract-only after the freq-table migration
    but must still name a real column — a stale tiebreak should fail
    loudly, not silently succeed."""
    from analyzing_big_data_in_scala_spark.operators.quality import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1)], "event_type string, value double, event_id long"
    )
    # valid call still works; case-insensitive names resolve like the
    # engine's own default resolution (spark.sql.caseSensitive=false)
    assert equi_depth_histogram(
        df, "event_type", "value", "event_id", n_buckets=1
    ).count() == 1
    assert equi_depth_histogram(
        df, "event_type", "value", "Event_Id", n_buckets=1
    ).count() == 1
    with pytest.raises(ValueError, match="not in"):
        equi_depth_histogram(df, "event_type", "value", "nope")
    with pytest.raises(ValueError, match="not in"):
        equi_depth_histogram(df, "event_type", "missing_value", "event_id")


def test_shared_shingle_arrays_passthrough_is_value_identical(spark):
    """r15 (VERDICT r14 item 7): every shingle consumer that accepts a
    prebuilt shingle_array_table frame must produce EXACTLY what it
    produces when deriving its own shingles — the shared tokenize pass
    only factors out the string-building map, never the hash or the
    cross-partition distinct."""
    from analyzing_big_data_in_scala_spark.operators.dedup import (
        hashed_shingle_table,
        minhash_candidates,
        ngram_jaccard_pairs,
        shingle_array_table,
    )
    from analyzing_big_data_in_scala_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    sharr = shingle_array_table(docs, 3).localCheckpoint(eager=False)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for bits in (40, 64):
        assert rows(hashed_shingle_table(docs, 3, bits=bits)) == rows(
            hashed_shingle_table(docs, 3, bits=bits, shingle_arrays=sharr)
        )
    assert rows(ngram_jaccard_pairs(docs, k=3, threshold=0.2)) == rows(
        ngram_jaccard_pairs(docs, k=3, threshold=0.2, shingle_arrays=sharr)
    )
    assert rows(minhash_candidates(docs, 16, 4, 3)) == rows(
        minhash_candidates(docs, 16, 4, 3, shingle_arrays=sharr)
    )
