"""Round-14 LEAD-2 bucketed-stitch pins (VERDICT r13 item 4).

The bucketed trigram stream must be VALUE-IDENTICAL to the plain
(key)-partitioned LEAD-2 window. Graded three ways: (1) a plain-Python
brute force (sort per key, slide a window of 3 — no Spark, no SQL) on an
adversarial micro-fixture covering every stitch rule — multi-day empty
stretches, single-event-bucket CHAINS (the rule-c / LAG-2 path),
two-in-prev vs two-in-cur boundaries, timestamp ties, singleton keys;
(2) full-stream equality (not top-20, which could mask misses) against
the plain Spark form on the real fixture; (3) bucket-size invariance.
"""

from __future__ import annotations

import datetime as dt
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, day_offset, secs, uid, etype):
    return (eid, T0 + dt.timedelta(days=day_offset, seconds=secs), uid,
            etype, 1.0, "{}")


# Every stitch rule gets a dedicated user:
ROWS = [
    # u1: all three in ONE bucket (pure local path)
    _ev(1, 0, 10, 1, "a"), _ev(2, 0, 20, 1, "b"), _ev(3, 0, 30, 1, "c"),
    # u2: A(n=3), B(n=1), C(n=2) — exercises local, rule a, rule c, rule b
    _ev(10, 0, 10, 2, "a"), _ev(11, 0, 20, 2, "b"), _ev(12, 0, 30, 2, "c"),
    _ev(13, 2, 10, 2, "d"),                       # empty day 1 in between
    _ev(14, 5, 10, 2, "e"), _ev(15, 5, 20, 2, "f"),
    # u3: one event per bucket across 5 buckets with empty stretches —
    # a CHAIN of single-event buckets (rule c repeatedly)
    _ev(20, 0, 10, 3, "x"), _ev(21, 3, 10, 3, "y"), _ev(22, 4, 10, 3, "z"),
    _ev(23, 8, 10, 3, "x"), _ev(24, 20, 10, 3, "y"),
    # u4: timestamp TIES (same ts, event_id breaks the tie) across a
    # bucket boundary
    _ev(30, 0, 50, 4, "p"), _ev(31, 0, 50, 4, "q"),
    _ev(32, 1, 0, 4, "r"), _ev(33, 1, 0, 4, "s"),
    # u5: two events in different buckets (no trigram at all)
    _ev(40, 0, 10, 5, "a"), _ev(41, 6, 10, 5, "b"),
    # u6: singleton
    _ev(50, 0, 10, 6, "a"),
    # u7: A(n=1) first bucket then B(n=3) — rule b without prevprev
    _ev(60, 0, 10, 7, "m"), _ev(61, 1, 10, 7, "n"), _ev(62, 1, 20, 7, "o"),
    _ev(63, 1, 30, 7, "m"),
]

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")


def _brute_trigrams(rows) -> Counter:
    by_user: dict = {}
    for eid, ts, uid, etype, _, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    out: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for i in range(len(seq) - 2):
            out[(seq[i][2], seq[i + 1][2], seq[i + 2][2])] += 1
    return out


def _collect_trigrams(df) -> Counter:
    return Counter(
        {(r["t0"], r["t1"], r["t2"]): r["n"]
         for r in df.groupBy("t0", "t1", "t2")
         .agg(F.count("*").alias("n")).collect()}
    )


def test_bucketed_trigrams_match_brute_force_on_stitch_fixture(spark):
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        transition_trigrams_bucketed,
    )

    ev = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect_trigrams(transition_trigrams_bucketed(ev))
    want = _brute_trigrams(ROWS)
    assert got == want, (got, want)
    # spot-pin the rule-c chain: u3 contributes (x,y,z), (y,z,x), (z,x,y)
    assert want[("x", "y", "z")] >= 1 and want[("y", "z", "x")] >= 1
    # u2's three-bucket span (c,d,e) exists — the LAG-2 rule fired
    assert got[("c", "d", "e")] == 1


def test_bucketed_trigrams_match_plain_window_on_fixture(spark):
    """FULL-stream equality on the real sf0.001 events table (60k rows):
    bucketed vs the plain two-LEAD window, compared as exact trigram
    counts — a top-20 compare could mask a missing boundary triple."""
    from pyspark.sql import Window

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        transition_trigrams_bucketed,
    )
    from analyzing_big_data_in_scala_spark.sources.catalog import load_events

    ev = load_events(spark, SF_SMALL)
    got = _collect_trigrams(transition_trigrams_bucketed(ev))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    plain = (
        ev.select(
            F.col("event_type").alias("t0"),
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .where(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    )
    want = _collect_trigrams(plain)
    assert got == want
    assert sum(got.values()) > 0


def test_bucketed_trigrams_bucket_size_invariant(spark):
    """The stitch must be invariant to the bucket size dial — hourly
    buckets produce the same stream as daily on the stitch fixture."""
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        transition_trigrams_bucketed,
    )

    ev = spark.createDataFrame(ROWS, SCHEMA)
    daily = _collect_trigrams(transition_trigrams_bucketed(ev, bucket_size=86400))
    hourly = _collect_trigrams(transition_trigrams_bucketed(ev, bucket_size=3600))
    weekly = _collect_trigrams(
        transition_trigrams_bucketed(ev, bucket_size=7 * 86400)
    )
    assert daily == hourly == weekly


def test_bucketed_query_matches_plain_query(spark):
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    plain = QUERIES["events_top_transition_paths"].fn(spark, SF_SMALL)
    bucketed = QUERIES["events_top_transition_paths_bucketed"].fn(
        spark, SF_SMALL
    )
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in bucketed.collect()
    ]


def test_trigrams_bucketed_rejects_colliding_columns(spark):
    import pytest

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        transition_trigrams_bucketed,
    )

    ev = spark.createDataFrame(
        [(1, T0, 1, "a", "x")],
        "event_id long, ts timestamp, user_id long, event_type string, t0 string",
    )
    with pytest.raises(ValueError, match="collide"):
        transition_trigrams_bucketed(ev)
