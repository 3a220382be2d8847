"""Plain-Python brute-force differentials for four r13-window r8-cohort
queries that predate the differential program (r12 started shipping one
per new query; the r11 CUSUM catch proved the pattern pays — a shared-tree
bug that both engines inherit is invisible to the oracle hash, and these
recomputations share no SQL with either engine)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import timedelta

import duckdb

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _round_half_up_cents(x: float) -> int:
    # SQL ROUND is half-away-from-zero; fixture prices are positive.
    return int(math.floor(x * 100 + 0.5))


def test_weekly_revenue_delta_matches_bruteforce(spark):
    weekly: dict = defaultdict(int)
    for (d, p) in _rows("orders", "o_orderdate, o_totalprice"):
        week = d - timedelta(days=d.weekday())  # Monday-based trunc
        weekly[week] += _round_half_up_cents(p)
    weeks = sorted(weekly)
    expected = {}
    for i, w in enumerate(weeks):
        prev = weekly[weeks[i - 1]] if i > 0 else None
        mov4 = sum(weekly[x] for x in weeks[max(0, i - 3): i + 1])
        expected[w] = (
            weekly[w],
            prev,
            None if prev is None else weekly[w] - prev,
            mov4,
        )
    got = {
        r["week"].date(): (r["rev_e2"], r["prev_e2"], r["delta_e2"], r["mov4_e2"])
        for r in QUERIES["orders_weekly_revenue_delta"].fn(spark, SF_MID).collect()
    }
    assert got == {w.date() if hasattr(w, "date") else w: v
                   for w, v in expected.items()}


def test_value_histogram_matches_bruteforce(spark):
    vals: dict = defaultdict(list)
    for (t, v) in _rows("events", "event_type, value"):
        vals[t].append(v)
    counts: dict = defaultdict(int)
    stats = {}
    for t, vs in vals.items():
        mn, mx = min(vs), max(vs)
        stats[t] = (mn, mx)
        for v in vs:
            b = 0 if mx == mn else min(int(math.floor((v - mn) * 10 / (mx - mn))), 9)
            counts[(t, b)] += 1
    rows = QUERIES["events_value_histogram"].fn(spark, SF_MID).collect()
    assert len(rows) == 10 * len(vals)  # full spine incl. empty bins
    for r in rows:
        t, b = r["event_type"], r["bin"]
        mn, mx = stats[t]
        assert r["n"] == counts.get((t, b), 0), (t, b)
        assert abs(r["bin_lo"] - (mn + b * ((mx - mn) / 10))) <= 1e-6
        assert abs(r["bin_hi"] - (mn + (b + 1) * ((mx - mn) / 10))) <= 1e-6


def test_hash_sample_split_matches_bruteforce(spark):
    """The portable-md5 sampling/split membership recomputed with
    hashlib — the exact cross-engine/partitioning-independence contract,
    independently rederived (different salts must decorrelate the two
    decisions)."""

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = {}
    for (doc_id, text) in _rows("documents", "doc_id, text"):
        if h(f"{doc_id}") % 10000 < 2500:
            split = "test" if h(f"{doc_id}split") % 10000 < 1000 else "train"
            expected[doc_id] = (len(text), split)
    got = {
        r["doc_id"]: (r["text_len"], r["split"])
        for r in QUERIES["documents_hash_sample_split"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert {s for _, s in got.values()} == {"train", "test"}


def test_salted_by_type_matches_bruteforce(spark):
    agg: dict = defaultdict(list)
    for (t, v) in _rows("events", "event_type, value"):
        agg[t].append(v)
    got = {
        r["event_type"]: (r["n"], r["sum_value"], r["max_value"])
        for r in QUERIES["events_salted_by_type"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(agg)
    for t, vs in agg.items():
        n, s, m = got[t]
        assert n == len(vs)
        assert abs(s - round(math.fsum(vs), 4)) <= 1e-4
        assert abs(m - max(vs)) <= 1e-6


def test_bloom_pruned_join_matches_bruteforce(spark):
    urgent = {k for (k, pr) in _rows("orders", "o_orderkey, o_orderpriority")
              if pr == "1-URGENT"}
    cnt, orders_hit, rev = 0, set(), 0
    for (k, px, disc) in _rows(
        "lineitem", "l_orderkey, l_extendedprice, l_discount"
    ):
        if k in urgent:
            cnt += 1
            orders_hit.add(k)
            rev += _round_half_up_cents(px * (1 - disc))
    r = QUERIES["lineitem_bloom_pruned_join"].fn(spark, SF_MID).collect()[0]
    assert (r["line_cnt"], r["order_cnt"], r["revenue_e2"]) == (
        cnt, len(orders_hit), rev,
    )
