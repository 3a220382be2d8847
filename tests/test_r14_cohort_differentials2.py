"""Second r14 batch of plain-Python brute-force differentials for
r9-cohort queries (VERDICT r13 item 6) — see
test_r14_cohort_differentials.py for the rationale and comparison
conventions (exact ints ==, float sums to 1e-6; structure is the thing
being guarded)."""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def test_session_window_native_matches_bruteforce(spark):
    """Native F.session_window with 30-min gap: a session CLOSES when the
    next event is >= 1800 s after the previous (note >=, not > — the
    half-open [event, event+gap) window)."""
    by_user = defaultdict(list)
    for eid, t, uid, v in _rows(
        "events",
        "event_id, CAST(FLOOR(epoch(ts)) AS BIGINT), user_id, value",
    ):
        by_user[uid].append((t, eid, v))
    expected = {}
    for uid, seq in by_user.items():
        seq.sort()
        cur: list = []
        prev_t = None
        for t, eid, v in seq + [(None, None, None)]:
            if t is None or prev_t is None or t - prev_t >= 1800:
                if cur:
                    start = min(x[0] for x in cur)
                    expected[(uid, start)] = (
                        len(cur), sum(x[1] for x in cur),
                    )
                if t is None:
                    break
                cur = []
            cur.append((t, v))
            prev_t = t
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in QUERIES["events_session_window_native"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (n, sv) in expected.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(sv, abs=1e-6), k


def test_json_by_type_matches_bruteforce(spark):
    stats = defaultdict(lambda: [0, 0, 0])  # n, sum_k, sum_ve4
    for etype, props, v in _rows("events", "event_type, props, value"):
        s = stats[etype]
        s[0] += 1
        k = json.loads(props).get("k") if props else None
        if k is not None:
            s[1] += int(k)
        s[2] += int(math.floor(v * 10000 + 0.5))
    expected = {
        etype: (n, sk, sv, sv // n) for etype, (n, sk, sv) in stats.items()
    }
    got = {
        r["event_type"]: (r["n_events"], r["sum_k"], r["sum_value_e4"],
                          r["avg_value_e4"])
        for r in QUERIES["events_json_by_type"].fn(spark, SF_MID).collect()
    }
    assert got == expected


def test_orders_quality_checks_match_bruteforce(spark):
    orders = _rows(
        "orders", "o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_orderpriority"
    )
    cust = {r[0] for r in _rows("customer", "c_custkey")}
    keys = [r[0] for r in orders]
    viol = {
        "pk_unique": len(keys) - len(set(keys)),
        "fk_customer": sum(1 for r in orders if r[1] not in cust),
        "price_non_negative": sum(1 for r in orders if r[2] < 0),
        "status_enum": sum(1 for r in orders if r[3] not in ("O", "F", "P")),
        "priority_format": sum(
            1 for r in orders if not re.match(r"^[1-5]-", r[4])
        ),
    }
    got = {
        r["check"]: (r["n_violations"], r["passed"])
        for r in QUERIES["orders_quality_checks"].fn(spark, SF_MID).collect()
    }
    assert got == {k: (v, v == 0) for k, v in viol.items()}


GAZETTEER = ("spark", "customer", "window", "stream", "vector")
STOPS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}


def test_ner_gazetteer_counts_match_bruteforce(spark):
    counts: Counter = Counter()
    for (text,) in _rows("documents", "text"):
        for t in _tokens(text):
            if t in GAZETTEER and t not in STOPS:
                counts[t] += 1
    rows = QUERIES["ner_gazetteer_counts"].fn(spark, SF_MID).collect()
    got = {r["entity"]: r["cnt"] for r in rows}
    assert got == dict(counts)
    # output ordering is part of the contract: cnt DESC, entity ASC
    assert [r["entity"] for r in rows] == sorted(
        counts, key=lambda e: (-counts[e], e)
    )
    assert counts  # the gazetteer actually hits the fixture


def test_entity_cooccurrence_edges_match_bruteforce(spark):
    pair_docs: Counter = Counter()
    for doc_id, text in _rows("documents", "doc_id, text"):
        ents = sorted({t for t in _tokens(text) if t in GAZETTEER})
        for i, a in enumerate(ents):
            for b in ents[i + 1:]:
                pair_docs[(a, b)] += 1
    got = {
        (r["entity_a"], r["entity_b"]): r["n_docs"]
        for r in QUERIES["entity_cooccurrence_edges"].fn(spark, SF_MID).collect()
    }
    assert got == dict(pair_docs)
    assert pair_docs


def test_repetition_filters_match_bruteforce(spark):
    expected = {}
    for doc_id, text in _rows("documents", "doc_id, text"):
        toks = _tokens(text)
        fracs = {}
        for n in (1, 2, 3):
            grams = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            total = sum(grams.values())
            if total == 0:
                fracs[n] = None
                continue
            if n < 3:
                fracs[n] = round(max(grams.values()) / total, 6)
            else:
                fracs[n] = round(1.0 - len(grams) / total, 6)
        rep = bool(
            (fracs[1] or 0) > 0.30
            or (fracs[2] or 0) > 0.18
            or (fracs[3] or 0) > 0.30
        )
        expected[doc_id] = (fracs[1], fracs[2], fracs[3], rep)
    got = {
        r["doc_id"]: (r["top_unigram_frac"], r["top_bigram_frac"],
                      r["dup_trigram_frac"], r["repetitive"])
        for r in QUERIES["doc_repetition_filters"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (u, b, t, rep) in expected.items():
        gu, gb, gt, grep = got[k]
        assert grep == rep, k
        for e, g in ((u, gu), (b, gb), (t, gt)):
            if e is None:
                assert g is None, k
            else:
                assert g == pytest.approx(e, abs=2e-6), k


def test_quality_topfrac_threshold_matches_bruteforce(spark):
    """Differential of THIS query's added logic (the p75 threshold filter)
    over the scored frame: recompute the linear-interpolation p75 in
    Python from the scores and re-derive the kept set."""
    from analyzing_big_data_in_scala_spark.plans.text_queries import (
        doc_quality_scores,
    )

    scored = {
        r["doc_id"]: r["quality"]
        for r in doc_quality_scores(spark, SF_MID).collect()
    }
    vals = sorted(scored.values())
    # linear-interpolation quantile (the percentile/quantile_cont def)
    h = (len(vals) - 1) * 0.75
    lo, hi = int(math.floor(h)), int(math.ceil(h))
    p75 = vals[lo] + (h - lo) * (vals[hi] - vals[lo])
    keep = {d for d, q in scored.items() if q >= p75}
    got = {
        r["doc_id"]: r["quality"]
        for r in QUERIES["documents_quality_topfrac"].fn(spark, SF_MID).collect()
    }
    assert set(got) == keep
    for d in keep:
        assert got[d] == pytest.approx(scored[d], abs=1e-9)
    # the filter is a real quartile cut, not all-pass
    assert 0 < len(keep) < len(scored)


def test_incremental_agg_refresh_matches_full_recompute_bruteforce(spark):
    rows = _rows("orders", "o_orderkey, o_orderpriority, o_totalprice")
    merged = {}
    for k, pr, p in rows:
        if k % 7 == 0:
            merged[k] = (pr, p + 1.0)      # update
        elif k % 11 == 0:
            continue                        # delete
        else:
            merged[k] = (pr, p)
        # (inserts added below with shifted keys)
    for k, pr, p in rows:
        if k % 13 == 0:
            merged[k + 10_000_000] = (pr, p)
    agg = defaultdict(lambda: [0, 0.0])
    for pr, p in merged.values():
        agg[pr][0] += 1
        agg[pr][1] += p
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in QUERIES["orders_incremental_agg_refresh"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(agg)
    for pr, (n, tp) in agg.items():
        assert got[pr][0] == n, pr
        assert got[pr][1] == pytest.approx(tp, abs=1e-4), pr
