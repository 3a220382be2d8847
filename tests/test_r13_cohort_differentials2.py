"""Second batch of plain-Python differentials for r13-window r8-cohort
queries (see test_r13_cohort_differentials.py): the exact-integer EWMA,
the MAD outlier profile, the Markov matrix pair, and the reference tf
table — each rederived with no shared SQL or Spark expression trees."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _ve4(x: float) -> int:
    return int(math.floor(x * 10000 + 0.5)) if x >= 0 else -int(
        math.floor(-x * 10000 + 0.5)
    )


def test_value_ewma_matches_bruteforce(spark):
    """Truncated-exponential EWMA (decay 3/4, 16-row window) recomputed
    with raw integer arithmetic: weights 3^j*4^(15-j), round-half-up on
    the offset-shifted numerator (python // == both engines' division on
    the positive shifted form)."""
    W, OFF = 16, 60_000_000
    coefs = [3**j * 4 ** (W - 1 - j) for j in range(W)]
    den = sum(coefs)
    series: dict = defaultdict(list)
    for (t, ts, eid, v) in _rows("events", "event_type, ts, event_id, value"):
        series[t].append((ts, eid, _ve4(v)))
    expected = {}
    for t, rows in series.items():
        rows.sort()
        vals = [x for _, _, x in rows]
        for i, (_, eid, x0) in enumerate(rows):
            if i + 1 < W:
                continue
            num = sum(c * vals[i - j] for j, c in enumerate(coefs))
            shifted = num + OFF * den
            expected[(t, eid)] = (x0, (shifted * 2 + den) // (2 * den) - OFF)
    got = {
        (r["event_type"], r["event_id"]): (r["ve4"], r["ewma_e4"])
        for r in QUERIES["events_value_ewma"].fn(spark, SF_MID).collect()
    }
    assert got == expected


def _median(xs: list) -> float:
    s = sorted(xs)
    n = len(s)
    return float(s[n // 2]) if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def test_value_mad_outliers_matches_bruteforce(spark):
    """Median/MAD/outlier counts rederived: the med2/d2/mad2 2x-carry
    makes every quantity an exact integer-valued double, so the compare
    is equality, not tolerance."""
    series: dict = defaultdict(list)
    for (t, v) in _rows("events", "event_type, value"):
        series[t].append(_ve4(v))
    expected = {}
    for t, vs in series.items():
        med2 = 2 * _median(vs)
        d2 = [abs(2 * x - med2) for x in vs]
        mad2 = _median(d2)
        n_out = sum(1 for d in d2 if d > 4.4478 * mad2)
        expected[t] = (len(vs), med2 / 20000, mad2 / 20000, n_out)
    got = {
        r["event_type"]: (r["n"], r["median_value"], r["mad_value"], r["n_outliers"])
        for r in QUERIES["events_value_mad_outliers"].fn(spark, SF_MID).collect()
    }
    assert got == expected


def test_markov_transitions_match_bruteforce(spark):
    """Transition counts + conditional ppm from raw per-user sequences —
    and the bucketed twin must reproduce the identical matrix."""
    seqs: dict = defaultdict(list)
    for (u, ts, eid, t) in _rows("events", "user_id, ts, event_id, event_type"):
        seqs[u].append((ts, eid, t))
    pairs: Counter = Counter()
    for u, rows in seqs.items():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            pairs[(a[2], b[2])] += 1
    totals: Counter = Counter()
    for (f, _), n in pairs.items():
        totals[f] += n
    expected = {
        (f, t): (n, (n * 2_000_000 + totals[f]) // (2 * totals[f]))
        for (f, t), n in pairs.items()
    }
    for name in ("events_markov_transitions", "events_markov_transitions_bucketed"):
        got = {
            (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob_ppm"])
            for r in QUERIES[name].fn(spark, SF_MID).collect()
        }
        assert got == expected, name


def test_tfidf_term_frequencies_match_bruteforce(spark):
    """The reference tokenizer contract (F11/N3) rederived with python
    re: lowercase, strip non-[a-z0-9], split, count per (doc, term)."""
    expected: Counter = Counter()
    for (doc_id, text) in _rows("documents", "doc_id, text"):
        for tok in re.sub(r"[^a-z0-9]+", " ", text.lower()).split():
            expected[(doc_id, tok)] += 1
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in QUERIES["tfidf_term_frequencies"].fn(spark, SF_MID).collect()
    }
    assert got == dict(expected)
