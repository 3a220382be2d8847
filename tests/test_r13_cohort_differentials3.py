"""Third batch of plain-Python differentials for r13-window r8-cohort
queries: the deterministic-sampling family (balanced stratified sample,
source-mixture blend) and the as-of latest-order join — membership and
carries rederived with hashlib/merge logic, no shared SQL."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_balanced_sample_matches_bruteforce(spark):
    """Exactly-5-per-source membership by (hash-bucket, doc_id) rank."""
    per: dict = defaultdict(list)
    for (doc_id, src) in _rows("documents", "doc_id, source"):
        per[src].append((_h(f"{doc_id}strat") % 1073741824, doc_id))
    expected = set()
    for src, items in per.items():
        for _, doc_id in sorted(items)[:5]:
            expected.add((doc_id, src))
    got = {
        (r["doc_id"], r["source"])
        for r in QUERIES["documents_balanced_sample"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert len(got) == 5 * len(per)


def test_source_mixture_matches_bruteforce(spark):
    """The blend's exact membership: md5 bucket under the per-source
    keep-rate threshold (src0 1.0 / src1 0.6 / src2 0.3 / src3 0.1,
    others dropped)."""
    rates = {"src0": 10000, "src1": 6000, "src2": 3000, "src3": 1000}
    expected = {
        (doc_id, src)
        for (doc_id, src) in _rows("documents", "doc_id, source")
        if _h(f"{doc_id}mixture") % 10000 < rates.get(src, 0)
    }
    got = {
        (r["doc_id"], r["source"])
        for r in QUERIES["documents_source_mixture"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    # the blend must actually drop something from every down-rated source
    kept_by_src: dict = defaultdict(int)
    for _, s in got:
        kept_by_src[s] += 1
    tot_by_src: dict = defaultdict(int)
    for _, s in _rows("documents", "doc_id, source"):
        tot_by_src[s] += 1
    assert kept_by_src["src0"] == tot_by_src["src0"]
    for s in ("src1", "src2", "src3"):
        assert 0 < kept_by_src[s] < tot_by_src[s]


def test_asof_latest_order_matches_bruteforce(spark):
    """Backward as-of join: for every event, the customer's latest order
    at-or-before the event timestamp (orders deduped per (custkey, date)
    with the max-orderkey survivor) — rederived with a per-key bisect
    over sorted date lists. The registered oracle is DuckDB's native
    ASOF JOIN; this is a THIRD, engine-free derivation."""
    import bisect
    import datetime as dt

    dedup: dict = {}
    for (ck, ok, od, tp) in _rows(
        "orders", "o_custkey, o_orderkey, o_orderdate, o_totalprice"
    ):
        cur = dedup.get((ck, od))
        if cur is None or ok > cur[0]:
            dedup[(ck, od)] = (ok, tp)
    per: dict = defaultdict(list)
    for (ck, od), (ok, tp) in dedup.items():
        # order DATE promotes to midnight for the ts >= date comparison
        per[ck].append((dt.datetime.combine(od, dt.time()), ok, tp))
    for k in per:
        per[k].sort()

    expected = {}
    for (eid, uid, ts) in _rows("events", "event_id, user_id, ts"):
        cand = per.get(uid, [])
        i = bisect.bisect_right(cand, (ts, float("inf"), float("inf")))
        if i > 0:
            _, ok, tp = cand[i - 1]
            expected[eid] = (uid, ok, round(tp, 2))
        else:
            expected[eid] = (uid, None, None)

    got = {
        r["event_id"]: (r["user_id"], r["last_orderkey"], r["last_totalprice"])
        for r in QUERIES["events_asof_latest_order"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert any(v[1] is not None for v in got.values())


def test_minhash_signatures_match_bruteforce(spark):
    """Full Python recomputation of the MinHash signatures — the
    primitive under the entire LSH family (bands, candidates, precision/
    recall audits): 3-token shingles over the reference tokenizer,
    40-bit md5 base hash, min over the fixed arithmetic permutations
    (a=2i+1, b=i^2+7 mod 2^31-1)."""
    import re as _re

    M = (1 << 31) - 1
    params = [(2 * i + 1, i * i + 7) for i in range(1, 17)]
    expected = {}
    for (doc_id, text) in _rows("documents", "doc_id, text"):
        toks = _re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        shingles = {" ".join(toks[i: i + 3]) for i in range(len(toks) - 2)}
        if not shingles:
            continue
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:10], 16) for s in shingles
        ]
        for p, (a, b) in enumerate(params, start=1):
            expected[(doc_id, p)] = min((a * h + b) % M for h in hs)
    got = {
        (r["doc_id"], r["perm"]): r["minhash"]
        for r in QUERIES["dedup_minhash_signatures"].fn(spark, SF_MID).collect()
    }
    assert got == expected
