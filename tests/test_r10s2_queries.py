"""Python brute-force differentials for the r10-session-2 queries.

The DuckDB oracles prove cross-ENGINE agreement; where an oracle shares a
formula tree with the Spark plan (Gini, Benford, comovement) a shared bug
would hash green — these tests recompute each answer INDEPENDENTLY in
plain Python/numpy from the same sf0.001 parquet, so the semantics
themselves are pinned, not just the parity."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from .conftest import SF_SMALL

from analyzing_big_data_in_scala_spark.plans import QUERIES


def _rows(sql: str):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "events", "documents", "part", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    return con.sql(sql).fetchall()


def test_gini_matches_bruteforce(spark):
    got = {
        r.nation: (r.n_customers, r.revenue_e2, r.gini_ppm)
        for r in QUERIES["revenue_gini_by_nation"].fn(spark, SF_SMALL).collect()
    }
    per_cust = _rows(
        """SELECT n.n_name, o.o_custkey,
                  CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
           FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
           JOIN nation n ON c.c_nationkey=n.n_nationkey GROUP BY 1,2"""
    )
    by_nation = defaultdict(list)
    for nation, _ck, rev in per_cust:
        by_nation[nation].append(int(rev))
    want = {}
    for nation, xs in by_nation.items():
        xs.sort()
        n, s_x = len(xs), sum(xs)
        s_ixi = sum((i + 1) * x for i, x in enumerate(xs))
        g = (2.0 * s_ixi - (n + 1.0) * s_x) * 1_000_000.0 / (n * 1.0 * s_x)
        want[nation] = (n, s_x, math.floor(g + 0.5))
    assert got == want


def test_winsorized_stats_match_bruteforce(spark):
    got = {
        r.event_type: (r.n, r.lo_e2, r.hi_e2, r.n_clipped_lo, r.n_clipped_hi,
                       r.wins_sum_e2, r.wins_mean_e2)
        for r in QUERIES["events_value_winsorized_stats"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        "SELECT event_type, CAST(ROUND(value*100) AS BIGINT), event_id FROM events"
    )
    by_type = defaultdict(list)
    for t, c, eid in rows:
        by_type[t].append((int(c), int(eid)))
    want = {}
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[(n + 99) // 100 - 1][0]
        hi = vals[(n * 99 + 99) // 100 - 1][0]
        clipped = [min(max(c, lo), hi) for c, _ in vals]
        s = sum(clipped)
        mean = math.floor(s / n + 0.5)
        want[t] = (n, lo, hi,
                   sum(1 for c, _ in vals if c < lo),
                   sum(1 for c, _ in vals if c > hi),
                   s, mean)
    assert got == want


def test_cohort_ltv_matches_bruteforce(spark):
    got = {
        (r.cohort_ym, r.age_months): (r.n_active, r.revenue_e2, r.cum_revenue_e2)
        for r in QUERIES["customer_cohort_ltv"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        """SELECT o_custkey,
                  EXTRACT(year FROM o_orderdate)*12 + EXTRACT(month FROM o_orderdate),
                  CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"""
    )
    first = {}
    for ck, m, _ in rows:
        first[ck] = min(first.get(ck, 10**9), int(m))
    cells = defaultdict(lambda: [set(), 0])
    for ck, m, rev in rows:
        m0 = first[ck]
        ym = ((m0 - 1) // 12) * 100 + ((m0 - 1) % 12 + 1)
        cell = cells[(ym, int(m) - m0)]
        cell[0].add(ck)
        cell[1] += int(rev)
    want = {}
    for ym in sorted({k[0] for k in cells}):
        cum = 0
        for age in sorted(k[1] for k in cells if k[0] == ym):
            users, rev = cells[(ym, age)]
            cum += rev
            want[(ym, age)] = (len(users), rev, cum)
    assert got == want


def test_benford_matches_bruteforce(spark):
    got = {r.digit: (r.n, r.share_ppm, r.expected_ppm)
           for r in QUERIES["events_value_benford"].fn(spark, SF_SMALL).collect()}
    rows = _rows("SELECT CAST(ROUND(value*100) AS BIGINT) FROM events")
    counts = defaultdict(int)
    for (c,) in rows:
        c = int(c)
        if c > 0:
            counts[int(str(c)[0])] += 1
    tot = sum(counts.values())
    want = {
        d: (n, (n * 2_000_000 + tot) // (2 * tot),
            math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5))
        for d, n in counts.items()
    }
    assert got == want


def test_volume_median_matches_bruteforce(spark):
    got = {r.source: (r.n_docs, r.total_chars, r.wmedian_chars)
           for r in QUERIES["documents_volume_median"].fn(spark, SF_SMALL).collect()}
    rows = _rows("SELECT source, n_chars, doc_id FROM documents WHERE n_chars > 0")
    by_src = defaultdict(list)
    for s, n, d in rows:
        by_src[s].append((int(n), int(d)))
    want = {}
    for s, docs in by_src.items():
        docs.sort()
        tot = sum(n for n, _ in docs)
        cum = 0
        for n, _ in docs:
            cum += n
            if 2 * cum >= tot:
                want[s] = (len(docs), tot, n)
                break
    assert got == want


def test_comovement_matches_numpy(spark):
    import numpy as np

    got = {(r.type_a, r.type_b): (r.n, r.corr_ppm)
           for r in QUERIES["events_type_comovement"].fn(spark, SF_SMALL).collect()}
    rows = _rows(
        "SELECT event_type, CAST(FLOOR(epoch(ts)/600) AS BIGINT) FROM events"
    )
    counts = defaultdict(int)
    types, buckets = set(), []
    for t, b in rows:
        counts[(t, int(b))] += 1
        types.add(t)
        buckets.append(int(b))
    b0, b1 = min(buckets), max(buckets)
    spine = range(b0, b1 + 1)
    series = {t: np.array([counts[(t, b)] for b in spine], dtype=float)
              for t in types}
    for (ta, tb), (n, ppm) in got.items():
        assert n == len(list(spine))
        want = np.corrcoef(series[ta], series[tb])[0, 1] * 1_000_000
        # the shared CORR tree and numpy may differ by an ulp at the
        # rounding site — allow +-1 ppm
        assert abs(ppm - round(want)) <= 1, (ta, tb, ppm, want)


def test_interp_matches_bruteforce(spark):
    got = {(r.event_type, r.bucket): (r.value_e2, r.interpolated)
           for r in QUERIES["events_resample_10min_interp"].fn(spark, SF_SMALL).collect()}
    rows = _rows(
        """SELECT event_type, CAST(FLOOR(epoch(ts)/600) AS BIGINT),
                  CAST(ROUND(value*100) AS BIGINT), ts, event_id FROM events"""
    )
    last_obs = {}
    for t, b, c, ts, eid in rows:
        k = (t, int(b))
        cur = last_obs.get(k)
        if cur is None or (ts, eid) > cur[1]:
            last_obs[k] = (int(c), (ts, eid))
    by_type = defaultdict(dict)
    for (t, b), (c, _) in last_obs.items():
        by_type[t][b] = c
    want = {}
    for t, obs in by_type.items():
        bs = sorted(obs)
        for b in range(bs[0], bs[-1] + 1):
            if b in obs:
                want[(t, b)] = (obs[b], False)
            else:
                pb = max(x for x in bs if x < b)
                nb = min(x for x in bs if x > b)
                pv, nv = obs[pb], obs[nb]
                num, den = (nv - pv) * (b - pb), (nb - pb)
                # round-half-up: floor((2*num+den)/(2*den)) exactly
                val = pv + (2 * num + den) // (2 * den)
                want[(t, b)] = (val, True)
    assert got == want


def test_pareto_frontier_matches_bruteforce(spark):
    got = {(r.p_brand, r.price_e2, r.p_size): r.n_parts
           for r in QUERIES["parts_pareto_frontier"].fn(spark, SF_SMALL).collect()}
    rows = _rows(
        """SELECT p_brand, CAST(ROUND(p_retailprice*100) AS BIGINT),
                  CAST(p_size AS INT), COUNT(*) FROM part
           WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
           GROUP BY 1,2,3"""
    )
    by_brand = defaultdict(list)
    for br, p, s, n in rows:
        by_brand[br].append((int(p), int(s), int(n)))
    want = {}
    for br, pts in by_brand.items():
        for p, s, n in pts:
            dominated = any(
                (q <= p and t >= s and (q < p or t > s)) for q, t, _ in pts
            )
            if not dominated:
                want[(br, p, s)] = n
    assert got == want


def test_hhi_matches_bruteforce(spark):
    got = {r.p_type: (r.n_suppliers, r.revenue_usd, r.hhi_ppm)
           for r in QUERIES["supplier_hhi_by_parttype"].fn(spark, SF_SMALL).collect()}
    rows = _rows(
        """SELECT p.p_type, l.l_suppkey,
                  CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)) AS BIGINT)) AS BIGINT)
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1,2"""
    )
    by_type = defaultdict(list)
    for t, _sk, rev in rows:
        by_type[t].append(int(rev))
    want = {}
    for t, revs in by_type.items():
        s_tot = sum(revs)
        if s_tot <= 0:
            continue
        s_sq = sum(r * r for r in revs)
        want[t] = (len(revs), s_tot,
                   math.floor(s_sq * 1_000_000.0 / (float(s_tot) * float(s_tot)) + 0.5))
    assert got == want


def test_clustering_coefficient_matches_bruteforce(spark):
    got = {r.id: (r.deg, r.triangles, r.cc_ppm)
           for r in QUERIES["graph_clustering_coefficient"].fn(spark, SF_SMALL).collect()}
    edges = _rows(
        """WITH e AS (
               SELECT user_id AS src,
                      LEAD(user_id) OVER (PARTITION BY event_type,
                           CAST(FLOOR(epoch(ts)/86400) AS BIGINT) ORDER BY event_id) AS dst
               FROM events)
           SELECT DISTINCT LEAST(src,dst), GREATEST(src,dst) FROM e
           WHERE dst IS NOT NULL AND src <> dst"""
    )
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        ns = sorted(nbrs)
        tri = sum(1 for i in range(len(ns)) for j in range(i + 1, len(ns))
                  if ns[j] in adj[ns[i]])
        want[v] = (d, tri, (tri * 4_000_000 + d * (d - 1)) // (2 * d * (d - 1)))
    assert got == want


def test_conversion_profile_matches_bruteforce(spark):
    got = {r.view_hour: (r.n_conversions, r.median_secs, r.p90_secs)
           for r in QUERIES["events_conversion_time_profile"].fn(spark, SF_SMALL).collect()}
    rows = _rows(
        """SELECT event_type, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT),
                  CAST(EXTRACT(hour FROM ts) AS INT), event_id FROM events"""
    )
    purchases = defaultdict(list)
    for et, u, t, _h, _e in rows:
        if et == "purchase":
            purchases[u].append(int(t))
    for u in purchases:
        purchases[u].sort()
    gaps = defaultdict(list)
    import bisect
    for et, u, t, h, e in rows:
        if et != "view":
            continue
        ps = purchases.get(u, [])
        i = bisect.bisect_left(ps, int(t))
        if i < len(ps):
            gap = ps[i] - int(t)
            if gap <= 7200:
                gaps[h].append((gap, e))
    want = {}
    for h, g in gaps.items():
        g.sort()
        n = len(g)
        want[h] = (n, g[(n + 1) // 2 - 1][0], g[(n * 9 + 9) // 10 - 1][0])
    assert got == want


def test_zipf_slope_matches_bruteforce(spark):
    got = {r.source: (r.n_terms, r.total_tokens, r.slope_ppm, r.corr_ppm)
           for r in QUERIES["corpus_zipf_slope"].fn(spark, SF_SMALL).collect()}
    import re

    rows = _rows("SELECT source, text FROM documents")
    freq = defaultdict(lambda: defaultdict(int))
    for src, text in rows:
        for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split():
            freq[src][t] += 1
    want = {}
    for src, terms in freq.items():
        ordered = sorted(terms.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [round(math.log(i + 1) * 10000) for i in range(len(ordered))]
        ys = [round(math.log(f) * 10000) for _, f in ordered]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        slope = (round(1e6 * (n * sxy - sx * sy) / varx)
                 if varx > 0 else None)
        corr = (round(1e6 * (n * sxy - sx * sy)
                      / (math.sqrt(varx) * math.sqrt(vary)))
                if varx > 0 and vary > 0 else None)
        want[src] = (n, sum(terms.values()), slope, corr)
    for src in want:
        gn, gt, gs, gc = got[src]
        wn, wt, ws, wc = want[src]
        assert (gn, gt) == (wn, wt), src
        # ln/rounding ulp tolerance at the two float sites
        assert gs is None if ws is None else abs(gs - ws) <= 1, (src, gs, ws)
        assert gc is None if wc is None else abs(gc - wc) <= 1, (src, gc, wc)
    assert set(got) == set(want)


def test_hhi_overflow_guard_enforced(spark):
    """The HHI Σs² headroom contract is ENFORCED, not just documented
    (r10 handoff item 2, mirroring the trend-stats guard): a group whose
    conservative bound n·max|rev|² could pass 2^63 raises loudly with
    the rescale-the-unit remediation — even when the actual sum of
    squares still fits (the silent-wrap zone) — and sane magnitudes pass
    through the guard with unchanged statistics."""
    import pytest

    from analyzing_big_data_in_scala_spark.plans.relational_queries import (
        hhi_finalize,
    )

    # 3 members, max|rev| = 2.2e9 → bound 3·(2.2e9)² ≈ 1.45e19 ≥ 2^63,
    # while the actual Σrev² = (2.2e9)² ≈ 4.8e18 still fits in BIGINT —
    # only the guard can catch this row.
    hot = spark.createDataFrame(
        [("W", 1, 2_200_000_000), ("W", 2, 0), ("W", 3, 0)],
        "g string, m long, rev long",
    )
    with pytest.raises(Exception, match="overflow risk"):
        hhi_finalize(hot, group_col="g", rev_col="rev").collect()

    ok = spark.createDataFrame(
        [("W", 1, 300), ("W", 2, 100), ("V", 3, 50)],
        "g string, m long, rev long",
    )
    rows = {
        r["g"]: (r["n_suppliers"], r["s_sq"], r["s_tot"])
        for r in hhi_finalize(ok, group_col="g", rev_col="rev").collect()
    }
    assert rows == {"W": (2, 100_000, 400), "V": (1, 2_500, 50)}
