"""Plain-Python brute-force differentials for r14-window r9-cohort
queries (VERDICT r13 item 6): these predate the differential program, and
their only independent check was the shared-expression DuckDB oracle —
the r11 CUSUM lesson is that a shared-tree bug both engines inherit is
invisible to the oracle hash. Each test re-derives the query's semantics
in plain Python (dict/loop code, no SQL, no Spark) from the raw parquet
rows and compares against the Spark plan at sf0.01 (the driver's grading
scale). Exact-integer columns compare ==; ROUND(SUM(double)) columns
compare to 1e-6 (the reassociation-noise floor — their exact values are
already pinned engine-vs-engine by the oracle hash; the differential
guards the STRUCTURE: window membership, session boundaries, rank order,
as-of picks)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _events_t():
    """(event_id, t_epoch, user_id, event_type, value) with integer
    whole-second epochs (the repo-wide FLOOR(epoch) convention)."""
    return _rows(
        "events",
        "event_id, CAST(FLOOR(epoch(ts)) AS BIGINT), user_id, event_type, value",
    )


def test_user_sessions_match_bruteforce(spark):
    by_user = defaultdict(list)
    for eid, t, uid, _, v in _events_t():
        by_user[uid].append((t, eid, v))
    expected = {}
    for uid, seq in by_user.items():
        seq.sort()
        sid = 0
        prev_t = None
        cur: list = []
        for t, eid, v in seq + [(None, None, None)]:
            if t is None or prev_t is None or t - prev_t > 1800:
                if cur:
                    ts_list = [x[0] for x in cur]
                    expected[(uid, sid)] = (
                        len(cur), sum(x[1] for x in cur),
                        min(ts_list), max(ts_list) - min(ts_list),
                    )
                if t is None:
                    break
                sid += 1
                cur = []
            cur.append((t, v))
            prev_t = t
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["sum_value"], r["start_epoch"], r["duration_sec"]
        )
        for r in QUERIES["events_user_sessions"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (n, sv, st, dur) in expected.items():
        gn, gsv, gst, gdur = got[k]
        assert (gn, gst, gdur) == (n, st, dur), k
        assert gsv == pytest.approx(sv, abs=1e-6), k


def test_sliding_20min_matches_bruteforce(spark):
    cells = defaultdict(lambda: [0, 0.0])
    for _, t, _, etype, v in _events_t():
        b = t // 600
        for w in (b - 1, b):
            c = cells[(w, etype)]
            c[0] += 1
            c[1] += v
    got = {
        (r["w"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_sliding_20min"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(cells)
    for k, (n, sv) in cells.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(sv, abs=1e-6), k


def test_resample_gapfill_matches_bruteforce(spark):
    agg = defaultdict(lambda: [0, 0.0])
    bounds: dict = {}
    for _, t, _, etype, v in _events_t():
        b = t // 600
        agg[(etype, b)][0] += 1
        agg[(etype, b)][1] += v
        lo, hi = bounds.get(etype, (b, b))
        bounds[etype] = (min(lo, b), max(hi, b))
    expected = {}
    for etype, (lo, hi) in bounds.items():
        for b in range(lo, hi + 1):
            if (etype, b) in agg:
                n, sv = agg[(etype, b)]
                expected[(etype, b)] = (n, sv, False)
            else:
                expected[(etype, b)] = (0, 0.0, True)
    got = {
        (r["event_type"], r["bucket"]): (r["n"], r["sum_value"], r["gap_filled"])
        for r in QUERIES["events_resample_10min_gapfill"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (n, sv, gap) in expected.items():
        assert (got[k][0], got[k][2]) == (n, gap), k
        assert got[k][1] == pytest.approx(sv, abs=1e-6), k


def test_rolling_zscore_matches_bruteforce(spark):
    series = defaultdict(list)
    for eid, t, _, etype, v in _events_t():
        series[etype].append((t, eid, int(math.floor(v * 10000 + 0.5))))
    expected = {}
    for etype, seq in series.items():
        seq.sort()
        vals = [x[2] for x in seq]
        for i, (t, eid, ve4) in enumerate(seq):
            frame = vals[max(0, i - 50): i]  # 50 preceding, excl current
            n = len(frame)
            if n != 50:
                continue
            s = sum(frame)
            ss = sum(x * x for x in frame)
            if ss * n - s * s <= 0:
                continue
            # the exact shared expression tree, in IEEE doubles
            z = (float(ve4) - float(s) / n) / math.sqrt(
                float(ss * n - s * s) / (float(n) * n)
            )
            if abs(z) >= 3.0:
                expected[(etype, eid)] = (ve4, round(z, 6))
    got = {
        (r["event_type"], r["event_id"]): (r["value_e4"], r["z"])
        for r in QUERIES["events_rolling_zscore_anomalies"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (ve4, z) in expected.items():
        assert got[k][0] == ve4, k
        assert got[k][1] == pytest.approx(z, abs=1e-9), k
    assert len(expected) > 0  # the fixture must actually exercise the scan


def test_multires_rollup_matches_bruteforce(spark):
    cells = defaultdict(lambda: [0, 0])
    for _, t, _, etype, v in _events_t():
        b = t // 600
        ve4 = int(math.floor(v * 10000 + 0.5))
        for level, start in (
            ("10min", b * 600),
            ("1h", (b // 6) * 3600),
            ("1d", (b // 144) * 86400),
        ):
            c = cells[(level, start, etype)]
            c[0] += 1
            c[1] += ve4
    got = {
        (r["level"], r["bucket_start"], r["event_type"]): (r["n"], r["sum_value_e4"])
        for r in QUERIES["events_multires_rollup"].fn(spark, SF_MID).collect()
    }
    assert got == {k: (n, s) for k, (n, s) in cells.items()}


def test_scd2_incremental_matches_full_rebuild_bruteforce(spark):
    """The incremental fold's contract is bit-equality with the FULL
    history rebuild — recomputed here as plain runs-of-state Python."""
    by_user = defaultdict(list)
    for eid, t, uid, etype, _ in _events_t():
        by_user[uid].append((t, eid, etype))
    expected = {}
    for uid, seq in by_user.items():
        seq.sort()
        runs = []
        prev_state = object()
        for t, eid, state in seq:
            if state != prev_state:
                runs.append((t, eid, state))
                prev_state = state
        for ver, (t, eid, state) in enumerate(runs, start=1):
            valid_to = runs[ver][0] if ver < len(runs) else None
            expected[(uid, t, eid)] = (state, valid_to, ver, valid_to is None)
    got = {}
    for r in QUERIES["events_scd2_incremental"].fn(spark, SF_MID).collect():
        vf = int(r["valid_from"].timestamp()) if hasattr(r["valid_from"], "timestamp") else r["valid_from"]
        vt = r["valid_to"]
        vt = int(vt.timestamp()) if hasattr(vt, "timestamp") else vt
        got[(r["user_id"], vf, r["version"])] = (r["state"], vt, r["is_current"])
    # key brute rows the same way (valid_from epoch, version)
    exp2 = {}
    for (uid, t, _eid), (state, vto, ver, cur) in expected.items():
        exp2[(uid, t, ver)] = (state, vto, cur)
    # normalize Spark datetimes: Row.timestamp() uses local tz — compare
    # via the raw integer epochs the brute force already has by re-keying
    # both sides on (user, version) and checking state/current + the
    # valid_from/valid_to ORDER (epoch deltas), sidestepping tz offsets.
    got_by_ver = {}
    for (uid, vf, ver), (state, vt, cur) in got.items():
        got_by_ver[(uid, ver)] = (state, cur, vf, vt)
    exp_by_ver = {}
    for (uid, t, ver), (state, vto, cur) in exp2.items():
        exp_by_ver[(uid, ver)] = (state, cur, t, vto)
    assert set(got_by_ver) == set(exp_by_ver)
    for k in exp_by_ver:
        gs, gc, gvf, gvt = got_by_ver[k]
        es, ec, evf, evt = exp_by_ver[k]
        assert (gs, gc) == (es, ec), k
        # timestamps may differ by a constant tz offset between the two
        # readers; deltas are offset-free and pin the boundary structure
        if gvt is not None and evt is not None:
            assert gvt - gvf == evt - evf, k
        else:
            assert (gvt is None) == (evt is None), k


def test_asof_last_signup_7d_matches_bruteforce(spark):
    ev = _events_t()
    signups = defaultdict(dict)  # uid -> {s_ts: max event_id}
    for eid, t, uid, etype, _ in ev:
        if etype == "signup":
            cur = signups[uid].get(t)
            signups[uid][t] = eid if cur is None else max(cur, eid)
    sorted_s = {u: sorted(d.items()) for u, d in signups.items()}
    expected = {}
    for eid, t, uid, _, _ in ev:
        best = None
        for s_ts, s_eid in sorted_s.get(uid, []):
            if s_ts <= t:
                best = (s_ts, s_eid)
            else:
                break
        if best is not None and t - best[0] <= 7 * 86400:
            expected[eid] = (uid, best[1], t - best[0])
        else:
            expected[eid] = (uid, None, None)
    got = {
        r["event_id"]: (r["user_id"], r["last_signup_id"], r["secs_since_signup"])
        for r in QUERIES["events_asof_last_signup_7d"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert any(v[1] is not None for v in expected.values())


def test_asof_next_purchase_2h_matches_bruteforce(spark):
    ev = _events_t()
    purchases = defaultdict(dict)
    for eid, t, uid, etype, _ in ev:
        if etype == "purchase":
            cur = purchases[uid].get(t)
            purchases[uid][t] = eid if cur is None else max(cur, eid)
    sorted_p = {u: sorted(d.items()) for u, d in purchases.items()}
    expected = {}
    for eid, t, uid, etype, _ in ev:
        if etype != "view":
            continue
        nxt = None
        for p_ts, p_eid in sorted_p.get(uid, []):
            if p_ts >= t:
                nxt = (p_ts, p_eid)
                break
        if nxt is not None and nxt[0] - t <= 2 * 3600:
            expected[eid] = (uid, nxt[1], nxt[0] - t)
        else:
            expected[eid] = (uid, None, None)
    got = {
        r["event_id"]: (r["user_id"], r["next_purchase_id"], r["secs_to_purchase"])
        for r in QUERIES["events_asof_next_purchase_2h"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert any(v[1] is not None for v in expected.values())


def test_rank_functions_match_bruteforce(spark):
    orders = _rows("orders", "o_custkey, o_orderkey, o_totalprice")
    by_cust = defaultdict(list)
    for ck, ok, p in orders:
        by_cust[ck].append((-p, ok))
    expected = {}
    for ck, seq in by_cust.items():
        if ck % 50 != 0:
            continue
        seq.sort()
        n = len(seq)
        # rank / dense_rank over (price DESC, key ASC) — key unique, so
        # rank == dense_rank == row position and percent_rank is exact
        for i, (negp, ok) in enumerate(seq):
            rnk = i + 1
            prnk = 0.0 if n == 1 else round(i / (n - 1), 6)
            # SQL NTILE: first (n % 4) buckets get ceil(n/4) rows
            big, rem = divmod(n, 4)
            if i < (big + 1) * rem:
                quartile = i // (big + 1) + 1
            else:
                quartile = rem + (i - (big + 1) * rem) // big + 1 if big else rem
            expected[ok] = (ck, -negp, rnk, rnk, prnk, quartile)
    got = {
        r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"], r["rnk"],
                          r["drnk"], r["prnk"], r["quartile"])
        for r in QUERIES["orders_rank_functions"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (ck, p, rnk, drnk, prnk, q) in expected.items():
        gck, gp, grnk, gdrnk, gprnk, gq = got[k]
        assert (gck, grnk, gdrnk, gq) == (ck, rnk, drnk, q), k
        assert gp == pytest.approx(p, abs=1e-9), k
        assert gprnk == pytest.approx(prnk, abs=1e-6), k


def test_conversion_funnel_matches_bruteforce(spark):
    ev = _events_t()
    t1, t2, t3 = {}, {}, {}
    for _, t, uid, etype, _ in ev:
        if etype == "view" and (uid not in t1 or t < t1[uid]):
            t1[uid] = t
    for _, t, uid, etype, _ in ev:
        if etype == "click" and uid in t1 and t > t1[uid]:
            if uid not in t2 or t < t2[uid]:
                t2[uid] = t
    for _, t, uid, etype, _ in ev:
        if etype == "purchase" and uid in t2 and t > t2[uid]:
            if uid not in t3 or t < t3[uid]:
                t3[uid] = t
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["events_conversion_funnel"].fn(spark, SF_MID).collect()
    }
    assert got == {
        "1_view": len(t1),
        "2_click_after_view": len(t2),
        "3_purchase_after_click": len(t3),
    }
    assert len(t3) > 0


def test_late_arrival_profile_matches_bruteforce(spark):
    ev = sorted(_events_t())  # by event_id = arrival order
    stats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, l10, l1h, l12h, maxlate
    hwm = None
    for eid, t, uid, etype, _ in ev:
        s = stats[etype]
        s[0] += 1
        if hwm is not None:
            late = hwm - t
            if late > 600:
                s[1] += 1
            if late > 3600:
                s[2] += 1
            if late > 43200:
                s[3] += 1
            s[4] = max(s[4], max(late, 0))
        hwm = t if hwm is None else max(hwm, t)
    got = {
        r["event_type"]: (r["n_events"], r["late_10m"], r["late_1h"],
                          r["late_12h"], r["max_lateness_sec"])
        for r in QUERIES["events_late_arrival_profile"].fn(spark, SF_MID).collect()
    }
    assert got == {k: tuple(v) for k, v in stats.items()}


def test_bfs_hops_matches_bruteforce(spark):
    ev = _events_t()
    groups = defaultdict(list)
    for eid, t, uid, etype, _ in ev:
        groups[(etype, t // 86400)].append((eid, uid))
    adj = defaultdict(set)
    for seq in groups.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
    start = min(adj)
    hops = {start: 0}
    frontier = [start]
    for d in range(1, 31):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in hops:
                    hops[v] = d
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    got = {
        r["id"]: r["hops"]
        for r in QUERIES["graph_bfs_hops"].fn(spark, SF_MID).collect()
    }
    assert got == hops
    assert max(hops.values()) >= 2  # multi-layer frontier actually exercised
