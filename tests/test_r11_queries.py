"""Python brute-force differentials for the r11 queries.

The DuckDB oracles prove cross-ENGINE agreement; where an oracle shares a
formula tree with the Spark plan (entropy ln-quantization, CUSUM drawup,
mix drift, novelty ratio) a shared bug would hash green — these tests
recompute each answer INDEPENDENTLY in plain Python from the same
sf0.001 parquet, so the semantics themselves are pinned, not just the
parity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F

from .conftest import SF_SMALL

from analyzing_big_data_in_scala_spark.plans import QUERIES


def _rows(sql: str):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "events", "documents", "part",
              "lineitem", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con.sql(sql).fetchall()


def _div_half_up(a: int, b: int) -> int:
    """Round-half-up integer division for non-negative a, positive b —
    the shared BIGINT finalize both engines use."""
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def test_user_entropy_matches_bruteforce(spark):
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy_ppm)
        for r in QUERIES["events_user_entropy"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows("SELECT user_id, event_type, COUNT(*) FROM events GROUP BY 1, 2")
    per_user = defaultdict(list)
    for uid, _et, c in rows:
        per_user[uid].append(int(c))
    scored = {}
    for uid, cs in per_user.items():
        n = sum(cs)
        sq = sum(c * round(math.log(c) * 1_000_000) for c in cs)
        h = round(math.log(n) * 1_000_000) - _div_half_up(sq, n)
        scored[uid] = (n, len(cs), h)
    want = dict(
        sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:50]
    )
    assert got == want


def test_peak_concurrency_matches_bruteforce(spark):
    got = {
        r.event_type: (r.n_intervals, r.peak_concurrency, r.peak_ts_epoch)
        for r in QUERIES["events_peak_concurrency"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        "SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT), event_id FROM events"
    )
    by_type = defaultdict(list)
    for et, t, eid in rows:
        by_type[et].append((int(t), 1, int(eid)))
        by_type[et].append((int(t) + 1800, -1, int(eid)))
    want = {}
    for et, pts in by_type.items():
        pts.sort()  # (t, delta, id): ends (-1) before starts (+1) at equal t
        run, peak, peak_ts = 0, -(10**9), None
        for t, d, _eid in pts:
            run += d
            if run > peak:
                peak, peak_ts = run, t
        want[et] = (len(pts) // 2, peak, peak_ts)
    assert got == want


def test_cusum_alarm_matches_bruteforce(spark):
    got = {
        r.event_type: (r.n, r.mu_cents, r.max_drawup_cents,
                       r.n_alarm_points, r.first_alarm_epoch)
        for r in QUERIES["events_value_cusum_alarm"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        "SELECT event_type, ts, event_id,"
        " CAST(ROUND(value * 100) AS BIGINT),"
        " CAST(FLOOR(epoch(ts)) AS BIGINT) FROM events"
    )
    by_type = defaultdict(list)
    for et, ts, eid, c, te in rows:
        by_type[et].append((ts, int(eid), int(c), int(te)))
    want = {}
    for et, evs in by_type.items():
        evs.sort(key=lambda r: (r[0], r[1]))
        n = len(evs)
        s_tot = sum(c for _, _, c, _ in evs)
        mu = _div_half_up(s_tot, n)  # all-positive fixture: no sign branch
        s, smin, maxd, alarms, first = 0, 0, 0, 0, None
        for _, _, c, te in evs:
            s += c - mu
            smin = min(smin, s)
            m = s - smin
            maxd = max(maxd, m)
            if m > 50 * mu:
                alarms += 1
                if first is None:
                    first = te
        want[et] = (n, mu, maxd, alarms, first)
    assert got == want


def test_priority_mix_drift_matches_bruteforce(spark):
    got = {
        r.order_month: (r.n_orders, r.drift_ppm)
        for r in QUERIES["orders_priority_mix_drift"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        "SELECT strftime(o_orderdate, '%Y-%m'), o_orderpriority, COUNT(*)"
        " FROM orders GROUP BY 1, 2"
    )
    c_mp = {(ym, pri): int(c) for ym, pri, c in rows}
    n_m = Counter()
    c_p = Counter()
    for (ym, pri), c in c_mp.items():
        n_m[ym] += c
        c_p[pri] += c
    n = sum(n_m.values())
    want = {}
    for ym, nm in n_m.items():
        num = sum(
            abs(c_mp.get((ym, pri), 0) * n - cp * nm)
            for pri, cp in c_p.items()  # FULL grid: missing cells count
        )
        want[ym] = (nm, _div_half_up(1_000_000 * num, nm * n))
    assert got == want


def test_ngram_novelty_matches_bruteforce(spark):
    got = {
        r.source: (r.n_docs, r.n_shingle_occ, r.n_novel, r.novelty_ppm)
        for r in QUERIES["corpus_ngram_novelty"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        r"""
        WITH doc_toks AS (
            SELECT doc_id, d.source,
                   regexp_split_to_array(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
            FROM documents d
        )
        SELECT DISTINCT doc_id, source,
               array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
        FROM doc_toks, UNNEST(generate_series(1, len(toks) - 2)) t(i)
        WHERE len(toks) >= 3
        """
    )
    df = Counter(sh for _d, _s, sh in rows)
    per_source = defaultdict(lambda: [set(), 0, 0])  # docs, occ, novel
    for d, s, sh in rows:
        rec = per_source[s]
        rec[0].add(d)
        rec[1] += 1
        if df[sh] == 1:
            rec[2] += 1
    want = {
        s: (len(docs), occ, novel, _div_half_up(1_000_000 * novel, occ))
        for s, (docs, occ, novel) in per_source.items()
    }
    assert got == want


def test_order_gaps_match_bruteforce(spark):
    got = {
        r.c_mktsegment: (r.n_gaps, r.median_gap_days, r.p90_gap_days)
        for r in QUERIES["orders_customer_order_gaps"].fn(spark, SF_SMALL).collect()
    }
    orders = _rows(
        "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) FROM orders"
    )
    seg = dict(_rows("SELECT c_custkey, c_mktsegment FROM customer"))
    per_cust = defaultdict(list)
    for ck, ok, d in orders:
        per_cust[ck].append((d, int(ok)))
    gaps = defaultdict(list)
    for ck, seq in per_cust.items():
        seq.sort()
        for (d0, _), (d1, ok1) in zip(seq, seq[1:]):
            gaps[seg[ck]].append(((d1 - d0).days, ok1))
    want = {}
    for s, g in gaps.items():
        g.sort()
        n = len(g)
        want[s] = (n, g[(n + 1) // 2 - 1][0], g[(n * 9 + 9) // 10 - 1][0])
    assert got == want


def test_ship_lag_profile_matches_bruteforce(spark):
    got = {
        r.l_returnflag: (r.n_items, r.min_days, r.median_days, r.p90_days,
                         r.max_days)
        for r in QUERIES["lineitem_ship_lag_profile"].fn(spark, SF_SMALL).collect()
    }
    rows = _rows(
        "SELECT l.l_returnflag,"
        " date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)),"
        " l.l_orderkey, l.l_linenumber"
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    by_flag = defaultdict(list)
    for fl, lag, ok, ln in rows:
        by_flag[fl].append((int(lag), int(ok), int(ln)))
    want = {}
    for fl, lags in by_flag.items():
        lags.sort()
        n = len(lags)
        want[fl] = (
            n,
            lags[0][0],
            lags[(n + 1) // 2 - 1][0],
            lags[(n * 9 + 9) // 10 - 1][0],
            lags[-1][0],
        )
    assert got == want


def test_freq_table_rank_stats_matches_sorted_ranks(spark):
    """The frequency-table decomposition must agree with the direct
    sorted-rank definition for every rank expression, including ties,
    single-value groups, and a group smaller than the p90 divisor."""
    import random

    from analyzing_big_data_in_scala_spark.operators.quantiles import (
        freq_table_rank_stats,
    )

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), rng.randint(0, 9)) for i in range(200)]
    rows += [("solo", 42)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n, r.median, r.p90, r.lo, r.hi)
        for r in freq_table_rank_stats(
            df, "g", "v",
            {"median": "(n + 1) DIV 2", "p90": "(n * 9 + 9) DIV 10"},
            extra_aggs={"lo": F.min("v"), "hi": F.max("v")},
        ).collect()
    }
    per_g = defaultdict(list)
    for g, v in rows:
        per_g[g].append(v)
    want = {}
    for g, vs in per_g.items():
        vs.sort()
        n = len(vs)
        want[g] = (n, vs[(n + 1) // 2 - 1], vs[(n * 9 + 9) // 10 - 1],
                   vs[0], vs[-1])
    assert got == want


def test_freq_table_rank_stats_rejects_reserved_names(spark):
    import pytest

    from analyzing_big_data_in_scala_spark.operators.quantiles import (
        freq_table_rank_stats,
    )

    df = spark.createDataFrame([("a", 1, 2)], "g string, v long, cum long")
    with pytest.raises(ValueError, match="internal names"):
        freq_table_rank_stats(df, "g", "v", {"m": "(n + 1) DIV 2"})


def test_priority_mix_drift_counts_vanished_categories(spark, tmp_path):
    """A month missing a priority ENTIRELY must contribute that
    priority's full expected mass to the drift — the vanished-category
    case the audit exists to catch (an inner join on observed cells
    would silently skip it). Month B has only priority X, so its
    deviation vs the 50/50 global mix is |1*4 - 2*2|*2 = ... computed
    below; exact expected values pinned."""
    import os

    from pyspark.sql import functions as F  # noqa: F811

    # 2 months x 2 priorities; month A balanced, month B only X.
    rows = [
        (1, 101, "O", 10.0, "2024-01-05", "X"),
        (2, 102, "O", 10.0, "2024-01-06", "Y"),
        (3, 103, "O", 10.0, "2024-02-05", "X"),
        (4, 104, "O", 10.0, "2024-02-06", "X"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = str(tmp_path / "mixdrift")
    df.coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    got = {
        r.order_month: (r.n_orders, r.drift_ppm)
        for r in QUERIES["orders_priority_mix_drift"].fn(spark, d).collect()
    }
    # Global: n=4, c_X=3, c_Y=1.
    # Month A (n_m=2, c=1,1): |1*4-3*2|/(2*4) + |1*4-1*2|/(2*4) = (2+2)/8
    #   -> 0.5 -> 500000 ppm.
    # Month B (n_m=2, c_X=2, c_Y=0): |2*4-3*2| + |0*4-1*2| = 2+2 -> same
    #   500000 ppm — the Y term exists ONLY because the grid is full.
    assert got == {"2024-01": (2, 500000), "2024-02": (2, 500000)}


def test_freq_table_from_counts_equals_raw_path(spark):
    """The from-counts finalize (the streaming fold's form) must equal
    the raw-row path exactly — and must be split-merge invariant: counts
    aggregated in two halves and added (the apply_agg_delta shape) give
    the same statistics as one-shot counts."""
    import random

    from analyzing_big_data_in_scala_spark.operators.quantiles import (
        freq_table_rank_stats,
        freq_table_rank_stats_from_counts,
    )

    rng = random.Random(11)
    rows = [("g%d" % (i % 2), rng.randint(0, 5)) for i in range(120)]
    df = spark.createDataFrame(rows, "g string, v long")
    ranks = {"median": "(n + 1) DIV 2", "p90": "(n * 9 + 9) DIV 10"}
    raw = {(r.g): (r.n, r.median, r.p90)
           for r in freq_table_rank_stats(df, "g", "v", ranks).collect()}

    half1 = spark.createDataFrame(rows[:60], "g string, v long")
    half2 = spark.createDataFrame(rows[60:], "g string, v long")
    c1 = half1.groupBy("g", "v").agg(F.count("*").alias("n"))
    c2 = half2.groupBy("g", "v").agg(F.count("*").alias("n"))
    merged = (
        c1.unionAll(c2).groupBy("g", "v").agg(F.sum("n").alias("n"))
    )
    got = {(r.g): (r.n, r.median, r.p90)
           for r in freq_table_rank_stats_from_counts(
               merged, "g", "v", "n", ranks).collect()}
    assert got == raw


def test_prefix_scan_bucketed_matches_single_window(spark):
    """prefix_scan_bucketed must equal the plain single-window scan for
    every bucket size — bucketing is a physical knob, not a semantic
    one — including signed values (the prefix min moves), multi-bucket
    keys, and both anchor modes."""
    import random

    from pyspark.sql import Window

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        prefix_scan_bucketed,
    )

    rng = random.Random(23)
    rows = [
        (i, i % 3, rng.randint(0, 99), rng.randint(-10, 10))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, k long, t long, v long")
    w = (
        Window.partitionBy("k")
        .orderBy("t", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    plain = df.select(
        "id",
        F.sum("v").over(w).alias("s"),
        F.min(F.sum("v").over(w)).over(w).alias("obs_min"),
    )
    for anchor in (True, False):
        want = {}
        for r in plain.collect():
            m = min(0, r.obs_min) if anchor else r.obs_min
            want[r.id] = (r.s, m)
        for bucket in (1, 7, 1000):
            got = {
                r.id: (r.s, r.m)
                for r in prefix_scan_bucketed(
                    df.withColumn("b", F.expr(f"t DIV {bucket}")),
                    key_col="k", order_cols=("t", "id"), value_col="v",
                    bucket_col="b", out_sum="s", out_min="m",
                    anchor_zero=anchor,
                ).collect()
            }
            assert got == want, (anchor, bucket)


def test_prefix_scan_bucketed_rejects_collisions(spark):
    import pytest

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        prefix_scan_bucketed,
    )

    df = spark.createDataFrame([(1, 1, 1, 1)], "id long, k long, b long, v long")
    with pytest.raises(ValueError, match="already exist"):
        prefix_scan_bucketed(
            df.withColumn("s", F.lit(1)), "k", ("id",), "v", "b", out_sum="s"
        )
    with pytest.raises(ValueError, match="internal names"):
        prefix_scan_bucketed(
            df.withColumn("_psb_lrun", F.lit(1)), "k", ("id",), "v", "b"
        )


def test_langid_confusion_matches_bruteforce(spark):
    got = {
        (r.lang, r.pred_lang): (r.n, r.share_ppm)
        for r in QUERIES["doc_langid_confusion"].fn(spark, SF_SMALL).collect()
    }
    from analyzing_big_data_in_scala_spark.functions.text import (
        LANG_STOP_PROFILES,
    )

    rows = _rows("SELECT doc_id, lang, text FROM documents")
    import re as _re

    profiles = {
        lang: {w.lower() for w in ws} for lang, ws in LANG_STOP_PROFILES.items()
    }
    cells = Counter()
    for doc_id, lang, text in rows:
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        if not toks:
            continue  # tokenizer's domain: empty docs are not evaluated
        # r12 profile classifier: argmax profile hit count; unknown below
        # the 5% floor; ties prefer en then alphabetical.
        counts = {
            lg: sum(1 for t in toks if t in ws) for lg, ws in profiles.items()
        }
        m = max(counts.values())
        if m * 20 < len(toks):
            pred = "unknown"
        elif counts["en"] == m:
            pred = "en"
        else:
            pred = min(lg for lg, c in counts.items() if c == m)
        cells[(lang, pred)] += 1
    tot = Counter()
    for (lang, _p), n in cells.items():
        tot[lang] += n
    want = {
        k: (n, _div_half_up(1_000_000 * n, tot[k[0]]))
        for k, n in cells.items()
    }
    assert got == want


def test_degree_assortativity_matches_bruteforce(spark):
    got = QUERIES["graph_degree_assortativity"].fn(spark, SF_SMALL).collect()[0]
    # Rebuild the canonical undirected graph the engine uses: distinct
    # (view|click|purchase) user->user edges via the shared-event rule is
    # graph-specific; recompute from the SAME canonical edge oracle by
    # reusing the registered SQL's canon CTE through DuckDB.
    canon_sql = QUERIES["graph_degree_assortativity"].oracle
    prefix = canon_sql[: canon_sql.index("adj AS")].rstrip().rstrip(",")
    edges = _rows(prefix + " SELECT a, b FROM canon")
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    want = math.floor(num * 1_000_000.0 / den + 0.5) if den else None
    assert got.n_degree_pairs == n and got.n_edges == n // 2
    assert got.assortativity_ppm == want


def test_dedup_mass_by_source_matches_bruteforce(spark):
    got = {
        r.source: (r.n_docs, r.n_dropped, r.drop_ppm)
        for r in QUERIES["dedup_mass_by_source"].fn(spark, SF_SMALL).collect()
    }
    import re as _re

    rows = _rows("SELECT doc_id, source, text FROM documents")
    groups = defaultdict(list)
    for doc_id, source, text in rows:
        norm = _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        groups[norm].append((doc_id, source))
    per_source = defaultdict(lambda: [0, 0])
    for members in groups.values():
        keep = min(d for d, _s in members)
        for d, s in members:
            per_source[s][0] += 1
            if d != keep:
                per_source[s][1] += 1
    want = {
        s: (n, dropped, _div_half_up(1_000_000 * dropped, n))
        for s, (n, dropped) in per_source.items()
    }
    assert got == want


def test_contamination_by_source_matches_bruteforce(spark):
    got = {
        r.source: (r.n_docs, r.n_contaminated, r.total_hits, r.contam_ppm)
        for r in QUERIES["corpus_contamination_by_source"].fn(
            spark, SF_SMALL
        ).collect()
    }
    import re as _re

    rows = _rows("SELECT doc_id, source, text FROM documents")
    grams = {}
    src = {}
    for doc_id, source, text in rows:
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        grams[doc_id] = {
            " ".join(toks[i:i + 5]) for i in range(len(toks) - 4)
        }
        src[doc_id] = source
    bench = set().union(*(g for d, g in grams.items() if d % 25 == 0))
    per_source = defaultdict(lambda: [0, 0, 0])
    for d, g in grams.items():
        if d % 25 == 0:
            continue
        hits = len(g & bench)
        rec = per_source[src[d]]
        rec[0] += 1
        rec[1] += 1 if hits >= 3 else 0
        rec[2] += hits
    want = {
        s: (n, c, h, _div_half_up(1_000_000 * c, n))
        for s, (n, c, h) in per_source.items()
    }
    assert got == want


def test_product_overflow_guard_both_directions(spark):
    """The r11 product-bound guard family (Σ of per-row products bounded
    by n·max|x|) is ENFORCED: the bound trips while actual sums still
    fit (the silent-wrap zone), and sane magnitudes pass unchanged."""
    import pytest

    from analyzing_big_data_in_scala_spark.operators._util import (
        product_overflow_guard,
    )

    hot = spark.createDataFrame(
        [("u", 3_000_000_000_000, 4_000_000)], "g string, n long, m long"
    )  # bound 1.2e19 >= 2^63; an actual sum could still be far smaller
    with pytest.raises(Exception, match="overflow risk"):
        hot.select(
            product_overflow_guard("n", "m", "op", "rescale", group_col="g")
        ).collect()
    ok = spark.createDataFrame([("u", 1000, 4_000_000)], "g string, n long, m long")
    assert ok.select(
        product_overflow_guard("n", "m", "op", "rescale", group_col="g")
    ).collect()[0]["n"] == 1000


def test_similarity_histogram_matches_bruteforce(spark):
    """numpy recomputation of the ring-pair cosine histogram, including
    the int8 quantization — independent of both engines' SQL trees."""
    import numpy as np

    got = {
        (r.step, r.bucket): r.n_pairs
        for r in QUERIES["embeddings_similarity_histogram"].fn(
            spark, SF_SMALL
        ).collect()
    }
    rows = _rows("SELECT vec_id, embedding FROM embeddings")
    q = {}
    for vid, emb in rows:
        v = np.array(emb, dtype=np.float64)
        m = np.abs(v).max()
        q[vid] = np.floor(v / (m / 127.0) + 0.5) if m > 0 else np.zeros_like(v)
    want = Counter()
    for step in (1, 17, 401):
        for vid, qa in q.items():
            qb = q.get(vid + step)
            if qb is None:
                continue
            na, nb = float(qa @ qa), float(qb @ qb)
            if na <= 0 or nb <= 0:
                continue
            c = float(qa @ qb) / (np.sqrt(na) * np.sqrt(nb))
            want[(step, int(np.floor(c * 10)))] += 1
    assert got == dict(want)
