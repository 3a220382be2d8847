"""Property-based invariants (SURVEY.md §5.4) via hypothesis: random
corpora through the real operators, asserting the algebraic laws that must
hold for ANY input. Example counts are kept small — each example is a real
Spark job."""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.operators import dedup as D
from analyzing_big_data_in_scala_spark.operators import graph as G
from analyzing_big_data_in_scala_spark.operators import tfidf as T

TEXTS = st.lists(
    st.text(alphabet="abcxyz !?.,0", min_size=0, max_size=40), min_size=1, max_size=8
)
PROP_SETTINGS = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@PROP_SETTINGS
@given(texts=TEXTS)
def test_tfidf_invariants(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    n = len(texts)
    tf = T.term_frequencies(docs).collect()
    # TF >= 1; terms are normalized (lowercase alnum, non-empty)
    for r in tf:
        assert r.tf >= 1
        assert re.fullmatch(r"[a-z0-9]+", r.term), r.term
    dfreq = T.doc_frequencies(T.term_frequencies(docs)).collect()
    for r in dfreq:
        assert 1 <= r.df <= n  # DF <= N
    idf = T.inverse_doc_frequencies(T.doc_frequencies(T.term_frequencies(docs)), n).collect()
    for r in idf:
        assert r.idf >= -1e-12  # idf = ln(N/df) >= 0
        assert r.idf <= math.log(n) + 1e-12


@PROP_SETTINGS
@given(texts=TEXTS)
def test_jaccard_bounds_and_symmetric_inputs(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    pairs = D.ngram_jaccard_pairs(docs, k=2, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b


@PROP_SETTINGS
@given(texts=TEXTS)
def test_simhash_is_32_bits_and_duplicate_stable(spark, texts):
    # Duplicate every text: identical docs must get identical fingerprints.
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + 1000, t) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.id: r.simhash for r in D.simhash_fingerprints(docs, bits=32).collect()}
    for i, t in enumerate(texts):
        if i in fps:
            assert 0 <= fps[i] < (1 << 32)
            assert fps[i] == fps[i + 1000]


@PROP_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=15
    )
)
def test_graph_invariants(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    e = df.filter(F.col("src") != F.col("dst"))
    n_edges = e.count()
    if n_edges == 0:
        return
    out_sum = sum(r.out_degree for r in G.out_degrees(e).collect())
    in_sum = sum(r.in_degree for r in G.in_degrees(e).collect())
    assert out_sum == in_sum == n_edges  # degree sums == |E|

    comp = G.connected_components(e).collect()
    labels = {r.id: r.component for r in comp}
    # every component label is itself a member vertex and the minimum
    for comp_id in set(labels.values()):
        members = {v for v, c in labels.items() if c == comp_id}
        assert comp_id in members and comp_id == min(members)


@PROP_SETTINGS
@given(texts=TEXTS)
def test_rolling_fingerprint_invariants(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    fps = {r.doc_id: r.fingerprint for r in D.rolling_fingerprint(docs).collect()}
    # total: one fingerprint per doc, in [0, M)
    assert set(fps) == set(range(len(texts)))
    for v in fps.values():
        assert 0 <= v < D.MERSENNE31
    # pure function of the normalized token stream: equal streams => equal fp
    norm = [" ".join(re.findall(r"[a-z0-9]+", t.lower())) for t in texts]
    for i, a in enumerate(norm):
        for j, b in enumerate(norm):
            if a == b:
                assert fps[i] == fps[j]


@PROP_SETTINGS
@given(texts=TEXTS, pad=st.text(alphabet="pqrst ", min_size=0, max_size=10))
def test_winnowing_guarantee_shared_run_shares_fingerprint(spark, texts, pad):
    k, w = 3, 4
    # Build two docs sharing each text as an infix, padded differently:
    # any shared normalized run of >= w + k - 1 tokens MUST share a
    # fingerprint (the winnowing coverage guarantee).
    rows, expect_overlap = [], []
    for i, t in enumerate(texts):
        n_toks = len(re.findall(r"[a-z0-9]+", t.lower()))
        rows.append((2 * i, f"{pad} {t}"))
        rows.append((2 * i + 1, f"{t} {pad}"))
        if n_toks >= w + k - 1:
            expect_overlap.append((2 * i, 2 * i + 1))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc: dict[int, set] = {}
    for r in D.winnow_fingerprints(docs, k=k, window=w).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for a, b in expect_overlap:
        assert by_doc.get(a, set()) & by_doc.get(b, set()), (a, b)


@PROP_SETTINGS
@given(texts=TEXTS)
def test_cms_never_undercounts_property(spark, texts):
    """CMS one-sided error law: estimate >= exact for EVERY key, any corpus."""
    from analyzing_big_data_in_scala_spark.operators import sketches as K
    from analyzing_big_data_in_scala_spark.operators.tfidf import token_table

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    keys = token_table(docs)
    if keys.isEmpty():
        return
    exact = {r.term: r.cnt for r in keys.groupBy("term").agg(F.count("*").alias("cnt")).collect()}
    sketch = K.cms_build(keys)
    est = {r.term: r.cms_est for r in K.cms_estimate(sketch, keys.distinct()).collect()}
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)
    # total mass conservation: every grid row sums to the stream length
    n = sum(exact.values())
    rows = {}
    for r in sketch.collect():
        rows[r.row] = rows.get(r.row, 0) + r.cnt
    assert all(v == n for v in rows.values()), rows


@PROP_SETTINGS
@given(texts=TEXTS)
def test_bm25_score_bounds_and_matching(spark, texts):
    """Scores are positive for matching docs only; n_matched <= |query|."""
    from analyzing_big_data_in_scala_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    res = bm25_scores(docs, ["a", "0", "xy"]).collect()
    toks = {i: set(re.findall(r"[a-z0-9]+", t.lower())) for i, t in enumerate(texts)}
    for r in res:
        matched = toks[r.doc_id] & {"a", "0", "xy"}
        assert matched, r  # only matching docs appear
        assert r.n_matched == len(matched)
        assert r.score_ppm > 0  # idf > 0 when df <= N


@PROP_SETTINGS
@given(
    vecs=st.lists(
        st.lists(st.floats(-8, 8, allow_nan=False, width=32), min_size=6, max_size=6),
        min_size=1,
        max_size=6,
    )
)
def test_projection_linearity_and_bounds(spark, vecs):
    """|value| <= in_dim*127; identical vectors project identically."""
    from analyzing_big_data_in_scala_spark.operators.projection import random_projection

    rows = list(enumerate(vecs)) + [(100 + i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r.vec_id, r.dim_idx): r.value for r in random_projection(emb, 4, 6).collect()}
    for (vid, k), val in out.items():
        assert abs(val) <= 6 * 127
    for i in range(len(vecs)):
        for k in range(4):
            assert out[(i, k)] == out[(100 + i, k)]


@PROP_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    ),
    k=st.integers(1, 4),
)
def test_kcore_invariants(spark, edges, k):
    """Every survivor's core_degree >= k, and the survivor set is a
    fixpoint: re-running the peel on the induced subgraph changes nothing."""
    e = spark.createDataFrame(edges, "src long, dst long")
    core = {r.id: r.core_degree for r in G.kcore_vertices(e, k=k).collect()}
    for v, d in core.items():
        assert d >= k, (v, d, k)
    # independent fixpoint check in plain Python
    und = {tuple(sorted(t)) for t in edges if t[0] != t[1]}
    alive = {v for t in und for v in t}
    changed = True
    while changed:
        deg = {v: 0 for v in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {v for v, d in deg.items() if d < k}
        changed = bool(drop)
        alive -= drop
    assert set(core) == alive
    want_deg = {v: 0 for v in alive}
    for a, b in und:
        if a in alive and b in alive:
            want_deg[a] += 1
            want_deg[b] += 1
    assert core == want_deg


# Random per-user event streams: (user 0..2, minute offset 0..30, state a..c).
# Unique (user, minute) pairs keep the (ts, tie) order total without relying
# on generated event ids.
SCD2_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=30),
        # None exercises the "NULL is a state" contract — including a key
        # whose FIRST batch state is NULL (the r4 absorb bug).
        st.sampled_from(["a", "b", "c", None]),
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda t: (t[0], t[1]),
)


@PROP_SETTINGS
@given(events=SCD2_EVENTS, split=st.integers(min_value=0, max_value=31))
def test_scd2_apply_batch_equals_rebuild_property(spark, events, split):
    """For ANY event stream and ANY time split point, folding the newer
    part into the older part's history must equal the full rebuild —
    including empty-base and empty-batch splits."""
    from datetime import datetime, timedelta

    from analyzing_big_data_in_scala_spark.operators.merge import (
        scd2_apply_batch,
        scd2_history,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (u, t0 + timedelta(minutes=m), s, u * 1000 + m) for (u, m, s) in events
    ]
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    full = spark.createDataFrame(rows, schema)
    base = [r for r in rows if r[1] < t0 + timedelta(minutes=split)]
    batch = [r for r in rows if r[1] >= t0 + timedelta(minutes=split)]
    args = dict(key="user_id", state_col="event_type", ts_col="ts", tie_col="event_id")
    want = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(full, **args).collect()
    }
    if not base:
        # Empty history: the fold IS the plain build over the batch.
        hist = spark.createDataFrame([], "user_id long, state string, valid_from timestamp, valid_to timestamp, version int, is_current boolean")
    else:
        hist = scd2_history(spark.createDataFrame(base, schema), **args)
    if batch:
        got_df = scd2_apply_batch(hist, spark.createDataFrame(batch, schema), **args)
    else:
        got_df = hist
    got = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in got_df.collect()
    }
    assert got == want


ROLLUP_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60 * 60 * 30),  # offset sec, ~30h span
        st.sampled_from(["a", "b"]),
        st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=25,
)


@PROP_SETTINGS
@given(events=ROLLUP_EVENTS)
def test_multires_rollup_lossless_property(spark, events):
    """Every level of the rollup re-aggregates the finer level's partials
    LOSSLESSLY for ANY input: per-level totals equal the raw totals, and
    each (level, key) marginal equals a direct GROUP BY at that level."""
    from datetime import datetime, timedelta

    from analyzing_big_data_in_scala_spark.operators.rollup import multires_rollup

    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(seconds=s), k, v) for (s, k, v) in events]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = multires_rollup(df).collect()
    raw_n = len(rows)
    # Spark ROUND is HALF_UP (away from zero for negatives) — mirror it.
    raw_s = sum(
        math.floor(v * 10000 + 0.5) if v >= 0 else -math.floor(-v * 10000 + 0.5)
        for _, _, v in rows
    )
    by_level: dict = {}
    for r in out:
        lv = by_level.setdefault(r.level, [0, 0])
        lv[0] += r.n
        lv[1] += r.sum_value_e4
    assert set(by_level) == {"10min", "1h", "1d"}
    for lv, (n, s) in by_level.items():
        assert n == raw_n, (lv, n, raw_n)
        assert s == raw_s, (lv, s, raw_s)


def _py_greedy_merge(symbols: list[str], left: str, right: str) -> list[str]:
    """Reference token-space BPE merge: scan left-to-right, merge every
    non-overlapping (left, right) adjacency greedily."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@PROP_SETTINGS
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=1, max_size=12),
    pair=st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a"), ("c", "c")]),
)
def test_bpe_apply_merge_equals_token_space_greedy(spark, syms, pair):
    """The two-pass padded literal replace (operators/bpe.apply_merge) must
    equal the token-space left-to-right greedy merge for ANY symbol
    sequence — including overlapping chains (a,a over 'a a a') and symbols
    that are prefixes/suffixes of each other ('ab' vs 'a'/'b'), where a
    substring-unaware replace would corrupt tokens."""
    from analyzing_big_data_in_scala_spark.operators.bpe import apply_merge

    left, right = pair
    got = spark.range(1).select(
        apply_merge(F.lit(" ".join(syms)), left, right).alias("s")
    ).first().s
    want = " ".join(_py_greedy_merge(syms, left, right))
    assert got == want, f"{syms} merge {pair}: {got!r} != {want!r}"


@PROP_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=30), min_size=2, max_size=6
    ),
    shared=st.text(alphabet="xy z", min_size=11, max_size=16),
)
def test_exact_substring_removal_property(spark, texts, shared):
    """Plant a shared passage into the first two docs of a random corpus:
    after removal (window=3, stride=1) no length-3 cross-doc duplicated
    token window survives anywhere (re-running the pass removes nothing),
    and untouched docs come back with all tokens intact."""
    from analyzing_big_data_in_scala_spark.operators.chunking import (
        exact_substring_removal,
    )
    from analyzing_big_data_in_scala_spark.functions.text import tokens as tok

    planted = [
        (0, texts[0] + " " + shared),
        (1, shared + " " + texts[1]),
    ] + [(i, t) for i, t in enumerate(texts[2:], start=2)]
    docs = spark.createDataFrame(planted, "doc_id long, text string")
    cleaned = exact_substring_removal(docs, window=3, stride=1)
    total = cleaned.agg(F.sum("n_tokens"), F.sum("n_removed_tokens")).first()
    assert total[1] is None or total[1] <= total[0]
    redo = exact_substring_removal(
        cleaned.select("doc_id", F.col("cleaned_text").alias("text")),
        window=3,
        stride=1,
    )
    assert (redo.agg(F.sum("n_removed_tokens")).first()[0] or 0) == 0


@PROP_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=14,
    ),
    rounds=st.integers(1, 3),
)
def test_label_propagation_equals_python_simulation(spark, edges, rounds):
    """Sync LPA must equal a direct per-round Python simulation (most
    frequent undirected-neighbor label, ties -> smallest) on any graph."""
    from collections import Counter

    from analyzing_big_data_in_scala_spark.operators.graph import label_propagation

    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nbrs: dict[int, list[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        labels = {
            v: min(
                Counter(labels[u] for u in ns).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v, ns in nbrs.items()
        }
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r.id: r.label for r in label_propagation(df, rounds=rounds).collect()}
    assert got == labels


BLOOM_KEYS = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30
)


@PROP_SETTINGS
@given(build_keys=BLOOM_KEYS, probe_keys=BLOOM_KEYS)
def test_bloom_pruned_join_equals_plain_join_property(spark, build_keys, probe_keys):
    """For ANY build/probe key sets (negative keys, duplicates, disjoint
    sets), the Bloom-pruned join is row-for-row the plain inner join — the
    no-false-negative law."""
    from analyzing_big_data_in_scala_spark.operators.bloomjoin import bloom_pruned_join

    big = spark.createDataFrame([(k, i) for i, k in enumerate(probe_keys)], "k long, pid long")
    build = spark.createDataFrame([(k, i) for i, k in enumerate(build_keys)], "k long, bid long")
    got = sorted(map(tuple, bloom_pruned_join(big, build, "k", m_bits=1 << 10).collect()))
    want = sorted(map(tuple, big.join(build, "k").collect()))
    assert got == want


RLE_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.sampled_from("ABC"),  # type
    ),
    min_size=1,
    max_size=25,
)


@PROP_SETTINGS
@given(rows=RLE_EVENTS)
def test_run_length_encode_matches_python_rle(spark, rows):
    """RLE over any sequence equals the obvious per-user Python fold, and
    run lengths per user always sum back to the user's row count."""
    import datetime as dt
    import itertools

    from analyzing_big_data_in_scala_spark.operators.sequence import run_length_encode

    ev = spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=eid), uid, typ)
            for eid, (uid, typ) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = sorted(
        (r.user_id, r.run_id, r.event_type, r.run_len) for r in run_length_encode(ev).collect()
    )
    want = []
    by_user: dict[int, list[str]] = {}
    for uid, typ in rows:
        by_user.setdefault(uid, []).append(typ)
    for uid, seq in by_user.items():
        for rid, (typ, grp) in enumerate(itertools.groupby(seq), start=1):
            want.append((uid, rid, typ, len(list(grp))))
    assert got == sorted(want)


EV_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=5000),   # seconds offset
        # NULL is a state (VERDICT r7 item 2): the PIT/rollup paths must
        # survive None event types — NULL-safe run collapse in
        # scd2_history, NULL carried fields in the as-of struct.
        st.sampled_from(["A", "B", "C", None]),     # type
    ),
    min_size=1,
    max_size=30,
)


@PROP_SETTINGS
@given(rows=EV_ROWS, late_mod=st.integers(min_value=2, max_value=5))
def test_rollup_backfill_equals_full_recompute_property(spark, rows, late_mod):
    """For ANY event set and any deterministic late split, the stitched
    (untouched ∪ restated) rollup equals the one-shot recompute."""
    import datetime as dt

    from pyspark.sql import functions as F

    from analyzing_big_data_in_scala_spark.operators.rollup import rollup_backfill

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(seconds=sec), typ, uid)
            for i, (uid, sec, typ) in enumerate(rows)
        ],
        "event_id long, ts timestamp, event_type string, user_id long",
    )
    on_time = ev.filter(F.col("event_id") % late_mod != 1)
    late = ev.filter(F.col("event_id") % late_mod == 1)
    # None-safe sort key: event_type may be NULL (a real group key).
    nkey = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(map(tuple, rollup_backfill(on_time, late).collect()), key=nkey)
    want = sorted(
        map(
            tuple,
            ev.groupBy(
                F.floor(F.unix_timestamp("ts") / 600).cast("long").alias("bucket"),
                "event_type",
            )
            .agg(F.count("*").alias("n"), F.count_distinct("user_id").alias("distinct_users"))
            .collect(),
        ),
        key=nkey,
    )
    assert got == want


MERGE_CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # key (0-7 exist in base)
        st.sampled_from("IUD"),                  # claimed op
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],                    # one change per key (no seq)
)


@PROP_SETTINGS
@given(changes=MERGE_CHANGES)
def test_change_feed_fold_equals_merge_upsert_property(spark, changes):
    """Folding the change feed into the base reproduces merge_upsert for
    ANY single-change-per-key batch (including phantom keys and claimed
    ops that get reclassified)."""
    from pyspark.sql import functions as F

    from analyzing_big_data_in_scala_spark.operators.merge import (
        merge_change_feed,
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, float(k * 10)) for k in range(8)], "k long, v double"
    )
    ch_rows = [(k, op, float(k * 100 + 1)) for k, op in changes]
    changes_df = spark.createDataFrame(
        ch_rows, "k long, op string, v double"
    ) if ch_rows else spark.createDataFrame([], "k long, op string, v double")
    feed = merge_change_feed(base, changes_df, key="k")
    applied = (
        base.join(feed, "k", "full_outer")
        .filter((F.col("change_type").isNull()) | (F.col("change_type") != "delete"))
        .select("k", F.coalesce(F.col("after_v"), F.col("v")).alias("v"))
    )
    want = merge_upsert(base, changes_df, key="k")
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, want.collect()))


@PROP_SETTINGS
@given(rows=EV_ROWS)
def test_pit_lookback_matches_python_bruteforce(spark, rows):
    """For ANY event set, the PIT lookback join equals the brute-force
    per-event scan of the user's SCD2 versions (collapse runs, then find
    the version containing ts - 1h)."""
    import datetime as dt
    import itertools
    import os
    import shutil
    import tempfile

    from analyzing_big_data_in_scala_spark.plans.registry import QUERIES
    import analyzing_big_data_in_scala_spark.plans  # noqa: F401

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, t0 + dt.timedelta(seconds=sec), uid, typ, 0.0, "{}")
        for i, (uid, sec, typ) in enumerate(rows)
    ]
    stage = tempfile.mkdtemp(prefix="pit_prop_")
    try:
        spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).write.mode("overwrite").parquet(os.path.join(stage, "events.parquet"))
        got = {
            r.event_id: r.state_1h_before
            for r in QUERIES["events_pit_state_lookback"].fn(spark, stage).collect()
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    # Python reference: versions per user from (ts, event_id)-ordered
    # events with consecutive-duplicate collapse; zero-width versions
    # (same valid_from) keep only the last.
    by_user: dict[int, list] = {}
    for eid, ts, uid, typ, _, _ in data:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        versions = []  # (valid_from, state)
        prev = object()
        for ts, eid, typ in evs:
            if typ != prev or (typ is None) != (prev is None):
                if versions and versions[-1][0] == ts:
                    versions[-1] = (ts, typ)  # zero-width predecessor dies
                else:
                    versions.append((ts, typ))
            prev = typ
        for ts, eid, typ in evs:
            lb = ts - dt.timedelta(hours=1)
            valid = [v for v in versions if v[0] <= lb]
            if valid:
                want[eid] = valid[-1][1]
    assert got == want

# Timestamps include None (r8 ADVICE): a NULL ts on either side must mean
# "never matches" in BOTH directions — before the r9 fix, backward's
# NULLS-FIRST ascending sort could carry a NULL-ts right row as a match
# when tolerance was None, and forward's NULLS-LAST descending sort could
# hand a NULL-ts LEFT row the earliest right row.
# Keys sample None too: NULL is a join key. The reference semantics
# (and the window partitionBy the plain forms compile to) put NULL keys
# in ONE group — NULL-key left rows match NULL-key right rows.
ASOF_LEFT = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # key
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),  # ts
    ),
    min_size=1,
    max_size=20,
)
ASOF_RIGHT = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # key
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),  # ts
        st.one_of(st.none(), st.sampled_from(["X", "Y", "Z"])),   # val a
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # val b
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: (t[0], t[1]),  # right rows unique per (key, ts)
)


def _asof_bruteforce(left_rows, right_rows, forward, tol):
    """Reference semantics shared by both property tests: NULL ts on
    either side never matches; otherwise forward picks the EARLIEST right
    row at-or-after, backward the LATEST at-or-before; a nearest match
    beyond `tolerance` is no match."""
    want = {}
    for i, (k, t) in enumerate(left_rows):
        if t is None:
            want[i] = (None, None)
            continue
        usable = [rr for rr in right_rows if rr[0] == k and rr[1] is not None]
        if forward:
            cands = [rr for rr in usable if rr[1] >= t]
            pick = min(cands, key=lambda rr: rr[1]) if cands else None
            gap = pick[1] - t if pick else None
        else:
            cands = [rr for rr in usable if rr[1] <= t]
            pick = max(cands, key=lambda rr: rr[1]) if cands else None
            gap = t - pick[1] if pick else None
        if pick is not None and (tol is None or gap <= tol):
            want[i] = (pick[2], pick[3])
        else:
            want[i] = (None, None)
    return want


@PROP_SETTINGS
# Pinned splice counterexample (always runs, independent of the random
# draw): latest right row (t=2) has a NULL in `a`; per-column carry would
# backfill "X" from the t=1 version — the exact r7 field-splice bug.
@example(
    left_rows=[(0, 3)],
    right_rows=[(0, 1, "X", 5), (0, 2, None, 7)],
)
# Pinned NULL-ts counterexample (r9 fix): a right row with NULL ts sorts
# NULLS FIRST in the backward scan and must NOT be carried as a match.
@example(
    left_rows=[(0, 3)],
    right_rows=[(0, None, "X", 5)],
)
@given(left_rows=ASOF_LEFT, right_rows=ASOF_RIGHT)
def test_asof_backward_carries_latest_right_row_wholesale(spark, left_rows, right_rows):
    """Regression pin for the r7 struct-carry fix (VERDICT r7 item 2): with
    NULLs scattered independently across right_vals, the as-of join must
    attach the latest qualifying right row WHOLESALE — a NULL field in that
    row stays NULL. The reverted per-column last(ignorenulls) carry would
    field-splice: it fills a NULL field from an OLDER right version, which
    this brute-force comparison catches (e.g. right (k,1,"X",5) then
    (k,2,NULL,7); a left row at t=3 must get (NULL,7), not ("X",7))."""
    from analyzing_big_data_in_scala_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, t long",
    )
    right_schema = "k long, t long, a string, b long"
    right = (
        spark.createDataFrame(right_rows, right_schema)
        if right_rows
        else spark.createDataFrame([], right_schema)
    )
    got = {
        r.lid: (r.a, r.b)
        for r in asof_join_backward(
            left, right, "k", "k", "t", "t", ["a", "b"]
        ).collect()
    }
    assert got == _asof_bruteforce(left_rows, right_rows, forward=False, tol=None)

@PROP_SETTINGS
@example(  # splice pin, forward flavor: nearest-at-or-after row wholesale
    left_rows=[(0, 1)],
    right_rows=[(0, 3, "X", 5), (0, 2, None, 7)],
    forward=True,
    tol=None,
)
@example(  # NULL-ts LEFT row pin (r9 fix): forward's NULLS-LAST descending
    # sort would otherwise carry the earliest right row into it.
    left_rows=[(0, None)],
    right_rows=[(0, 2, "X", 5)],
    forward=True,
    tol=None,
)
@example(  # NULL-ts RIGHT row pin, backward, tolerance=None.
    left_rows=[(0, 3)],
    right_rows=[(0, None, "X", 5)],
    forward=False,
    tol=None,
)
@given(
    left_rows=ASOF_LEFT,
    right_rows=ASOF_RIGHT,
    forward=st.booleans(),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
)
def test_asof_direction_and_tolerance_match_bruteforce(
    spark, left_rows, right_rows, forward, tol
):
    """Both directions x optional tolerance against the Python brute
    force: forward picks the EARLIEST right row at-or-after, backward the
    LATEST at-or-before; a nearest match beyond `tolerance` is no match
    (all fields NULL), never replaced by a farther in-tolerance row —
    tolerance bounds the as-of pick, it does not re-rank candidates."""
    from analyzing_big_data_in_scala_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, t long",
    )
    right_schema = "k long, t long, a string, b long"
    right = (
        spark.createDataFrame(right_rows, right_schema)
        if right_rows
        else spark.createDataFrame([], right_schema)
    )
    op = asof_join_forward if forward else asof_join_backward
    got = {
        r.lid: (r.a, r.b)
        for r in op(left, right, "k", "k", "t", "t", ["a", "b"], tolerance=tol).collect()
    }
    assert got == _asof_bruteforce(left_rows, right_rows, forward=forward, tol=tol)


@PROP_SETTINGS
@example(  # carry-in pin: the match lives in an EARLIER bucket (t=1 is
    # buckets away from the left row at t=50 when bucket_size=5) and must
    # arrive through the stitch, not the local carry.
    left_rows=[(0, 50)],
    right_rows=[(0, 1, "X", 5)],
    bucket_size=5,
    tol=None,
)
@example(  # boundary pin: right row exactly at a bucket edge (t=10,
    # bucket_size=5) plus a tie at the left timestamp — local carry must
    # beat the carry-in and ties must still match "at or before".
    left_rows=[(0, 10)],
    right_rows=[(0, 10, "X", 5), (0, 9, "Y", 7)],
    bucket_size=5,
    tol=None,
)
@example(  # NULL-ts left-row pin: NULL buckets sort first; the empty
    # stitch frame must leave the row unmatched, never carry into it.
    left_rows=[(0, None)],
    right_rows=[(0, 2, "X", 5)],
    bucket_size=5,
    tol=None,
)
@example(  # NULL-key CROSS-BUCKET pin (r11 fix): the right row sits in
    # bucket 0, the left row in bucket 3 — the match must flow through
    # the carry-in stitch, whose join on _k must be NULL-SAFE or the
    # NULL-key group silently loses every cross-bucket carry.
    left_rows=[(None, 10)],
    right_rows=[(None, 2, "X", 5)],
    bucket_size=3,
    tol=None,
)
@given(
    left_rows=ASOF_LEFT,
    right_rows=ASOF_RIGHT,
    bucket_size=st.sampled_from([1, 3, 7, 100]),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
)
def test_asof_bucketed_matches_bruteforce(
    spark, left_rows, right_rows, bucket_size, tol
):
    """The time-range pre-bucketed (carry-stitch) backward as-of must be
    value-identical to the plain form for EVERY bucket size — bucket_size
    is a physical knob, not a semantic one. bucket_size=1 maximizes
    stitch traffic (every row alone in its bucket: all matches flow
    through carry-ins), 100 degenerates to the plain single-window case,
    3/7 exercise mixed local/stitch paths and bucket-edge ties."""
    from analyzing_big_data_in_scala_spark.operators.asof import (
        asof_join_backward_bucketed,
    )

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, t long",
    )
    right_schema = "k long, t long, a string, b long"
    right = (
        spark.createDataFrame(right_rows, right_schema)
        if right_rows
        else spark.createDataFrame([], right_schema)
    )
    got = {
        r.lid: (r.a, r.b)
        for r in asof_join_backward_bucketed(
            left, right, "k", "k", "t", "t", ["a", "b"],
            bucket_size=bucket_size, tolerance=tol,
        ).collect()
    }
    assert got == _asof_bruteforce(left_rows, right_rows, forward=False, tol=tol)


@PROP_SETTINGS
@example(  # boundary-spanning run pin: one run covers three buckets
    # (bucket_size=3, ts 0..8 all same type) — the stitch must merge the
    # three local runs into run_id=1 with run_len=9.
    rows=[(0, t, "a") for t in range(9)],
    bucket_size=3,
)
@example(  # NULL-ts pin: NULL buckets sort first on both levels, exactly
    # like the plain form's NULLS FIRST ordering.
    rows=[(0, None, "a"), (0, 1, "a"), (0, None, "b")],
    bucket_size=5,
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),                      # key
            st.one_of(st.none(), st.integers(min_value=0, max_value=40)),  # ts
            st.sampled_from(["a", "b", "c"]),                           # type
        ),
        min_size=1,
        max_size=30,
    ),
    bucket_size=st.sampled_from([1, 3, 7, 100]),
)
def test_rle_bucketed_matches_plain(spark, rows, bucket_size):
    """The time-range pre-bucketed RLE must be value-identical to the
    plain single-window form for EVERY bucket size — same run ids, run
    lengths, and first ids (consecutive local runs within a bucket never
    share a type, so the cross-boundary stitch is exactly a second RLE
    over local runs and the running-sum numbering is preserved).
    bucket_size=1 maximizes boundary stitches; 100 degenerates to the
    plain case."""
    from analyzing_big_data_in_scala_spark.operators.sequence import (
        run_length_encode,
        run_length_encode_bucketed,
    )

    df = spark.createDataFrame(
        [(k, t, ty, i) for i, (k, t, ty) in enumerate(rows)],
        "user_id long, ts long, event_type string, event_id long",
    )
    key = lambda r: (r["user_id"], r["run_id"])  # noqa: E731
    val = lambda r: (r["event_type"], r["run_len"], r["first_event_id"])  # noqa: E731
    got = {key(r): val(r) for r in run_length_encode_bucketed(
        df, bucket_size=bucket_size).collect()}
    want = {key(r): val(r) for r in run_length_encode(df).collect()}
    assert got == want


def _asof_nearest_bruteforce(left_rows, right_rows, tol):
    """Reference semantics for the nearest as-of: smallest |gap| wins,
    ties (d before vs d after) go to the EARLIER right row; NULL ts on
    either side never matches; tolerance bounds |gap| symmetrically."""
    want = {}
    for i, (k, t) in enumerate(left_rows):
        if t is None:
            want[i] = (None, None)
            continue
        cands = [rr for rr in right_rows if rr[0] == k and rr[1] is not None]
        if tol is not None:
            cands = [rr for rr in cands if abs(rr[1] - t) <= tol]
        pick = min(cands, key=lambda rr: (abs(rr[1] - t), rr[1])) if cands else None
        want[i] = (pick[2], pick[3]) if pick is not None else (None, None)
    return want


@PROP_SETTINGS
# Equidistant-tie pin: right rows at t=2 and t=6 are both 2 away from the
# left row at t=4 — the EARLIER (t=2, backward) row must win.
@example(
    left_rows=[(0, 4)],
    right_rows=[(0, 2, "X", 5), (0, 6, "Y", 7)],
    tol=None,
)
# Tolerance-excludes-nearest pin: the only right row is 5 away with tol=3
# — no match, never a farther row.
@example(left_rows=[(0, 10)], right_rows=[(0, 5, "X", 1)], tol=3)
# NULL-ts right row pin: must never match in either directional carry.
@example(left_rows=[(0, 3)], right_rows=[(0, None, "X", 5)], tol=None)
@given(
    left_rows=ASOF_LEFT,
    right_rows=ASOF_RIGHT,
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
)
def test_asof_nearest_matches_bruteforce(spark, left_rows, right_rows, tol):
    """Nearest as-of vs the Python brute force: closest |gap| in either
    direction, equidistant ties to the earlier right row, symmetric
    tolerance, NULL timestamps never match."""
    from analyzing_big_data_in_scala_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, t long",
    )
    right_schema = "k long, t long, a string, b long"
    right = (
        spark.createDataFrame(right_rows, right_schema)
        if right_rows
        else spark.createDataFrame([], right_schema)
    )
    got = {
        r.lid: (r.a, r.b)
        for r in asof_join_nearest(
            left, right, "k", "k", "t", "t", ["a", "b"], tolerance=tol
        ).collect()
    }
    assert got == _asof_nearest_bruteforce(left_rows, right_rows, tol)


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=-25, max_value=25),   # start
        st.integers(min_value=-3, max_value=30),    # span (negative -> inverted)
    ),
    min_size=1,
    max_size=12,
)


@PROP_SETTINGS
@given(left=INTERVALS, right=INTERVALS, bucket=st.sampled_from([1, 3, 7, 10]))
# Bucket-boundary pin: overlap point 10 sits exactly ON a bucket edge for
# bucket=10 AND the pair shares buckets 1..1 only via greatest-start —
# catches an off-by-one in either floor() of the single-emission rule.
@example(left=[(1, 0, 10)], right=[(1, 10, 10)], bucket=10)
# Many-shared-buckets pin: both intervals cover buckets 0..3; a dedup
# regression (emitting once per shared bucket) quadruples this row.
@example(left=[(1, 0, 30)], right=[(1, 0, 30)], bucket=10)
def test_interval_overlap_join_matches_naive(spark, left, right, bucket):
    """Differential vs the naive all-pairs overlap join, over random
    interval sets with inverted spans, touching endpoints, degenerate
    points, and bucket sizes both smaller and larger than the spans."""
    from analyzing_big_data_in_scala_spark.operators.asof import (
        interval_overlap_join,
    )

    lrows = [(k, s, s + d) for k, s, d in left]
    rrows = [(k, s, s + d) for k, s, d in right]
    ldf = spark.createDataFrame(lrows, "k long, s long, e long")
    rdf = spark.createDataFrame(rrows, "k long, rs long, re long")
    got = sorted(
        (r["k"], r["s"], r["e"], r["rs"], r["re"],
         r["overlap_start"], r["overlap_end"], r["overlap_len"])
        for r in interval_overlap_join(
            ldf, rdf, "k", "k", "s", "e", "rs", "re", bucket_size=bucket
        ).collect()
    )
    naive = sorted(
        (lk, ls, le, rs_, re_, max(ls, rs_), min(le, re_),
         min(le, re_) - max(ls, rs_))
        for (lk, ls, le) in lrows if le >= ls
        for (rk, rs_, re_) in rrows
        if lk == rk and rs_ <= re_ and ls <= re_ and rs_ <= le
    )
    assert got == naive


@PROP_SETTINGS
@given(intervals=INTERVALS, max_gap=st.sampled_from([0, 0, 2, 5]))
# Touching-endpoint pin: [0,5] and [5,9] share exactly one point — the
# closed-interval convention must coalesce them into ONE [0,9] segment.
@example(intervals=[(1, 0, 5), (1, 5, 4)], max_gap=0)
# Containment + duplicate pin: a duplicate pair and a contained interval
# must count in n_merged without extending the segment.
@example(intervals=[(1, 0, 10), (1, 0, 10), (1, 2, 3)], max_gap=0)
# Gap-slack boundary pin: gap of exactly max_gap merges, max_gap+1 splits.
@example(intervals=[(1, 0, 5), (1, 7, 3), (1, 13, 2)], max_gap=2)
def test_interval_coalesce_matches_naive(spark, intervals, max_gap):
    """Differential vs a naive python sweep-merge over random interval
    sets with inverted spans, duplicates, touching endpoints, degenerate
    points, and sessionization slack."""
    from collections import defaultdict

    from analyzing_big_data_in_scala_spark.operators.asof import interval_coalesce

    rows = [(k, s, s + d) for k, s, d in intervals]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        (r["k"], r["segment_id"], r["seg_start"], r["seg_end"],
         r["seg_len"], r["n_merged"])
        for r in interval_coalesce(df, "k", "s", "e", max_gap=max_gap).collect()
    )

    by_key = defaultdict(list)
    for k, s, e in rows:
        if e >= s:
            by_key[k].append((s, e))
    want = []
    for k, ivs in by_key.items():
        ivs.sort()
        seg_id = 0
        cur_s = cur_e = None
        n = 0
        for s, e in ivs:
            if cur_s is None or s > cur_e + max_gap:
                if cur_s is not None:
                    want.append((k, seg_id, cur_s, cur_e, cur_e - cur_s, n))
                seg_id += 1
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        if cur_s is not None:
            want.append((k, seg_id, cur_s, cur_e, cur_e - cur_s, n))
    assert got == sorted(want)


EVENT_SERIES = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                 # group
        st.integers(min_value=0, max_value=2),       # series (user)
        st.integers(min_value=0, max_value=500),     # offset seconds
        st.integers(min_value=-9999, max_value=9999),  # value in cents (signed)
    ),
    min_size=2,
    max_size=16,
)


TREND_POINTS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                   # group
        st.integers(min_value=0, max_value=50000),     # seconds offset
        st.integers(min_value=-9999, max_value=9999),  # value in cents (signed)
    ),
    min_size=1,
    max_size=16,
)


@PROP_SETTINGS
@given(points=TREND_POINTS)
# Zero-time-variance pin: all observations of a group at one second ->
# slope/corr NULL, not a division blowup.
@example(points=[("a", 7, 100), ("a", 7, -300)])
def test_grouped_trend_matches_python_fold(spark, points):
    """Differential vs an exact python fold: integer sufficient statistics
    are computed exactly in python, then the SAME IEEE double expression
    tree as SLOPE_PPM_SQL/CORR_PPM_SQL — signed values included."""
    import math
    from collections import defaultdict
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.sequence import grouped_trend

    base = 1_700_000_000

    def ts(sec):
        return datetime.fromtimestamp(base + sec, tz=timezone.utc).replace(tzinfo=None)

    df = spark.createDataFrame(
        [(i, g, 1, ts(o), c / 100.0) for i, (g, o, c) in enumerate(points)],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_type"]: (r["n"], r["slope_ppm"], r["corr_ppm"])
        for r in grouped_trend(df).collect()
    }

    pergroup = defaultdict(list)
    for g, o, c in points:
        pergroup[g].append((o, c))
    want = {}
    for g, pts in pergroup.items():
        t0 = min(o for o, _ in pts)
        xs = [(o - t0) // 60 for o, _ in pts]
        ys = [c for _, c in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        den_s = float(n) * float(sxx) - float(sx) * float(sx)
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den_y = float(n) * float(syy) - float(sy) * float(sy)
        slope = round(1e6 * num / den_s) if den_s > 0 else None
        corr = (
            round(1e6 * num / (math.sqrt(den_s) * math.sqrt(den_y)))
            if den_s > 0 and den_y > 0
            else None
        )
        want[g] = (n, slope, corr)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        for i in (1, 2):
            if want[g][i] is None:
                assert got[g][i] is None
            else:
                # python round() is banker's vs Spark ROUND half-up: allow
                # the half-boundary ulp only.
                assert abs(got[g][i] - want[g][i]) <= 1


@PROP_SETTINGS
@given(rows=EVENT_SERIES)
# Duplicate-timestamp pin: two observations at the same second in one
# series — the event_id tie-break orders them, the first gets a 0-width
# segment (weight 0), and the fold below must agree exactly.
@example(rows=[("a", 0, 100, 1000), ("a", 0, 100, 2000), ("a", 0, 200, 3000)])
# Zero-total-span pin (found by this property's first run): a group whose
# only segments are 0-width (all observations share one timestamp) must
# emit twa_e4 = NULL — the unguarded integer division THREW under ANSI.
@example(rows=[("a", 0, 100, 1000), ("a", 0, 100, 2000)])
# Negative-numerator half pin (r9 ADVICE): -5 cents held 3 s -> numerator
# -2997 over divisor 6 = -499.5; the flooring fold (and DuckDB's //) give
# -500 while Spark's bare truncating DIV gave -499 — the sign-safe floor
# correction in time_weighted_avg must match the fold. (Verified: this
# example FAILS with the correction reverted.)
@example(rows=[("a", 0, 0, -5), ("a", 0, 3, 0)])
def test_time_weighted_avg_matches_python_fold(spark, rows):
    """Differential vs an exact-integer python fold of the LOCF weighting
    (per-(group, series) sort by (ts, event_id), gap-weighted sum)."""
    from collections import defaultdict
    from datetime import datetime, timezone

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        time_weighted_avg,
    )

    base = 1_700_000_000

    def ts(sec):
        return datetime.fromtimestamp(base + sec, tz=timezone.utc).replace(tzinfo=None)

    df = spark.createDataFrame(
        [(i, g, u, ts(o), c / 100.0) for i, (g, u, o, c) in enumerate(rows)],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_type"]: (r["n_segments"], r["total_span_sec"], r["twa_e4"])
        for r in time_weighted_avg(df).collect()
    }

    series = defaultdict(list)
    for i, (g, u, o, c) in enumerate(rows):
        series[(g, u)].append((o, i, c))
    num = defaultdict(int)
    den = defaultdict(int)
    nseg = defaultdict(int)
    for (g, _u), obs in series.items():
        obs.sort()
        for (o1, _i1, c1), (o2, _i2, _c2) in zip(obs, obs[1:]):
            gap = o2 - o1
            num[g] += c1 * gap
            den[g] += gap
            nseg[g] += 1
    # zero total span (all duplicate timestamps) -> twa is NULL, not a
    # DIV-by-zero crash (the property run caught the unguarded ANSI throw)
    want = {
        g: (
            nseg[g],
            den[g],
            (num[g] * 200 + den[g]) // (2 * den[g]) if den[g] > 0 else None,
        )
        for g in den
        if nseg[g] > 0
    }
    # groups whose every series has a single observation produce no rows
    assert got == want
