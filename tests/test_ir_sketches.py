"""Unit tests for the round-3 breadth operators: BM25 ranked retrieval,
count-min heavy hitters, JL random projection, k-means Lloyd."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.operators.bm25 import bm25_scores, bm25_topk
from analyzing_big_data_in_scala_spark.operators.projection import (
    jl_sign,
    random_projection,
    sign_matrix,
)
from analyzing_big_data_in_scala_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def test_bm25_ranks_tf_and_rarity(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark filler filler filler"),   # query term twice
            (2, "spark filler filler filler filler"),  # once, same length
            (3, "common filler filler filler filler"), # common term only
            (4, "common words here and nothing else"),
            (5, "common things appear here often too"),
            (6, "plain words with no query hits"),
        ],
        "doc_id long, text string",
    )
    res = {r.doc_id: r for r in bm25_scores(docs, ["spark", "common"]).collect()}
    # higher tf -> higher score at equal length
    assert res[1].score_ppm > res[2].score_ppm
    # 'spark' (df=2) outweighs 'common' (df=3) at equal tf and length
    assert res[2].score_ppm > res[3].score_ppm
    # non-matching doc absent
    assert set(res) == {1, 2, 3, 4, 5}

    top = bm25_topk(docs, ["spark", "common"], k=3).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    scores = [r.score_ppm for r in top]
    assert scores == sorted(scores, reverse=True)

    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])


def test_bm25_matches_textbook_formula(spark):
    # One-doc-at-a-time check against a plain-Python BM25 with the same
    # (Lucene-variant) idf — the Spark plan must reproduce it per term.
    corpus = {
        1: "a b c a",
        2: "a d d e",
        3: "f g h i",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: r.score_ppm for r in bm25_scores(docs, ["a", "d"]).collect()}

    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in ("a", "d")}

    def half_up(x):
        return math.floor(x + 0.5)  # Spark/DuckDB ROUND for positive x

    def contrib(t, d):
        tf = toks[d].count(t)
        if not tf:
            return 0
        # Two-stage quantization mirroring BM25_IDF_E6_SQL + BM25_CONTRIB_SQL
        idf_e6 = half_up(math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) * 1e6)
        k1, b = 1.2, 0.75
        w = (tf * (1.0 + k1)) / (tf + k1 * (1.0 - b + b * (len(toks[d]) / avgdl)))
        return half_up(idf_e6 * w)

    for d in (1, 2):
        assert got[d] == contrib("a", d) + contrib("d", d), d
    assert 3 not in got


def test_cms_estimates_never_undercount(spark):
    keys = spark.createDataFrame(
        [(w,) for w in ("x " * 50 + "y " * 20 + "z " * 5).split()], "term string"
    )
    sketch = cms_build(keys)
    assert sketch.count() <= 4 * 256
    probes = keys.distinct()
    est = {r.term: r.cms_est for r in cms_estimate(sketch, probes).collect()}
    exact = {"x": 50, "y": 20, "z": 5}
    for t, c in exact.items():
        assert est[t] >= c, t

    hh = {r.term: r for r in cms_heavy_hitters(keys, k=2).collect()}
    assert set(hh) == {"x", "y"}
    for r in hh.values():
        assert r.overcount >= 0
        assert r.cms_est == r.exact_cnt + r.overcount


def test_cms_estimate_absent_probe_returns_zero_or_collision(spark):
    """A probe key never inserted into the sketch must still appear in the
    output (left join from probe cells, ADVICE r3): its estimate is 0 when
    any of its depth cells is empty, or a small collision overcount —
    never a dropped row."""
    keys = spark.createDataFrame([("x",), ("x",), ("y",)], "term string")
    sketch = cms_build(keys)
    probes = spark.createDataFrame(
        [("x",), ("never_seen_key",), ("another_missing",)], "term string"
    )
    est = {r.term: r.cms_est for r in cms_estimate(sketch, probes).collect()}
    assert set(est) == {"x", "never_seen_key", "another_missing"}
    assert est["x"] >= 2
    # With only 2 distinct inserted keys across 4x256 cells, an absent
    # probe colliding on ALL 4 rows is impossible here: estimate is 0.
    assert est["never_seen_key"] == 0
    assert est["another_missing"] == 0


def test_random_projection_matches_numpy(spark):
    import numpy as np

    vecs = {
        0: [1.0, -2.0, 3.0, 0.5] * 4,
        1: [0.0] * 16,
        2: [127.0, -127.0] * 8,
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    out = random_projection(emb, out_dim=4, in_dim=16)
    got = {(r.vec_id, r.dim_idx): r.value for r in out.collect()}
    assert len(got) == 3 * 4

    S = np.array(sign_matrix(4, 16))
    for i, v in vecs.items():
        a = np.array(v, dtype=np.float64)
        amax = np.abs(a).max()
        q = np.floor(a / (amax / 127.0) + 0.5) if amax else np.zeros_like(a)
        want = S @ q
        for k in range(4):
            assert got[(i, k)] == int(want[k]), (i, k)


def test_jl_sign_deterministic_and_balanced():
    m = sign_matrix(16, 64)
    flat = [s for row in m for s in row]
    assert set(flat) <= {-1, 1}
    # deterministic pure function
    assert jl_sign(3, 7) == jl_sign(3, 7)
    assert m == sign_matrix(16, 64)
    # roughly balanced (md5 bits): a wildly skewed matrix would break JL
    pos = sum(1 for s in flat if s == 1)
    assert 0.35 * len(flat) < pos < 0.65 * len(flat)


def test_kmeans_lloyd_assignments_and_empty_cluster(spark):
    from analyzing_big_data_in_scala_spark.operators.kmeans import (
        hash_seed_centroids,
        kmeans_lloyd_assign,
    )

    # Two tight groups on orthogonal axes + one lone outlier. ids are
    # chosen so the three smallest portable-hash ids (27, 6, 19 — ranked
    # with the same md5 formula as hash_seed_centroids) fall one per
    # group: seeds start inside each natural cluster, so one Lloyd round
    # must produce a perfect grouping. (Lloyd never merges clusters, so
    # two seeds inside one group would legitimately keep it split — the
    # seed placement is part of the fixture, not an accident.)
    vecs = [
        (27, [10.0, 0.0, 0.1, 0.0]),   # group A, seed -> centroid 0
        (1, [9.0, 0.2, 0.0, 0.0]),     # group A
        (2, [11.0, 0.0, 0.0, 0.3]),    # group A
        (6, [0.0, 10.0, 0.0, 0.1]),    # group B, seed -> centroid 1
        (4, [0.3, 9.5, 0.0, 0.0]),     # group B
        (5, [0.0, 11.0, 0.2, 0.0]),    # group B
        (19, [0.0, 0.0, 0.0, -8.0]),   # outlier, seed -> centroid 2
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    seeds = {r.centroid_id for r in hash_seed_centroids(emb, 3).collect()}
    assert seeds == {0, 1, 2}

    got = {r.vec_id: r.centroid_id for r in kmeans_lloyd_assign(emb, k=3, rounds=1).collect()}
    assert set(got) == {27, 1, 2, 6, 4, 5, 19}
    assert got[27] == got[1] == got[2] == 0
    assert got[6] == got[4] == got[5] == 1
    assert got[19] == 2

    # k > distinct vectors in a group forces empty clusters in some round;
    # the operator must still return a full assignment.
    many = {r.vec_id for r in kmeans_lloyd_assign(emb, k=6, rounds=2).collect()}
    assert many == {27, 1, 2, 6, 4, 5, 19}

    import pytest

    with pytest.raises(ValueError, match="bad k"):
        kmeans_lloyd_assign(emb, k=0)


def test_entity_cooccurrence_edges(spark):
    from analyzing_big_data_in_scala_spark.operators.entities import (
        entity_cooccurrence_edges,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark and stream talk to spark again"),   # spark+stream (dups collapse)
            (2, "stream meets spark near the window"),     # spark+stream+window
            (3, "vector only here"),                       # no pair
            (4, "spark alone"),                            # no pair
        ],
        "doc_id long, text string",
    )
    gaz = ("spark", "stream", "window", "vector")
    got = {
        (r.entity_a, r.entity_b): r.n_docs
        for r in entity_cooccurrence_edges(docs, gaz).collect()
    }
    assert got == {
        ("spark", "stream"): 2,
        ("spark", "window"): 1,
        ("stream", "window"): 1,
    }


def test_random_projection_rejects_dim_mismatch(spark):
    import pytest

    emb = spark.createDataFrame(
        [(0, [1.0] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="in_dim=32 but vector has 16"):
        random_projection(emb, out_dim=4, in_dim=32).collect()


def test_projected_topk_finds_duplicate_vector(spark):
    from analyzing_big_data_in_scala_spark.operators.projection import (
        projected_vectors,
    )
    from analyzing_big_data_in_scala_spark.operators.similarity import cosine_topk

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(20)]
    # vector 100 is an exact copy of probe vector 0: identical quantized
    # form -> identical projection -> cosine exactly 1.0 -> guaranteed
    # rank 1 for the probe (self-matches are excluded).
    rows.append((100, list(rows[0][1])))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pv = projected_vectors(emb, out_dim=8, in_dim=16)
    probes = pv.filter("vec_id = 0")
    top = cosine_topk(pv, probes, k=3, vec_col="pvec").collect()
    assert [r.rank for r in top] == [1, 2, 3]
    assert top[0].vec_id == 100 and top[0].cosine == 1.0


def test_rolling_zscore_flags_spike_not_zero_variance(spark):
    import datetime

    import pytest

    from analyzing_big_data_in_scala_spark.operators.anomaly import (
        rolling_zscore_anomalies,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def rows(kind, values):
        return [
            (kind, i + (1000 if kind == "flat" else 0), t0 + datetime.timedelta(seconds=i), v)
            for i, v in enumerate(values)
        ]

    # "varied": alternating baseline with one huge spike after a full
    # window -> the spike must be the ONLY flag. "flat": constant values
    # then a spike — trailing variance is ZERO, so nothing may be flagged
    # (z undefined, filtered, not inf/NaN).
    varied = rows("varied", [10.0, 12.0] * 30 + [100.0] + [10.0, 12.0] * 5)
    flat = rows("flat", [10.0] * 60 + [100.0])
    ev = spark.createDataFrame(
        varied + flat, "event_type string, event_id long, ts timestamp, value double"
    )
    got = rolling_zscore_anomalies(ev, window=50).collect()
    assert [(r.event_type, r.event_id) for r in got] == [("varied", 60)]
    assert got[0].value_e4 == 1000000
    assert got[0].z > 3.0

    with pytest.raises(ValueError, match="window >= 2"):
        rolling_zscore_anomalies(ev, window=1)


def test_association_rules_hand_computed(spark):
    import pytest

    from analyzing_big_data_in_scala_spark.operators.association import (
        association_rules,
    )

    # 4 baskets: {x,y}, {x,y}, {x,z}, {y}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "b", "i", min_support=2).collect()
    }
    # only (x,y)/(y,x) co-occur in >= 2 baskets; duplicates in a basket
    # must NOT inflate counts (basket 2 lists y twice)
    assert set(got) == {("x", "y"), ("y", "x")}
    xy = got[("x", "y")]
    assert (xy.n_both, xy.n_ante, xy.n_cons) == (2, 3, 3)
    # confidence = 2/3 -> 666667 ppm (round half up); lift = 2*4/(3*3) = 8/9
    assert xy.confidence_ppm == 666667
    assert xy.lift_ppm == 888889
    yx = got[("y", "x")]
    assert (yx.n_both, yx.n_ante, yx.n_cons) == (2, 3, 3)

    with pytest.raises(ValueError, match="min_support"):
        association_rules(df, "b", "i", min_support=0)


def test_rrf_fuse_hand_computed(spark):
    from analyzing_big_data_in_scala_spark.operators.fusion import rrf_fuse

    # list A ranks docs 1,2,3; list B ranks docs 2,3,4. RRF k=60:
    # doc2: 1e9//62 + 1e9//61 = 16129032 + 16393442 = 32522474  (top)
    # doc3: 1e9//63 + 1e9//62 = 15873015 + 16129032 = 32002047
    # doc1: 1e9//61 = 16393442 ; doc4: 1e9//63 = 15873015
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], "doc_id long, rank int")
    out = rrf_fuse([("a", a), ("b", b)], rrf_k=60, k=10).collect()
    assert [r.doc_id for r in out] == [2, 3, 1, 4]
    assert [r.rrf_e9 for r in out] == [32522474, 32002047, 16393442, 15873015]
    by_id = {r.doc_id: r for r in out}
    # absent-side ranks stay NULL
    assert by_id[1].b_rank is None and by_id[4].a_rank is None
    assert by_id[2].a_rank == 2 and by_id[2].b_rank == 1

    with pytest.raises(ValueError, match="two ranked lists"):
        rrf_fuse([("a", a)])


def test_hybrid_rrf_excludes_probe_and_fuses(spark):
    from analyzing_big_data_in_scala_spark.operators.fusion import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark"),      # probe doc: must never appear
            (1, "spark window merge"),
            (2, "spark filler filler"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),   # closest to probe
            (2, [0.0, 1.0]),   # orthogonal
            (3, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_rrf_topk(docs, emb, ["spark", "merge"], probe_vec_id=0, k_each=3, k=10)
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert 0 not in ids
    by_id = {r.doc_id: r for r in rows}
    # doc1 matches both retrievers hard: bm25 rank 1 (2 terms) + dense rank 1
    assert by_id[1].bm25_rank == 1 and by_id[1].dense_rank == 1
    assert rows[0].doc_id == 1 and rows[0].rank == 1
    # doc3 has no query term -> NULL bm25 rank, but still ranked densely
    assert by_id[3].bm25_rank is None and by_id[3].dense_rank is not None
    # fused score = sum of the two integer weights
    for r in rows:
        w = (1_000_000_000 // (60 + r.bm25_rank) if r.bm25_rank else 0) + (
            1_000_000_000 // (60 + r.dense_rank) if r.dense_rank else 0
        )
        assert r.rrf_e9 == w


def test_markov_transitions_hand_computed(spark):
    from datetime import datetime

    from analyzing_big_data_in_scala_spark.operators.sequence import (
        markov_transitions,
    )

    t = datetime(2024, 1, 1)
    rows = [
        # user 1: A B A B ; user 2: A A
        (1, t, 1, "A"), (2, t, 1, "B"), (3, t, 1, "A"), (4, t, 1, "B"),
        (5, t, 2, "A"), (6, t, 2, "A"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): r for r in markov_transitions(ev).collect()
    }
    # transitions: u1 A->B, B->A, A->B ; u2 A->A
    assert set(got) == {("A", "B"), ("B", "A"), ("A", "A")}
    assert got[("A", "B")].n_transitions == 2
    # P(B|A) = 2/3 -> 666667 ppm (round half up), P(A|A) = 1/3 -> 333333
    assert got[("A", "B")].prob_ppm == 666667
    assert got[("A", "A")].prob_ppm == 333333
    assert got[("B", "A")].prob_ppm == 1000000
    # equal timestamps fall back to event_id order (total order within key)
    # -> the result above is only correct under that tie-break


def test_hll_daily_rollup_exact_columns_and_bound(spark):
    from datetime import datetime

    from analyzing_big_data_in_scala_spark.operators.sketches import (
        hll_daily_rollup,
    )

    d1, d2 = datetime(2024, 1, 1, 10), datetime(2024, 1, 2, 10)
    rows = [
        # type A: users 1,2 on day1; users 2,3 on day2 -> 3 distinct, 2 days
        (1, d1, 1, "A"), (2, d1, 2, "A"), (3, d2, 2, "A"), (4, d2, 3, "A"),
        # type B: user 9 on day1 only
        (5, d1, 9, "B"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.event_type: r for r in hll_daily_rollup(ev).collect()}
    assert (got["A"].exact_users, got["A"].n_days) == (3, 2)
    assert (got["B"].exact_users, got["B"].n_days) == (1, 1)
    # the merged-union estimate must meet the 5% contract (tiny counts:
    # HLL sparse mode is exact, so the dedup across days is the real test
    # — user 2 appears in BOTH day sketches and must count once)
    assert got["A"].hll_merge_ok == 1 and got["B"].hll_merge_ok == 1


def test_mad_outliers_hand_computed(spark):
    from analyzing_big_data_in_scala_spark.operators.anomaly import mad_outliers

    # series A: values 1..5 plus one gross outlier 100.
    # ve4 = 10000..50000, 1000000; median = (30000+40000)/2 = 35000 -> 3.5
    # deviations |v-med| e4: 25000,15000,5000,5000,15000,965000
    # MAD = median = (15000+15000)/2 = 15000 -> 1.5
    # threshold = 4.4478 * 30000 (in d2 units) = 133434; only the gross
    # outlier's d2 = 1930000 exceeds it.
    rows = [(i, float(v), "A") for i, v in enumerate([1, 2, 3, 4, 5, 100])]
    ev = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    got = {r.event_type: r for r in mad_outliers(ev).collect()}
    a = got["A"]
    assert a.n == 6
    assert a.median_value == 3.5
    assert a.mad_value == 1.5
    assert a.n_outliers == 1


def test_retrieval_label_eval_hand_computed(spark):
    from analyzing_big_data_in_scala_spark.operators.fusion import (
        retrieval_label_eval,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark spark"),              # probe doc (excluded)
            (1, "spark merge window"),       # bm25 rank 1; relevant
            (2, "spark filler"),             # bm25 rank 2; NOT relevant
            (3, "no match terms at all"),    # dense-only candidate; relevant
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.9, 0.1], 7),   # dense rank 1, shares label 7
            (2, [0.5, 0.5], 5),   # dense rank 2
            (3, [0.1, 0.9], 7),   # dense rank 3, shares label 7
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r.retriever: r
        for r in retrieval_label_eval(
            docs, emb, ["spark", "merge"], probe_vec_id=0, k=3, k_each=3
        ).collect()
    }
    # relevant set = {1, 3} (label 7, probe excluded) -> tot = 2
    # bm25 list: [1, 2] -> hits {1}: n=1, first=1, recall 1/2
    b = got["bm25"]
    assert (b.n_rel_at_k, b.mrr_e6, b.recall_ppm) == (1, 1_000_000, 500_000)
    # dense list: [1, 2, 3] -> hits {1, 3}: n=2, first=1, recall 1
    d = got["dense"]
    assert (d.n_rel_at_k, d.mrr_e6, d.recall_ppm) == (2, 1_000_000, 1_000_000)
    # rrf fuses both -> 1 ranks first (both lists), 3 present via dense
    r = got["rrf"]
    assert r.n_rel_at_k == 2 and r.mrr_e6 == 1_000_000 and r.recall_ppm == 1_000_000


def test_kll_value_rollup_merge_and_quantile_bounds(spark):
    from datetime import datetime

    from analyzing_big_data_in_scala_spark.operators.sketches import kll_value_rollup

    d1, d2 = datetime(2024, 1, 1, 10), datetime(2024, 1, 2, 10)
    # type A: values 0..199 split across two days -> merged sketch must see
    # all 200 exactly once (n_match) and hit the quantiles of the WHOLE
    # stream, not of either day (day1 holds the low half, day2 the high).
    rows = [(i, d1 if i < 100 else d2, 1, "A", float(i)) for i in range(200)]
    rows += [(1000 + i, d1, 1, "B", 42.0) for i in range(10)]  # constant group
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.event_type: r for r in kll_value_rollup(ev).collect()}
    assert got["A"].n_events == 200 and got["A"].n_match == 1
    assert (got["A"].p50_rank_ok, got["A"].p95_rank_ok, got["A"].p99_rank_ok) == (1, 1, 1)
    # all-equal group: every quantile is 42.0, bounds degenerate to a point
    assert (got["B"].n_match, got["B"].p50_rank_ok, got["B"].p99_rank_ok) == (1, 1, 1)


def test_theta_audience_overlap_hand_computed(spark):
    from datetime import datetime

    from analyzing_big_data_in_scala_spark.operators.sketches import (
        theta_audience_overlap,
    )

    d = datetime(2024, 1, 1, 10)
    # A users {1,2,3}, B users {2,3,4,5}, C users {9} ->
    # A∩B=2, A∪B=5; A∩C=0, A∪C=4; B∩C=0, B∪C=5. Zero-overlap pairs must
    # still appear (C shares nobody).
    rows = [(1, d, 1, "A"), (2, d, 2, "A"), (3, d, 3, "A"),
            (4, d, 2, "B"), (5, d, 3, "B"), (6, d, 4, "B"), (7, d, 5, "B"),
            (8, d, 9, "C"), (9, d, 9, "C")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r.type_a, r.type_b): r for r in theta_audience_overlap(ev).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert (got[("A", "B")].exact_overlap, got[("A", "B")].exact_union) == (2, 5)
    assert (got[("A", "C")].exact_overlap, got[("A", "C")].exact_union) == (0, 4)
    assert (got[("B", "C")].exact_overlap, got[("B", "C")].exact_union) == (0, 5)
    for r in got.values():
        assert r.overlap_ok == 1 and r.union_ok == 1  # exact-mode sketches


def test_ewma_smooth_matches_python_and_is_exact(spark):
    from datetime import datetime, timedelta

    from analyzing_big_data_in_scala_spark.operators.anomaly import (
        EWMA_COEFS,
        EWMA_DEN,
        EWMA_WINDOW,
        ewma_smooth,
    )

    t0 = datetime(2024, 1, 1)
    # series A: a ramp crossing zero (negative values exercise the
    # offset-shifted division); series B: constant -> ewma == value.
    vals = [float(i - 10) for i in range(30)]
    rows = [(i, t0 + timedelta(seconds=i), 1, "A", vals[i]) for i in range(30)]
    rows += [(100 + i, t0 + timedelta(seconds=i), 1, "B", 7.5) for i in range(20)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r.event_type, r.event_id): r.ewma_e4 for r in ewma_smooth(ev).collect()}
    # full windows only: A emits ids 15..29, B ids 115..119
    assert len(got) == 15 + 5

    def py_ewma(xs):  # round-half-up of the exact integer weighted mean
        num = sum(c * x for c, x in zip(EWMA_COEFS, xs))
        return (num * 2 + EWMA_DEN) // (2 * EWMA_DEN)

    for t in range(EWMA_WINDOW - 1, 30):
        xs = [round(vals[t - j] * 10000) for j in range(EWMA_WINDOW)]
        assert got[("A", t)] == py_ewma(xs), t
    assert all(got[("B", 100 + i)] == 75000 for i in range(15, 20))


def test_theta_join_key_profile_hand_computed(spark):
    from pyspark.sql import functions as F

    from analyzing_big_data_in_scala_spark.operators.sketches import (
        theta_join_key_profile,
    )

    left = spark.range(100).select(F.col("id").alias("k"))          # keys 0..99
    right = spark.range(50, 200).select((F.col("id")).alias("j"))   # keys 50..199
    r = theta_join_key_profile(left, "k", right, "j").collect()[0]
    assert (r.left_keys, r.right_keys, r.exact_shared, r.shared_ok) == (100, 150, 50, 1)


def test_theta_join_key_profile_disjoint_sides(spark):
    from pyspark.sql import functions as F

    from analyzing_big_data_in_scala_spark.operators.sketches import (
        theta_join_key_profile,
    )

    left = spark.range(40).select(F.col("id").alias("k"))
    right = spark.range(1000, 1040).select(F.col("id").alias("k"))
    r = theta_join_key_profile(left, "k", right, "k").collect()[0]
    assert (r.exact_shared, r.shared_ok) == (0, 1)  # slack floor of 1 covers est 0
