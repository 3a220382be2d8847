"""Unit tests for the round-3 breadth operators: BM25 ranked retrieval,
count-min heavy hitters, JL random projection."""

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

    def contrib(t, d):
        tf = toks[d].count(t)
        if not tf:
            return 0
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        k1, b = 1.2, 0.75
        s = idf * (tf * (1.0 + k1)) / (tf + k1 * (1.0 - b + b * (len(toks[d]) / avgdl)))
        return round(s * 1e6)

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
