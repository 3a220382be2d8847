"""Hand-computed TF-IDF micro-fixture tests (FIXTURES.md §3): the 3-doc
corpus where every number is known in closed form, plus the Q1
reference-semantics differential (SURVEY.md §5.5)."""

from __future__ import annotations

import math

import pytest

from analyzing_big_data_in_scala_spark.operators import tfidf as T


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a")], "doc_id long, text string"
    )


def test_term_frequencies(spark, corpus):
    rows = {(r.doc_id, r.term): r.tf for r in T.term_frequencies(corpus).collect()}
    assert rows == {(1, "a"): 1, (1, "b"): 1, (2, "a"): 1, (2, "c"): 1, (3, "a"): 1}


def test_doc_frequencies(spark, corpus):
    rows = {r.term: r.df for r in T.doc_frequencies(T.term_frequencies(corpus)).collect()}
    assert rows == {"a": 3, "b": 1, "c": 1}


def test_idf_natural_log(spark, corpus):
    tf = T.term_frequencies(corpus)
    idf = {r.term: r.idf for r in T.inverse_doc_frequencies(T.doc_frequencies(tf), 3).collect()}
    assert idf["a"] == pytest.approx(math.log(3 / 3))  # = 0
    assert idf["b"] == pytest.approx(math.log(3 / 1))
    assert idf["c"] == pytest.approx(math.log(3 / 1))


def test_tfidf_matrix(spark, corpus):
    m = {(r.doc_id, r.term): r.tfidf for r in T.tfidf_matrix(corpus).collect()}
    assert m[(1, "a")] == pytest.approx(0.0)
    assert m[(1, "b")] == pytest.approx(math.log(3))
    assert m[(2, "c")] == pytest.approx(math.log(3))


def test_single_term_search_ranks_by_tfidf(spark):
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x y"), (3, "y")], "doc_id long, text string"
    )
    top = T.search_single_term(T.tfidf_matrix(docs), "x", top_k=2).collect()
    assert [r.doc_id for r in top] == [1, 2]  # doc 1 has tf=2
    assert top[0].score == pytest.approx(2 * math.log(3 / 2), abs=1e-6)


def test_search_query_true_cosine_identical_doc_scores_1(spark):
    docs = spark.createDataFrame(
        [(1, "p q"), (2, "p r"), (3, "s t")], "doc_id long, text string"
    )
    # Query == doc 1 exactly: true cosine must score doc1 at 1.0.
    res = {r.doc_id: r.score for r in T.search_query(docs, ["p", "q"]).collect()}
    assert res[1] == pytest.approx(1.0)
    assert 1 in res and res[1] == max(res.values())


def test_reference_semantics_differs_from_cosine(spark):
    # Q1 quirk: dot/(Σd²·Σq²) vs dot/(‖d‖‖q‖) — values must differ whenever
    # the norms aren't 1.
    docs = spark.createDataFrame(
        [(1, "p q p"), (2, "p r"), (3, "q r s")], "doc_id long, text string"
    )
    true_cos = {r.doc_id: r.score for r in T.search_query(docs, ["p", "q"]).collect()}
    ref = {
        r.doc_id: r.score
        for r in T.search_query(docs, ["p", "q"], reference_semantics=True).collect()
    }
    common = set(true_cos) & set(ref)
    assert common
    assert any(abs(true_cos[d] - ref[d]) > 1e-9 for d in common)


def test_search_many_matches_search_query(spark):
    docs = spark.createDataFrame(
        [(1, "p q p"), (2, "p r"), (3, "q r s"), (4, "t u")], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(7, "p q")], "query_id int, query string")
    batch = {r.doc_id: r.score for r in T.search_many(docs, qdf).collect()}
    single = {r.doc_id: r.score for r in T.search_query(docs, ["p", "q"]).collect()}
    assert batch == single
