"""TF-IDF document search engine (SURVEY.md §2.11 items 1-6).

The reference computes TF-IDF with a Catalyst-opaque RDD pipeline
(ScalaNotebooks/MovieSearchEngine.scala:111-187: rdd.flatMap ->
reduceByKey x2 -> pair join) and re-runs the uncached plan per search term
from a driver loop (:239-308). Here the whole thing is DataFrames:
tokenize -> explode -> two hash aggregations -> broadcast joins, one
Catalyst plan end-to-end, whole-stage-codegen'd, AQE-coalesced.

Scale posture: the only wide exchanges are groupBy(doc, term) and
groupBy(term) — both map-side-combined. idf and the query vector are tiny
(vocabulary-sized / query-sized) and always broadcast; nothing is collected
to the driver.

Quirk Q1 (SURVEY.md §2.11.6): the reference's "cosine" divides the dot
product by Σw² (no sqrt) on both sides (MovieSearchEngine.scala:232,291-304).
`reference_semantics=True` reproduces that; default is true cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def token_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, token occurrence). The shared entry point for every
    tokenize-then-aggregate operator (TF-IDF, word counts, token stats).
    Tokenization is cheap regex work — no repartition; the downstream
    groupBy shuffle already restores parallelism."""
    return docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """TF per (doc, term): MovieSearchEngine.scala:111-135 re-expressed as
    explode + groupBy (A7 -> A1). Returns (id_col, term, tf)."""
    return (
        token_table(docs, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """DF per term: number of docs containing the term
    (MovieSearchEngine.scala:140-151; distinct by construction after TF —
    SURVEY.md A9). Returns (term, df)."""
    return tf.groupBy("term").agg(F.count(id_col).alias("df"))


def inverse_doc_frequencies(df_per_term: DataFrame, n_docs: int) -> DataFrame:
    """IDF = ln(N/df) (natural log, MovieSearchEngine.scala:156-163).
    Returns (term, idf)."""
    return df_per_term.select("term", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))


def tfidf_matrix(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """TF-IDF = tf * idf via join (MovieSearchEngine.scala:168-187).
    Returns (id_col, term, tf, idf, tfidf). The idf side is
    vocabulary-sized -> broadcast."""
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.count()
    idf = inverse_doc_frequencies(doc_frequencies(tf, id_col), n_docs)
    return tf.join(F.broadcast(idf), "term").select(
        id_col, "term", "tf", "idf", (F.col("tf") * F.col("idf")).alias("tfidf")
    )


def doc_norms(tfidf: DataFrame, id_col: str = "doc_id", reference_semantics: bool = False) -> DataFrame:
    """Per-doc norm. True mode: sqrt(Σ tfidf²). Reference mode (Q1): Σ tfidf²
    without sqrt (MovieSearchEngine.scala:232). Returns (id_col, norm)."""
    ss = F.sum(F.col("tfidf") * F.col("tfidf"))
    norm = ss if reference_semantics else F.sqrt(ss)
    return tfidf.groupBy(id_col).agg(norm.alias("norm"))


def search_single_term(
    tfidf: DataFrame, term: str, id_col: str = "doc_id", top_k: int = 10
) -> DataFrame:
    """Single-word search: filter term, rank by tfidf desc
    (MovieSearchEngine.scala:237-257). Deterministic tiebreak on id."""
    return (
        tfidf.filter(F.col("term") == term)
        .select(id_col, F.round("tfidf", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def search_query(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
    reference_semantics: bool = False,
) -> DataFrame:
    """Multi-word search (MovieSearchEngine.scala:263-308), one Catalyst plan.

    Builds the query's own tf-idf vector (:277-288), the query norm
    (:291-294), the per-doc dot product (:297-300), and the similarity
    ranking (:303-308). True-cosine by default; Q1 quirk under
    `reference_semantics`. Returns (id_col, score) top-k.
    """
    spark = docs.sparkSession
    # tf feeds both idf and the matrix; tfidf feeds both dots and norms.
    # No .cache() needed: the subplans are identical, so Catalyst's
    # ReuseExchange serves every consumer from one shuffle write — caching
    # here measured SLOWER (extra materialization + memory-format copy).
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.count()
    idf = inverse_doc_frequencies(doc_frequencies(tf, id_col), n_docs)
    tfidf = tf.join(F.broadcast(idf), "term").select(
        id_col, "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )

    qterms = spark.createDataFrame([(t,) for t in query_terms], "term string")
    qtf = qterms.groupBy("term").agg(F.count("*").alias("qtf"))
    qvec = qtf.join(idf, "term").select("term", (F.col("qtf") * F.col("idf")).alias("qw"))

    q_ss = qvec.agg(F.sum(F.col("qw") * F.col("qw")).alias("ss")).first()["ss"] or 0.0
    q_norm = q_ss if reference_semantics else q_ss**0.5

    dots = (
        tfidf.join(F.broadcast(qvec), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tfidf") * F.col("qw")).alias("dot"))
    )
    norms = doc_norms(tfidf, id_col, reference_semantics)
    return (
        dots.join(norms, id_col)
        .select(id_col, F.round(F.col("dot") / (F.col("norm") * F.lit(q_norm)), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )
