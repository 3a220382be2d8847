"""TF-IDF document search engine (SURVEY.md §2.11 items 1-6).

The reference computes TF-IDF with a Catalyst-opaque RDD pipeline
(ScalaNotebooks/MovieSearchEngine.scala:111-187: rdd.flatMap ->
reduceByKey x2 -> pair join) and re-runs the uncached plan per search term
from a driver loop (:239-308). Here the whole thing is DataFrames:
tokenize -> explode -> two hash aggregations -> broadcast joins, ONE
Catalyst plan end-to-end — even the corpus size N and the query norm are
computed in-plan via single-row broadcast cross joins, so a search is a
single Spark job with no driver round-trips.

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


def _idf_in_plan(docs: DataFrame, tf: DataFrame, id_col: str) -> DataFrame:
    """IDF with the corpus size N computed IN-PLAN: a 1-row count aggregate
    broadcast-cross-joined into the per-term table. No docs.count() action
    on the driver — the whole TF-IDF pipeline stays one lazy plan."""
    n_row = docs.agg(F.count("*").cast("double").alias("_n"))
    return (
        doc_frequencies(tf, id_col)
        .crossJoin(F.broadcast(n_row))
        .select("term", F.log(F.col("_n") / F.col("df")).alias("idf"))
    )


def tfidf_matrix(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """TF-IDF = tf * idf via join (MovieSearchEngine.scala:168-187).
    Returns (id_col, term, tf, idf, tfidf). The idf side is
    vocabulary-sized -> broadcast."""
    tf = term_frequencies(docs, id_col, text_col)
    idf = _idf_in_plan(docs, tf, id_col)
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


def search_many(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
    reference_semantics: bool = False,
) -> DataFrame:
    """Batched multi-query search: ALL queries ranked in ONE Catalyst plan.

    The reference loops over collected search terms on the driver, issuing
    one Spark job per query (MovieSearchEngine.scala:239-308; SURVEY.md
    §3.1 anti-pattern). Here `queries` is a DataFrame (query_id, query);
    query vectors, query norms, dots, and per-query top-k (window
    row_number) are all keyed by query_id inside one plan — N queries cost
    one pass over the corpus, not N.

    Returns (query_id, id_col, score, rank) with rank 1..top_k per query.
    """
    from pyspark.sql import Window

    # No materialization on tf/tfidf — same ReuseExchange rationale as
    # search_query (interleaved A/B re-verified in round 4).
    tf = term_frequencies(docs, id_col, text_col)
    idf = _idf_in_plan(docs, tf, id_col)
    tfidf = tf.join(F.broadcast(idf), "term").select(
        id_col, "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )

    qtok = queries.select("query_id", F.explode(tokens("query")).alias("term"))
    qtf = qtok.groupBy("query_id", "term").agg(F.count("*").alias("qtf"))
    qvec = qtf.join(idf, "term").select(
        "query_id", "term", (F.col("qtf") * F.col("idf")).alias("qw")
    )
    q_ss = F.sum(F.col("qw") * F.col("qw"))
    qnorms = qvec.groupBy("query_id").agg(
        (q_ss if reference_semantics else F.sqrt(q_ss)).alias("qnorm")
    )

    dots = (
        tfidf.join(F.broadcast(qvec), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("tfidf") * F.col("qw")).alias("dot"))
    )
    norms = doc_norms(tfidf, id_col, reference_semantics)
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(qnorms), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(F.try_divide("dot", F.col("norm") * F.col("qnorm")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", id_col, "score", "rank")
    )


def search_query(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
    reference_semantics: bool = False,
) -> DataFrame:
    """Multi-word search (MovieSearchEngine.scala:263-308), one Catalyst plan
    and ONE Spark job.

    Builds the query's own tf-idf vector (:277-288), the query norm
    (:291-294) as a 1-row aggregate broadcast back into the plan, the
    per-doc dot product (:297-300), and the similarity ranking (:303-308).
    True-cosine by default; Q1 quirk under `reference_semantics`.
    Returns (id_col, score) top-k.

    No materialization on the shared tf/tfidf subplans — DELIBERATE, and
    re-verified in round 4: unlike the curation funnel (where pushed-down
    per-consumer filters make the exchange subtrees distinct), every
    consumer here sits ABOVE an identical tf exchange, so ReuseExchange
    genuinely serves them from one shuffle write. Both .cache() (round 1)
    and lazy localCheckpoint (round 4, interleaved A/B: 1.68s vs 1.36s
    median at sf0.1) measured SLOWER than the shared-exchange plan.
    """
    spark = docs.sparkSession
    tf = term_frequencies(docs, id_col, text_col)
    idf = _idf_in_plan(docs, tf, id_col)
    tfidf = tf.join(F.broadcast(idf), "term").select(
        id_col, "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )

    qterms = spark.createDataFrame([(t,) for t in query_terms], "term string")
    qtf = qterms.groupBy("term").agg(F.count("*").alias("qtf"))
    qvec = qtf.join(idf, "term").select("term", (F.col("qtf") * F.col("idf")).alias("qw"))

    # Query norm as a 1-row plan fragment (replaces the .first() round-trip).
    q_ss = F.sum(F.col("qw") * F.col("qw"))
    q_norm_row = qvec.agg(
        (q_ss if reference_semantics else F.sqrt(q_ss)).alias("_qnorm")
    )

    dots = (
        tfidf.join(F.broadcast(qvec), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tfidf") * F.col("qw")).alias("dot"))
    )
    norms = doc_norms(tfidf, id_col, reference_semantics)
    return (
        dots.join(norms, id_col)
        .crossJoin(F.broadcast(q_norm_row))
        # try_divide: zero norms (e.g. every idf = 0 when a term is in all
        # docs of a tiny corpus) yield NULL instead of raising under ANSI
        # mode — the same contract as DuckDB's x/0.0.
        .select(
            id_col,
            F.round(F.try_divide("dot", F.col("norm") * F.col("_qnorm")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Persisted search index (bucketed storage; the repeat-search scale path)
# ---------------------------------------------------------------------------

def build_search_index(
    docs: DataFrame,
    prefix: str = "tfidf_index",
    num_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the search-engine state once as three tables so repeated
    searches (the reference's driver loop re-derives ALL of it per term —
    MovieSearchEngine.scala:239-308) skip tokenization, TF, DF, and IDF
    entirely:

      {prefix}_matrix  (id, term, tfidf)  bucketed by id
      {prefix}_norms   (id, norm)         bucketed by id
      {prefix}_idf     (term, idf)        vocabulary-sized

    Bucketing the matrix and norms by DOC id makes every per-doc stage of
    a search exchange-free: the dot-product groupBy(id), the norm
    groupBy(id) (precomputed here anyway), and the dots-join-norms all
    reuse the bucket partitioning, so a query touches the corpus with zero
    data movement — only the final top-k leaves the executors.
    """
    from ..sources.bucketing import write_bucketed

    mat = tfidf_matrix(docs, id_col, text_col).select(
        F.col(id_col).alias("id"), "term", "tfidf"
    )
    write_bucketed(mat, f"{prefix}_matrix", bucket_col="id", num_buckets=num_buckets)
    spark = docs.sparkSession
    persisted = spark.table(f"{prefix}_matrix")
    write_bucketed(
        doc_norms(persisted, "id"), f"{prefix}_norms", bucket_col="id", num_buckets=num_buckets
    )
    idf = tfidf_matrix(docs, id_col, text_col).select("term", "idf").distinct()
    idf.write.mode("overwrite").saveAsTable(f"{prefix}_idf")


def search_query_indexed(
    spark,
    query_terms: list[str],
    prefix: str = "tfidf_index",
    top_k: int = 10,
) -> DataFrame:
    """Multi-word cosine search against :func:`build_search_index` tables.
    Same contract as :func:`search_query` (returns (id, score) top-k; true
    cosine), but the plan contains NO hash exchange (asserted in tests):
    the query vector is assembled driver-side (the term list is driver
    input already) and broadcast; everything per-doc rides the bucketed
    partitioning.
    """
    from collections import Counter

    tfidf = spark.table(f"{prefix}_matrix")
    idf = spark.table(f"{prefix}_idf")
    norms = spark.table(f"{prefix}_norms")

    qtf = spark.createDataFrame(
        [(t, c) for t, c in Counter(query_terms).items()], "term string, qtf long"
    )
    qvec = F.broadcast(qtf).join(idf, "term").select(
        "term", (F.col("qtf") * F.col("idf")).alias("qw")
    )
    q_norm_row = qvec.agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("_qnorm"))

    dots = (
        tfidf.join(F.broadcast(qvec), "term")
        .groupBy("id")
        .agg(F.sum(F.col("tfidf") * F.col("qw")).alias("dot"))
    )
    return (
        dots.join(norms, "id")
        .crossJoin(F.broadcast(q_norm_row))
        .select(
            "id",
            F.round(F.try_divide("dot", F.col("norm") * F.col("_qnorm")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )
