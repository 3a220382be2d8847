"""BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene-default
scoring variant) — the modern counterpart of the reference's TF-IDF cosine
search engine (ScalaNotebooks/MovieSearchEngine.scala:111-308), expressed
as one Catalyst plan.

Scale shape mirrors `operators/tfidf.py`: the only corpus-wide work is one
tokenize + two hash aggregates (per-doc length, per-(doc, query-term) tf —
the latter filtered to the query's terms BEFORE the shuffle, so its volume
tracks matching docs, not the corpus). Corpus size N, average doc length,
and per-term document frequencies are in-plan 1-row / vocabulary-sized
broadcasts; nothing is collected to the driver; top-k materializes as
TakeOrderedAndProject, never a global sort.

Cross-engine determinism (two-stage quantization, ADVICE r3): IEEE-754
requires +, -, *, / (and sqrt) to be CORRECTLY ROUNDED — identical bits on
identical inputs on every conforming engine — but ln() is NOT a
correctly-rounded operation, so JVM `Math.log` and DuckDB's libm may
differ in the last ulp for some inputs, and a ulp landing on a
ROUND(x*1e6) half-boundary would flip an output integer. The recipe below
confines ln to ONE site per query term: `BM25_IDF_E6_SQL` quantizes the
idf to an integer (idf_e6) immediately after the ln, per TERM, and
`BM25_CONTRIB_SQL` then computes the per-(doc, term) contribution from
(idf_e6, tf, dl, avgdl) using only correctly-rounded double ops — so the
residual cross-engine risk is ~|query terms| rounding sites (each ~1e-10
half-boundary probability), not one per (doc, term) row, and everything
downstream of those few sites is bit-identical by IEEE guarantee. The
contribution is an integer ppm PER TERM before the per-doc sum, which
makes the final scores order-independent exact integers (float summation
order can never flip a rank or a hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import single_partition_key
from .tfidf import token_table

# Shared Spark/DuckDB expression: Lucene-variant idf quantized to an
# integer e6 scale — the ONLY ln() site (see module docstring). df and
# n_docs are per-term / corpus integer columns.
BM25_IDF_E6_SQL = (
    "CAST(ROUND("
    "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    " * 1000000.0) AS BIGINT)"
)

# Shared Spark/DuckDB expression: BM25 term contribution in ppm, as a
# BIGINT, from the pre-quantized idf_e6. Placeholders: k1, b are float
# literals; tf/dl are per-row integer columns; avgdl (exact DOUBLE ratio of
# two BIGINTs) comes from the broadcast corpus-stats row. Only +,*,/ on
# doubles — correctly rounded, bit-identical cross-engine.
BM25_CONTRIB_SQL = (
    "CAST(ROUND("
    "CAST(idf_e6 AS DOUBLE)"
    " * ((CAST(tf AS DOUBLE) * (1.0 + {k1}))"
    "    / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b} * (CAST(dl AS DOUBLE) / avgdl))))"
    ") AS BIGINT)"
)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_matched, score_ppm) for every document matching at least
    one query term. score_ppm = Σ_term round(1e6 · BM25(term, doc)) —
    integer-exact, so ordering and cross-engine hashes are deterministic."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    tok = token_table(docs, id_col, text_col)
    dl = tok.groupBy(id_col).agg(F.count("*").alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(*[t.lower() for t in query_terms]))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(id_col).alias("df"))
    # N counts ALL docs (empty ones included); avgdl = total tokens / N —
    # a ratio of two exact BIGINTs, so the double is engine-identical.
    n_row = docs.agg(F.count("*").alias("n_docs"))
    tot_row = dl.agg(F.sum("dl").alias("_tot"))
    stats = n_row.crossJoin(tot_row).select(
        "n_docs", (F.col("_tot").cast("double") / F.col("n_docs")).alias("avgdl")
    )
    # idf quantized per TERM (the only ln site — module docstring); the
    # idf table is |query terms| rows, always broadcast.
    idf_t = (
        df_t.crossJoin(F.broadcast(n_row))
        .select("term", F.expr(BM25_IDF_E6_SQL).alias("idf_e6"))
    )
    contrib = BM25_CONTRIB_SQL.format(k1=k1, b=b)
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(idf_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, F.expr(contrib).alias("c_ppm"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_matched"), F.sum("c_ppm").alias("score_ppm")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 results with a deterministic dense ranking:
    (id_col, n_matched, score_ppm, rank). Ties break on ascending id, so
    the k-row cut is unambiguous on any engine. The global ordering
    compiles to TakeOrderedAndProject (limit pushed into the sort); the
    row_number window then runs over k rows only."""
    scored = bm25_scores(docs, query_terms, k1, b, id_col, text_col)
    top = scored.orderBy(F.desc("score_ppm"), F.asc(id_col)).limit(k)
    # k-row frame post-limit: the constant partition key only silences
    # WindowExec's no-partition warning (r9; see _util.single_partition_key).
    w = Window.partitionBy(single_partition_key(id_col)).orderBy(
        F.desc("score_ppm"), F.asc(id_col)
    )
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
