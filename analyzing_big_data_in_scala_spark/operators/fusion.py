"""Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) for hybrid
retrieval: combine a sparse (BM25) and a dense (embedding-cosine) ranking
into one list — the standard first stage of a modern RAG / retrieval
pipeline, and the natural composition of this repo's `bm25_topk` and
`cosine_topk`.

Scale shape: each retriever produces its own top-k_each list with its own
scale-correct plan (BM25 = tokenize + two hash aggregates +
TakeOrderedAndProject, `operators/bm25.py`; dense = brute-force or ANN
top-k, `operators/similarity.py`). Fusion then operates on two <= k_each
row frames — a broadcast full-outer join and a k-row sort, independent of
corpus size. At 100 TB the retrievers are the work; fusion is free.

Cross-engine determinism: RRF weight 1/(rrf_k + rank) is computed as the
INTEGER division 1e9 DIV (rrf_k + rank) — "rrf_e9" — so each contribution
is an exact BIGINT and the fused score a sum of <= 2 BIGINTs: no float
summation anywhere, ordering and value hashes are engine-independent.
Ties break on ascending document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared Spark/DuckDB integer RRF weight: {rank} is an integer rank column
# (1-based), {k} the RRF smoothing constant. DIV/// is exact integer
# division in both engines.
RRF_E9_SPARK = "CAST(1000000000 DIV ({k} + {rank}) AS BIGINT)"
RRF_E9_DUCK = "CAST(1000000000 // ({k} + {rank}) AS BIGINT)"


def rrf_fuse(
    ranked_lists: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Fuse named (label, DataFrame) ranked lists, each carrying
    (id_col, rank) with rank 1-based, into the RRF top-k:

        (id_col, <label>_rank ... per input, rrf_e9, rank)

    A document absent from one list simply contributes nothing for it
    (full-outer semantics); <label>_rank stays NULL. The fused score is
    an exact BIGINT (see module docstring), ties break on ascending id.

    Inputs are expected to be top-k_each frames (tiny); the joins
    broadcast and the final sort is a k-row TakeOrderedAndProject.
    """
    if len(ranked_lists) < 2:
        raise ValueError("rrf_fuse: need at least two ranked lists")
    fused = None
    for label, df in ranked_lists:
        side = df.select(id_col, F.col("rank").alias(f"{label}_rank"))
        fused = side if fused is None else fused.join(
            F.broadcast(side), id_col, "full_outer"
        )
    score = None
    for label, _ in ranked_lists:
        w = F.expr(RRF_E9_SPARK.format(k=rrf_k, rank=f"{label}_rank"))
        term = F.coalesce(w, F.lit(0).cast("long"))
        score = term if score is None else score + term
    fused = fused.withColumn("rrf_e9", score.cast("long"))
    top = fused.orderBy(F.desc("rrf_e9"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_e9"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    probe_vec_id: int = 0,
    k_each: int = 50,
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 over `docs.text` for
    `query_terms`, cosine over `embeddings` against the stored vector
    `probe_vec_id` (its embedding stands in for the encoded query), fused
    by RRF. The probe's own document is excluded from BOTH sides so the
    two retrievers rank the same candidate universe.

    Output: (doc_id, bm25_rank, dense_rank, rrf_e9, rank).
    """
    from .bm25 import bm25_topk
    from .similarity import cosine_scores

    bm = (
        bm25_topk(
            docs.filter(F.col("doc_id") != probe_vec_id), query_terms, k=k_each
        )
        .select("doc_id", "rank")
    )
    # Rank the dense side by the ROUNDED cosine (6 dp) with an id
    # tie-break: the rounded value is the cross-engine contract (the raw
    # left-to-right fold is already bit-identical, but ranking on the
    # rounded number means even a tie AT the quantization boundary orders
    # identically on every engine).
    scores = (
        cosine_scores(
            embeddings, embeddings.filter(F.col("vec_id") == probe_vec_id)
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
    )
    dn_top = scores.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k_each)
    dw = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    dn = dn_top.withColumn("rank", F.row_number().over(dw).cast("int")).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([("bm25", bm), ("dense", dn)], rrf_k=rrf_k, k=k)
