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

from ._util import single_partition_key

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
        # No broadcast hint: Spark cannot broadcast the build side of a
        # FULL OUTER join (each unmatched row of BOTH sides must surface
        # exactly once), so the hint was ignored with a per-query warning.
        # Both sides are <= k_each rows — the sort-merge join over two
        # k-row frames is free, and the warning channel stays clean (r9).
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    score = None
    for label, _ in ranked_lists:
        w = F.expr(RRF_E9_SPARK.format(k=rrf_k, rank=f"{label}_rank"))
        term = F.coalesce(w, F.lit(0).cast("long"))
        score = term if score is None else score + term
    fused = fused.withColumn("rrf_e9", score.cast("long"))
    top = fused.orderBy(F.desc("rrf_e9"), F.asc(id_col)).limit(k)
    # k-row frame post-limit: the constant partition key only silences
    # WindowExec's no-partition warning (r9; see _util.single_partition_key).
    w = Window.partitionBy(single_partition_key(id_col)).orderBy(
        F.desc("rrf_e9"), F.asc(id_col)
    )
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
    bm, dn = sparse_dense_ranked_lists(
        docs, embeddings, query_terms, probe_vec_id, k_each
    )
    return rrf_fuse([("bm25", bm), ("dense", dn)], rrf_k=rrf_k, k=k)


def sparse_dense_ranked_lists(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    probe_vec_id: int = 0,
    k_each: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """The two ranked lists behind :func:`hybrid_rrf_topk`, each
    (doc_id, rank) with the probe's own doc excluded: BM25 over the text
    and rounded-cosine over the embeddings (ranking on the ROUNDED value
    with an id tie-break — the raw left-to-right fold is already
    bit-identical cross-engine, but ranking on the rounded number means
    even a tie AT the quantization boundary orders identically on every
    engine)."""
    from .bm25 import bm25_topk
    from .similarity import cosine_scores

    bm = (
        bm25_topk(
            docs.filter(F.col("doc_id") != probe_vec_id), query_terms, k=k_each
        )
        .select("doc_id", "rank")
    )
    scores = (
        cosine_scores(
            embeddings, embeddings.filter(F.col("vec_id") == probe_vec_id)
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
    )
    dn_top = scores.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k_each)
    # k_each-row frame post-limit (see rank window note above).
    dw = Window.partitionBy(single_partition_key("vec_id")).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    dn = dn_top.withColumn("rank", F.row_number().over(dw).cast("int")).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return bm, dn


def retrieval_label_eval(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    probe_vec_id: int = 0,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """Retrieval-quality scorecard: precision-proxy, MRR, and recall at k
    for each of the three retrievers (bm25 / dense / rrf), using the
    embeddings' `label` column as the relevance judgment — a doc is
    relevant iff it shares the probe vector's label (the standard
    label-as-relevance protocol when no human judgments exist).

    All metrics are exact integers (counts, `1e6 DIV first_rel_rank`,
    round-half-up recall ppm), so the whole scorecard value-checks
    cross-engine. Every frame in sight is <= k_each rows except the
    relevance set (corpus-filtered, broadcast); the retrievers themselves
    keep their own scale-correct plans.

    Output: (retriever, n_rel_at_k, mrr_e6, recall_ppm)."""
    bm, dn = sparse_dense_ranked_lists(
        docs, embeddings, query_terms, probe_vec_id, k_each
    )
    rrf = rrf_fuse([("bm25", bm), ("dense", dn)], rrf_k=rrf_k, k=k).select(
        "doc_id", "rank"
    )
    lists = (
        bm.filter(F.col("rank") <= k).select(F.lit("bm25").alias("retriever"), "doc_id", "rank")
        .unionByName(
            dn.filter(F.col("rank") <= k).select(
                F.lit("dense").alias("retriever"), "doc_id", "rank"
            )
        )
        .unionByName(rrf.select(F.lit("rrf").alias("retriever"), "doc_id", "rank"))
    )
    probe_label = embeddings.filter(F.col("vec_id") == probe_vec_id).select("label")
    rel = (
        embeddings.join(F.broadcast(probe_label), "label")
        .filter(F.col("vec_id") != probe_vec_id)
        .select(F.col("vec_id").alias("doc_id"), F.lit(1).alias("_rel"))
    )
    tot = rel.agg(F.count("*").alias("_tot"))
    flagged = lists.join(F.broadcast(rel), "doc_id", "left")
    return (
        flagged.groupBy("retriever")
        .agg(
            F.sum(F.coalesce("_rel", F.lit(0))).cast("long").alias("n_rel_at_k"),
            F.min(F.when(F.col("_rel").isNotNull(), F.col("rank"))).alias("_first"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "retriever",
            "n_rel_at_k",
            F.coalesce(
                F.call_function("div", F.lit(1_000_000).cast("long"), F.col("_first").cast("long")),
                F.lit(0).cast("long"),
            ).alias("mrr_e6"),
            F.call_function(
                "div",
                F.col("n_rel_at_k") * F.lit(2_000_000).cast("long") + F.col("_tot"),
                F.lit(2).cast("long") * F.col("_tot"),
            ).alias("recall_ppm"),
        )
    )
