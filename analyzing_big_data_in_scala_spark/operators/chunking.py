"""Fixed-length token chunking + chunk-level (sub-document) dedup.

Two standard training-pipeline steps the document-level operators don't
cover:

- **Chunking**: a context-window pipeline splits each document's token
  stream into fixed-size chunks before packing/tokenization
  (`operators/packing.py` then packs chunks into shards). Implemented as
  one tokenize + one in-array slice transform + one explode — no UDF, no
  shuffle until a consumer aggregates.
- **Chunk-level dedup**: duplicated PASSAGES across documents (boilerplate
  headers, license blocks, syndicated fragments) survive document-level
  dedup because the surrounding text differs. Hashing fixed chunks and
  counting cross-corpus repeats is the chunk-granularity approximation of
  suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
  Data Makes Language Models Better") that actually scales: two hash
  aggregates over 8-byte keys, nothing quadratic, no suffix array.

Chunk hashes use the md5-derived portable hash so DuckDB reproduces them
bit-for-bit (same contract as `dedup.hashed_shingle_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from ..functions.text import portable_hash64, tokens


def token_chunks(
    docs: DataFrame,
    chunk_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_hash) — `chunk_size`-token windows
    per document starting every `stride` tokens (default = chunk_size,
    i.e. non-overlapping), in order; the final window may be short.
    Zero-token docs yield no rows.

    stride < chunk_size gives OVERLAPPING windows: a duplicated passage
    that is shifted relative to the chunk grid (a few tokens of differing
    preamble) still produces at least one aligned window pair, at
    chunk_size/stride times the row volume — the standard recall/cost
    dial for passage-level dedup."""
    if stride is None:
        stride = chunk_size
    if stride <= 0 or stride > chunk_size:
        raise ValueError(f"token_chunks: need 0 < stride <= chunk_size, got {stride}")
    toked = ensure_parallelism(docs).select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(stride)).cast("int")
    idx = F.when(F.size("toks") > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(F.col("toks"), i * stride + 1, chunk_size).alias("c"),
        ),
    )
    return toked.select("id", F.explode(chunks).alias("ch")).select(
        F.col("id"),
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.size("ch.c").alias("n_tokens"),
        portable_hash64(F.concat_ws(" ", F.col("ch.c"))).alias("chunk_hash"),
    )


def chunk_dedup_stats(
    docs: DataFrame,
    chunk_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int | None = None,
) -> DataFrame:
    """Per-document duplicated-passage profile:
    (id_col, n_chunks, n_dup_chunks, dup_chunk_ppm).

    A chunk occurrence is *duplicated* when its hash also appears in at
    least one OTHER document (within-doc repeats alone don't count — a
    doc's own refrain is repetition, not cross-corpus boilerplate;
    `operators/repetition.py` measures that). dup_chunk_ppm is the
    duplicated fraction in parts-per-million as a BIGINT, computed with
    pure integer arithmetic (round-half-up of n_dup*1e6/n_chunks via
    `(2*a*1e6 + b) div (2*b)`) so the value is bit-identical on any
    engine — no float division, no ROUND-on-double tie-breaking
    (Spark HALF_UP vs DuckDB last-ulp diverged when the ratio was an
    exactly-representable k/2^m half). NULL for zero-chunk docs.

    Scale shape: chunk table → one hash aggregate for the global per-hash
    document frequency → equi-join back ON THE 8-BYTE HASH (both sides
    already partitioned by it, so the join reuses the aggregate's
    exchange) → one aggregate per doc. Nothing quadratic, keys never
    wider than a long; distinct hashes grow with the corpus, so this is
    a shuffled join by design, not a broadcast."""
    ch = token_chunks(docs, chunk_size, id_col, text_col, stride=stride)
    df_counts = ch.groupBy("chunk_hash").agg(
        F.count_distinct("id").alias("chunk_df")
    )
    flagged = ch.join(df_counts, "chunk_hash").select(
        "id", (F.col("chunk_df") > 1).alias("is_dup")
    )
    per_doc = flagged.groupBy("id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("is_dup").cast("int")).alias("n_dup_chunks"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_chunk_ppm",
            F.when(
                F.col("n_chunks") > 0,
                F.expr("(n_dup_chunks * 2000000L + n_chunks) div (2L * n_chunks)"),
            ),
        )
    )


def exact_substring_removal(
    docs: DataFrame,
    window: int = 32,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rounds: int = 1,
) -> DataFrame:
    """Exact-substring duplicate REMOVAL (Lee et al. 2022 §4.1 ExactSubstr,
    "Deduplicating Training Data Makes Language Models Better"): excise
    from each document every token covered by a `window`-token run that
    also appears verbatim in at least one OTHER document, and emit the
    cleaned text. Returns (id_col, n_tokens, n_removed_tokens,
    cleaned_text); docs shorter than `window` tokens pass through intact.

    Where :func:`chunk_dedup_stats` only MEASURES duplicated passages,
    this is the removal step a training-data user runs next. The paper
    builds a suffix array; the scalable Spark re-expression is hash-based:
    at stride=1 every length-`window` substring is hashed, so any
    duplicated run of >= `window` tokens is detected at every offset —
    the same detection guarantee as the suffix array, minus md5-collision
    odds (~1e-10 at a billion windows). stride > 1 is the recall/cost
    dial (rows shrink by the stride; grid-shifted passages can then be
    missed — see :func:`token_chunks`).

    Shape, all DataFrame ops, nothing quadratic:
      1. one scan: tokenize, slice+hash full windows (explode: ~1 row per
         corpus TOKEN at stride=1 — heavy but linear, keys 8-byte longs);
      2. per-hash cross-doc document frequency (hash aggregate), join back
         on the hash (reuses the aggregate's exchange partitioning);
      3. duplicated window starts -> merged removed intervals per doc
         (gaps-and-islands over a per-doc window function: equal-length
         intervals sorted by start merge iff start <= prev_start+window);
      4. complement + re-concat kept tokens with higher-order array
         functions (exists over the FEW merged intervals per doc) — no
         Python in the path, no per-token shuffle beyond step 2's.

    Within-doc repeats (df == 1) are repetition, not cross-corpus
    boilerplate — same cross-doc-only rule as :func:`chunk_dedup_stats`.
    One pass is not a fixed point (Lee et al. note the same): re-joining
    kept tokens can in principle mint NEW cross-doc windows spanning a cut;
    tests re-run the pass on the cleaned fixture corpus to show it lands
    at zero on real data.

    ``max_rounds`` > 1 turns the pass into a BOUNDED FIXPOINT: the pass
    re-runs on its own cleaned output until a round removes nothing (early
    exit) or the budget is spent. Each round's frame rides a lazy
    localCheckpoint, so the convergence probe (one sum per round) and the
    next round share one materialization — rounds cost is ~rounds x one
    pass over the SHRINKING corpus, never a recompute pyramid.
    `n_tokens` always counts the ORIGINAL document; `n_removed_tokens`
    accumulates across rounds. The default (1) is the single-pass
    contract every registered oracle pins."""
    if max_rounds < 1:
        raise ValueError(f"exact_substring_removal: need max_rounds >= 1, got {max_rounds}")
    out = _exact_substring_pass(docs, window, stride, id_col, text_col)
    if max_rounds == 1:
        return out
    out = out.localCheckpoint(eager=False)
    for _ in range(max_rounds - 1):
        nxt = _exact_substring_pass(
            out.select(F.col(id_col), F.col("cleaned_text").alias(text_col)),
            window, stride, id_col, text_col,
        ).localCheckpoint(eager=False)
        round_removed = nxt.agg(F.sum("n_removed_tokens")).first()[0] or 0
        if round_removed == 0:
            break
        a, b = out.alias("_fx_a"), nxt.alias("_fx_b")
        out = a.join(b, F.col(f"_fx_a.{id_col}") == F.col(f"_fx_b.{id_col}")).select(
            F.col(f"_fx_a.{id_col}").alias(id_col),
            F.col("_fx_a.n_tokens").alias("n_tokens"),
            (F.col("_fx_a.n_removed_tokens") + F.col("_fx_b.n_removed_tokens"))
            .alias("n_removed_tokens"),
            F.col("_fx_b.cleaned_text").alias("cleaned_text"),
        ).localCheckpoint(eager=False)
    return out


def _exact_substring_pass(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """One detection+excision pass of :func:`exact_substring_removal`."""
    from pyspark.sql import Window as W

    if stride <= 0 or stride > window:
        raise ValueError(f"exact_substring_removal: need 0 < stride <= window, got {stride}")
    # Both intermediates below have TWO consumers (toked: window table +
    # final join; wins: df aggregate + join-back), and ReuseExchange does
    # not rescue either (the aggregate and join subtrees differ) — without
    # the lazy checkpoints the tokenize+hash chain re-ran per consumer:
    # 3 parquet scans vs 1 at sf0.1 (warm-state A/B 3.1s vs 0.6s; a cold
    # run still computes the chain once, ~2.2s vs ~3.5s — the measured
    # multi-consumer recompute trap; see corpus_curation_funnel).
    toked = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    ).localCheckpoint(eager=False)
    # Full windows only: starts 0, stride, ... while start + window <= n.
    n_full = (F.floor((F.size("toks") - F.lit(window)) / F.lit(stride)) + 1).cast("int")
    starts = F.when(
        F.size("toks") >= window,
        F.sequence(F.lit(0), (n_full - 1) * stride, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    wins = toked.select(
        "id", F.explode(starts).alias("p"), F.col("toks")
    ).select(
        "id",
        "p",
        portable_hash64(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("p") + 1, window))
        ).alias("h"),
    ).localCheckpoint(eager=False)
    dup_hashes = (
        wins.groupBy("h")
        .agg(F.count_distinct("id").alias("wdf"))
        .filter(F.col("wdf") > 1)
        .select("h")
    )
    dup_starts = wins.join(dup_hashes, "h").select("id", "p")
    # Gaps-and-islands: same-length intervals sorted by start merge iff
    # start <= prev_start + window (touching intervals merge too — the
    # union of removed positions is what matters).
    w_ord = W.partitionBy("id").orderBy("p")
    isl = (
        dup_starts.withColumn("prev_p", F.lag("p").over(w_ord))
        .withColumn(
            "new_isl",
            F.when(F.col("p") > F.col("prev_p") + window, 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_isl").over(w_ord))
    )
    merged = isl.groupBy("id", "island").agg(
        F.min("p").alias("s"), (F.max("p") + window).alias("e")
    )
    rms = merged.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("rms")
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: ~F.exists(
            F.col("rms"), lambda r: (i >= r["s"]) & (i < r["e"])
        ),
    )
    return (
        toked.join(rms, "id", "left")
        .withColumn("rms", F.coalesce("rms", F.array().cast("array<struct<s:int,e:int>>")))
        .select(
            F.col("id").alias(id_col),
            F.size("toks").cast("long").alias("n_tokens"),
            F.aggregate(
                F.col("rms"), F.lit(0), lambda acc, r: acc + (r["e"] - r["s"])
            )
            .cast("long")
            .alias("n_removed_tokens"),
            F.when(F.size("toks") > 0, F.concat_ws(
                " ",
                F.transform(kept_idx, lambda i: F.element_at(F.col("toks"), i + 1)),
            )).otherwise(F.lit("")).alias("cleaned_text"),
        )
    )
