"""Corpus language-model statistics for quality filtering and phrase
mining (beyond-reference; training-pipeline surface).

- **Unigram-LM perplexity proxy**: the classic cheap quality signal
  (CCNet/Gopher-style pipelines score documents with a language model and
  drop the tails). Without an external KenLM in the container, the
  corpus's OWN unigram distribution is the model: a document whose tokens
  are globally rare scores a high proxy-perplexity. Shape: one token
  explode, one vocab aggregate, one join back on the term key, one per-doc
  aggregate — every step a hash shuffle on a narrow key, nothing driver
  side, so the same plan runs at full corpus scale.

- **PMI collocations**: pointwise mutual information over adjacent token
  pairs — the standard phrase-mining / tokenizer-vocabulary signal
  (`new york` scores high because p(pair) >> p(new)p(york)). One bigram
  explode + two joins against the unigram table; corpus totals enter the
  plan as 1-row broadcast cross joins (never a driver collect).

Both operators are pure `pyspark.sql.functions` expression pipelines
(JVM-side, whole-stage codegen) and fully DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _token_occurrences(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) — one row per token OCCURRENCE (duplicates preserved)."""
    return docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )


def unigram_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, c) — corpus-wide unigram occurrence counts: the model."""
    return (
        _token_occurrences(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )


def doc_logprob_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram-LM score: (id_col, n_tokens, avg_logprob,
    ppl_proxy) with avg_logprob = mean over token occurrences of
    ln(c(term)/T) under the corpus's own unigram distribution and
    ppl_proxy = exp(-avg_logprob) (the perplexity of the doc under that
    model). Zero-token docs keep n_tokens=0 and NULL scores.

    Every token in the corpus has c >= 1 by construction, so no smoothing
    is needed — the model is evaluated on its own training corpus. A real
    pipeline swaps `unigram_counts` for a held-out/reference model table;
    the join shape is identical.
    """
    occ = _token_occurrences(docs, id_col, text_col)
    # counts has 2 consumers (total row + occurrence join): materialize the
    # vocabulary-sized table once instead of tokenizing the corpus twice.
    counts = unigram_counts(docs, id_col, text_col).localCheckpoint(eager=False)
    total = counts.agg(F.sum("c").alias("t"))
    lp = (
        occ.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select("id", F.log(F.col("c").cast("double") / F.col("t")).alias("lp"))
    )
    per_doc = lp.groupBy("id").agg(
        F.count("*").alias("n_tokens"), F.avg("lp").alias("alp")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round("alp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("alp")), 6).alias("ppl_proxy"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    topk: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-pair collocations by PMI:
    (w1, w2, n_pairs, pmi) with pmi = ln((c2/N2) / ((c1(w1)/N1)(c1(w2)/N1))).

    `min_count` suppresses the classic PMI pathology (hapax pairs score
    highest); ordering is by the ROUNDED pmi then (w1, w2) so the top-k
    cut is deterministic across engines. The bigram explode is in-array
    (`transform` over an index sequence) — no self-join of the token
    table against itself.
    """
    toked = docs.select(tokens(text_col).alias("toks")).filter(F.size("toks") >= 2)
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    pairs = toked.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    # c2 has 2 consumers (total row + scoring) and c1 has 3 (total row +
    # both unigram joins): materialize the vocabulary-sized count tables
    # once (lazy localCheckpoint) so the corpus tokenize/explode runs once
    # per table, not once per consumer.
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pairs")).localCheckpoint(eager=False)
    c1 = unigram_counts(docs, id_col, text_col).localCheckpoint(eager=False)
    n1 = c1.agg(F.sum("c").alias("n1"))
    n2 = c2.agg(F.sum("n_pairs").alias("n2"))
    scored = (
        c2.filter(F.col("n_pairs") >= min_count)
        .join(c1.select(F.col("term").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .join(c1.select(F.col("term").alias("w2"), F.col("c").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "n_pairs",
            F.round(
                F.log(
                    (F.col("n_pairs").cast("double") / F.col("n2"))
                    / (
                        (F.col("c_w1").cast("double") / F.col("n1"))
                        * (F.col("c_w2").cast("double") / F.col("n1"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(topk)
