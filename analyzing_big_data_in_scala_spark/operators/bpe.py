"""Distributed BPE merge training (beyond-reference; the tokenizer-training
step of an LLM data pipeline, Sennrich et al. 2016).

The 100 TB shape: BPE statistics live on the WORD-TYPE table (distinct
normalized words + corpus counts), not the token stream — one corpus-sized
aggregate up front, then every merge round runs on a vocabulary-sized
frame (millions of rows at web scale, never the raw corpus). Each round
is: adjacent-symbol pair counts (explode + sum) -> the single most
frequent pair (count desc, pair asc — a total, engine-independent order)
-> apply the merge to every word type. Per-round driver traffic is ONE
row (the argmax pair), the same bounded-collect contract as the k-means
and PageRank loops.

Merge application is defined as LEFT-TO-RIGHT NON-OVERLAPPING over each
word's symbol sequence (standard BPE greedy scan). It is implemented as
two passes of a space-padded literal regexp_replace: pass 1 merges the
1st/3rd/5th... occurrence of each overlapping chain (the shared space
delimiter is consumed), pass 2 merges the survivors — provably equal to
the token-space greedy scan, and expressible identically in Java regex
(Spark) and RE2 (DuckDB, no lookarounds needed), which is what makes the
operator value-checkable cross-engine. Symbols stay [a-z0-9]+ after
`tokens()` normalization, so the literal pattern never needs escaping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from ..functions.text import tokens


def word_symbol_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(s, cnt): every distinct normalized word as a space-joined
    character sequence, with its corpus occurrence count. The ONLY
    corpus-sized pass in BPE training."""
    return (
        ensure_parallelism(docs).select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat_ws(
                " ", F.filter(F.split("w", ""), lambda c: F.length(c) > 0)
            ).alias("s"),
            "cnt",
        )
    )


def _adjacent_pairs(s_col: str = "s") -> F.Column:
    """Adjacent symbol pairs of a space-joined sequence, as 'a b' strings
    (empty array for single-symbol words)."""
    arr = F.split(F.col(s_col), " ")
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(s_col: F.Column, left: str, right: str) -> F.Column:
    """Left-to-right non-overlapping merge of (left, right) -> leftright
    over a space-joined symbol string: two passes of a padded literal
    replace (see module docstring for why two passes are exact)."""
    pat = f" {left} {right} "
    rep = f" {left}{right} "
    padded = F.concat(F.lit(" "), s_col, F.lit(" "))
    return F.trim(F.regexp_replace(F.regexp_replace(padded, pat, rep), pat, rep))


def bpe_merge_table(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train `n_merges` BPE merge rules over the corpus. Returns
    (step, left, right, merged, pair_count) — step 1-based, pair_count
    the summed corpus frequency of the winning pair AT ITS MERGE TIME.

    Fully deterministic: integer counts, total argmax order
    (count desc, pair asc), and an exact merge-application definition —
    so the whole rule table is value-checkable against an unrolled SQL
    re-derivation. Each round eager-checkpoints the vocabulary frame:
    round r's pair counts must see round r-1's merges, and without the
    checkpoint every round would replay the full merge chain (and the
    corpus aggregate) from scratch."""
    spark = docs.sparkSession
    syms = word_symbol_table(docs, id_col, text_col).localCheckpoint()
    rules = []
    for step in range(1, n_merges + 1):
        best = (
            syms.select(F.explode(_adjacent_pairs()).alias("pair"), F.col("cnt"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, n = best[0].pair, int(best[0].n)
        left, right = pair.split(" ")
        rules.append((step, left, right, left + right, n))
        syms = syms.select(
            apply_merge(F.col("s"), left, right).alias("s"), "cnt"
        ).localCheckpoint()
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list to segment documents: (id_col, word,
    pieces array<string>) per word occurrence position... — exploded per
    word with its BPE piece sequence. Merges MUST be applied in training
    order (rule k can only fire on symbols built by rules < k); the whole
    chain is one composed column expression, evaluated in a single scan
    with zero shuffles beyond the source read."""
    word = F.explode(tokens(text_col)).alias("word")
    out = ensure_parallelism(docs).select(F.col(id_col), word)
    s = F.concat_ws(" ", F.filter(F.split("word", ""), lambda c: F.length(c) > 0))
    for left, right in merges:
        s = apply_merge(s, left, right)
    return out.select(id_col, "word", F.split(s, " ").alias("pieces"))
