"""Repetition-based quality filters for training-data curation.

The Gopher/MassiveText family of filters (Rae et al. 2021, "Scaling
Language Models", table A1) flags documents whose content is dominated by
repeated fragments — boilerplate, spam, scraped navigation. The published
metrics are fractions of the doc covered by its most frequent n-grams and
by duplicated n-grams. This module computes the token-count flavor of
those metrics:

- ``top_unigram_frac``  — occurrences of the single most frequent token
  over total tokens;
- ``top_bigram_frac``   — same for the most frequent bigram;
- ``dup_trigram_frac``  — fraction of trigram occurrences that are
  repeats (1 - distinct/total).

Scale shape: every n-gram for every n is produced by ONE projection over
the tokenized doc (array transforms, JVM-side, no Python) and exploded
ONCE; both aggregation steps are ordinary hash aggregates on (id, n[,
gram]) — map-side partials apply, and the widest shuffled key is a single
n-gram string per occurrence. No self-joins, no windows, nothing
quadratic: cost is O(total tokens) rows through two exchanges, the same
shape as word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from ..functions.text import tokens

# Default gates, Gopher A1 flavor: docs exceeding ANY are flagged.
TOP_UNIGRAM_MAX = 0.30
TOP_BIGRAM_MAX = 0.18
DUP_TRIGRAM_MAX = 0.30


def ngram_occurrences(
    docs: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n, gram) — every n-gram OCCURRENCE (not distinct, unlike
    ``dedup.shingle_table``) for each requested n, from one tokenize pass
    and one explode.

    Tokenization runs in its own projection so the per-n transforms index
    an already-materialized array (same O(tokens^2) regex trap as
    ``shingle_table``). `sequence(1, n)` counts DOWN for n < 1, so short
    docs get an explicit empty array."""
    toked = ensure_parallelism(docs).select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))

    def grams_for(n: int):
        idx = F.when(
            F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(F.col("toks"), i, n)).alias("gram"),
            ),
        )

    combined = F.flatten(F.array(*[grams_for(n) for n in ns]))
    return toked.select("id", F.explode(combined).alias("g")).select(
        "id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics + a ``repetitive`` gate flag.

    Returns (id_col, top_unigram_frac, top_bigram_frac, dup_trigram_frac,
    repetitive). Fractions are rounded to 6 places and the gate compares
    the ROUNDED values, so the flag is reproducible from the published
    metrics. Docs too short for an n-gram size get NULL for that metric
    (`try_divide`), and NULL never trips the gate."""
    occ = ngram_occurrences(docs, (1, 2, 3), id_col, text_col)
    counts = occ.groupBy("id", "n", "gram").agg(F.count("*").alias("c"))
    stats = counts.groupBy("id", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.count("*").alias("uniq"),
    )
    wide = (
        stats.groupBy("id")
        .pivot("n", [1, 2, 3])
        .agg(
            F.first("total").alias("total"),
            F.first("top").alias("top"),
            F.first("uniq").alias("uniq"),
        )
    )
    top_uni = F.round(F.try_divide(F.col("1_top").cast("double"), F.col("1_total")), 6)
    top_bi = F.round(F.try_divide(F.col("2_top").cast("double"), F.col("2_total")), 6)
    dup_tri = F.round(
        F.lit(1.0) - F.try_divide(F.col("3_uniq").cast("double"), F.col("3_total")), 6
    )
    out = wide.select(
        F.col("id").alias(id_col),
        top_uni.alias("top_unigram_frac"),
        top_bi.alias("top_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
    )
    gate = (
        (F.col("top_unigram_frac") > TOP_UNIGRAM_MAX)
        | (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
        | (F.col("dup_trigram_frac") > DUP_TRIGRAM_MAX)
    )
    return out.withColumn("repetitive", F.coalesce(gate, F.lit(False)))
