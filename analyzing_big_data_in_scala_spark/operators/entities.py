"""Named-entity extraction + entity word count (SURVEY.md §2.8 N9, §2.11.7).

The reference runs spark-nlp's pretrained DL NER
(ScalaNotebooks/NamedEntitiesWordCount.scala:23,35) then a cleanup/count
pipeline (:50-77). spark-nlp is not available; we match the CONTRACT
(array of entity strings per row -> normalized counts, descending) with two
deterministic, Catalyst-native extractors:

- capitalized-run NER: consecutive Capitalized tokens ("New York City")
  via regexp_extract_all — the classic heuristic for prose text.
- gazetteer NER: dictionary membership — oracle-checkable on the all-
  lowercase synthetic fixtures where capitalization carries no signal.

The cleanup pipeline reproduces the reference's exact regexes:
lowercase (:52), punctuation strip + whitespace collapse (:55-56),
trim/non-empty (:57), stop-word drop (:58), count + sort desc (:63-77).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOP_WORDS, tokens

# One-or-more Capitalized words separated by single spaces.
CAP_RUN_REGEX = r"((?:[A-Z][a-z]+)(?: [A-Z][a-z]+)*)"

# The reference's punctuation-strip regex, verbatim
# (ScalaNotebooks/NamedEntitiesWordCount.scala:55).
REF_PUNCT_REGEX = r"""[\[\]"“”‘(),.!?:;_]|[—’']"""


def extract_capitalized_entities(text: Column | str) -> Column:
    """N9 heuristic: array of capitalized token runs per row."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(CAP_RUN_REGEX), 1)


def extract_gazetteer_entities(text: Column | str, gazetteer: tuple[str, ...]) -> Column:
    """Dictionary NER: tokens present in `gazetteer` (order-preserving,
    duplicates kept — each mention counts, like the reference's NER)."""
    return F.filter(tokens(text), lambda t: t.isin(*gazetteer))


def entity_counts(
    docs: DataFrame,
    entities_col: Column,
    stop_words: tuple[str, ...] = STOP_WORDS,
) -> DataFrame:
    """The reference's cleanup/count pipeline
    (NamedEntitiesWordCount.scala:50-77): explode entities, lowercase,
    strip punctuation, trim, drop empties and stop words, count desc.
    Returns (entity, cnt)."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("entity_raw")), REF_PUNCT_REGEX, ""),
            r"\s+",
            " ",
        )
    )
    return (
        docs.select(F.explode(entities_col).alias("entity_raw"))
        .select(cleaned.alias("entity"))
        .filter((F.length("entity") > 0) & ~F.col("entity").isin(*stop_words))
        .groupBy("entity")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("entity"))
    )


def entity_cooccurrence_edges(
    docs: DataFrame,
    gazetteer: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Entity co-occurrence graph (text -> graph composition): an edge
    (entity_a < entity_b, n_docs) for every entity pair mentioned together
    in at least one document. The n_docs weight is the standard
    co-mention signal feeding entity-graph analytics (degrees, PageRank,
    communities — `operators/graph.py` consumes this edge list directly).

    Scale shape: per-doc entity sets are bounded by the gazetteer size, so
    the per-doc pair fan-out is O(|gazetteer|^2) — a constant, never
    corpus-quadratic; the single shuffle is the (entity_a, entity_b)
    count aggregate."""
    ents = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.explode(
                F.array_distinct(extract_gazetteer_entities(F.col(text_col), gazetteer))
            ).alias("e"),
        )
    )
    a = ents.select(F.col("_d"), F.col("e").alias("entity_a"))
    b = ents.select(F.col("_d"), F.col("e").alias("entity_b"))
    return (
        a.join(b, "_d")
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").alias("n_docs"))
    )
