"""Record linkage / entity resolution: blocked fuzzy matching.

The classic dedup problem for ENTITY tables (customers, suppliers,
authors) rather than documents: find records that are the same real-world
entity under typos and formatting drift. All-pairs edit distance is
O(n^2) and dead at scale; the standard recipe is BLOCKING — a cheap
deterministic key (name prefix, soundex, sorted tokens) partitions the
table so candidate pairs come from an equi self-join on the block key,
and the expensive distance runs only inside blocks. Same shape as the
LSH band join in `dedup.py`, with edit distance instead of hash bands;
recall is bounded by the blocking key (pairs split across blocks are
never compared — pick the key for the error model, e.g. a prefix key
misses leading-character typos).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block: Column,
    max_distance: int = 1,
) -> DataFrame:
    """(id_a, id_b, distance): record pairs sharing a block whose
    `name_col` Levenshtein distance is <= max_distance, id_a < id_b.
    One equi self-join on the block key; the distance is a post-join
    filter evaluated only inside blocks."""
    b = df.select(
        F.col(key_col).alias("id"), F.col(name_col).alias("name"), block.alias("blk")
    )
    a = b.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk")
    c = b.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )
