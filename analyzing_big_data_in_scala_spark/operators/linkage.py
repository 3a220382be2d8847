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

from ._util import ensure_parallelism


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block: Column,
    max_distance: int = 1,
    widen: bool = True,
) -> DataFrame:
    """(id_a, id_b, distance): record pairs sharing a block whose
    `name_col` Levenshtein distance is <= max_distance, id_a < id_b.
    One equi self-join on the block key; the distance is a post-join
    filter evaluated only inside blocks."""
    # ensure_parallelism (r14, guide §2.5): the block self-join fans out
    # within blocks and pays a levenshtein per emitted pair — keep it off
    # a 1-task single-row-group scan (no-op on multi-file inputs).
    # `widen=False` opts out for consumers whose downstream is an
    # iterative fixpoint over the SMALL pair output (entity_clusters'
    # CC rounds measured 1 s slower with the wide input — the fixpoint's
    # per-round task scheduling outweighs the parallel levenshtein).
    b = (ensure_parallelism(df) if widen else df).select(
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


def entity_clusters(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block: Column,
    max_distance: int = 1,
) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy pairs -> connected
    components over the match graph -> one canonical entity per record:

        (id, entity_id, cluster_size)

    entity_id is the minimum record id reachable through match edges
    (matching is symmetric but not transitive — A~B and B~C can hold with
    A~C failing the distance cut, and the business meaning of "same
    entity" IS the transitive closure, so components are the right
    semantics). Unmatched records are their own singleton entity.

    Scale shape: the pair join is block-bounded (never all-pairs); CC
    runs on the MATCH SUBGRAPH only — pairs are a small fraction of the
    record table, so the O(log n)-round star contraction touches almost
    nothing; the final assignment is one left join + one entity-keyed
    count aggregate."""
    from .graph import connected_components_two_phase

    pairs = blocked_fuzzy_pairs(df, key_col, name_col, block, max_distance, widen=False)
    comps = connected_components_two_phase(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    assigned = (
        df.select(F.col(key_col).alias("id"))
        .join(comps, "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("entity_id"))
        # Two consumers below (the size aggregate and the final join):
        # without the lineage cut each re-runs the whole pair-gen + CC
        # chain (the multi-consumer recompute trap).
        .localCheckpoint(eager=False)
    )
    sizes = assigned.groupBy("entity_id").agg(F.count("*").alias("cluster_size"))
    return assigned.join(sizes, "entity_id").select("id", "entity_id", "cluster_size")
