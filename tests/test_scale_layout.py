"""Physical-layout scale tests: bucketed co-located joins plan with NO
exchange, partitioned parquet scans prune partitions, and broadcast joins
appear where intended. These pin the 100 TB posture claims in README.md to
actual physical plans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from analyzing_big_data_in_scala_spark.sources import bucketing as B
from analyzing_big_data_in_scala_spark.sources.catalog import load_table, write_parquet


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    B.write_bucketed(orders, "t_orders_b", "o_orderkey", num_buckets=4)
    B.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        num_buckets=4,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.cocolated_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = _physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # co-located buckets: the join runs with NO shuffle exchange on either
    # side ("Exchange hashpartitioning"; BroadcastExchange is disabled above)
    assert "Exchange hashpartitioning" not in plan, plan
    # and the join result is still correct
    expected = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    )
    assert joined.count() == expected


def test_unbucketed_join_does_shuffle_for_contrast(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical_plan(
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange hashpartitioning" in plan  # the shuffle bucketing removes


def test_partitioned_write_enables_partition_pruning(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pp") / "events_by_type")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_parquet(ev, out, partition_by=["event_type"])
    # one directory per event_type
    assert any(d.startswith("event_type=") for d in os.listdir(out))

    read = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _physical_plan(read)
    assert "PartitionFilters" in plan
    assert read.count() == ev.filter(F.col("event_type") == "click").count()


def test_broadcast_hint_respected_in_star_join(spark):
    from analyzing_big_data_in_scala_spark.plans.registry import QUERIES
    import analyzing_big_data_in_scala_spark.plans  # noqa: F401

    df = QUERIES["revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_persisted_search_index_matches_live_search_with_no_hash_exchange(spark):
    from analyzing_big_data_in_scala_spark.operators import tfidf as T

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    T.build_search_index(docs, prefix="t_sidx", num_buckets=4)
    try:
        terms = ["spark", "window", "big"]
        live = {(r.doc_id, r.score) for r in T.search_query(docs, terms, top_k=10).collect()}
        indexed = {(r.id, r.score) for r in T.search_query_indexed(spark, terms, prefix="t_sidx", top_k=10).collect()}
        assert indexed == live
        plan = _physical_plan(T.search_query_indexed(spark, terms, prefix="t_sidx", top_k=10))
        # per-doc stages ride the bucket partitioning: zero hash exchanges
        assert "Exchange hashpartitioning" not in plan
    finally:
        for t in ("t_sidx_matrix", "t_sidx_norms", "t_sidx_idf"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# ---------------------------------------------------------------------------
# Z-order layout (sources/layout.py)
# ---------------------------------------------------------------------------


def test_z_value_interleaves_bits(spark):
    from analyzing_big_data_in_scala_spark.sources.layout import z_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 0), (0, 3), (0xFFFF, 0xFFFF)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value(["x", "y"]).alias("z")).collect()
    }
    # column 0 takes even output bits, column 1 odd ones
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 0b01
    assert out[(0, 1)] == 0b10
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(0xFFFF, 0xFFFF)] == (1 << 32) - 1


def test_z_value_overflow_guard():
    import pytest as _pytest

    from analyzing_big_data_in_scala_spark.sources.layout import z_value

    with _pytest.raises(ValueError, match="overflows"):
        z_value(["a", "b", "c", "d"], bits=16)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path_factory):
    """After write_zordered, each FILE covers a narrow slice of BOTH key
    columns — the property parquet min/max skipping needs. A 1-D sort
    would leave the second column's per-file range at ~full width."""
    import glob

    from analyzing_big_data_in_scala_spark.sources.layout import write_zordered

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    stats = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("pr"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("sr"),
    ).first()
    path = str(tmp_path_factory.mktemp("zorder")) + "/li"
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=16)

    files = glob.glob(path + "/part-*.parquet")
    assert len(files) >= 8
    ratios_p, ratios_s = [], []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("pr"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("sr"),
            )
            .first()
        )
        ratios_p.append(r["pr"] / stats["pr"])
        ratios_s.append(r["sr"] / stats["sr"])
    # Z-clustering: the AVERAGE per-file key range is a fraction of the
    # global range on BOTH dimensions (16 files -> ideal ~1/4 per dim).
    assert sum(ratios_p) / len(ratios_p) < 0.6, ratios_p
    assert sum(ratios_s) / len(ratios_s) < 0.6, ratios_s


def test_lsh_signature_stage_stays_arrow_never_interpreted(spark):
    """Round-6 regression guard: the LSH signature must be the Arrow
    mapInPandas pass (2 stages: corpus + query), never a generated SQL
    expression — the r5 flat-SQL form blew janino's 64 KB method limit
    and dropped the WHOLE stage to interpreted eval (31x). A janino
    failure surfaces as a WholeStageCodegen fallback warning, not an
    error, so the plan shape is the only durable tripwire."""
    from analyzing_big_data_in_scala_spark.operators import similarity as S
    from analyzing_big_data_in_scala_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    df = S.lsh_topk(emb, emb.filter(F.col("vec_id") < 2), k=5)
    df.count()  # AQE: finalize the executed plan
    plan = _physical_plan(df)
    assert plan.count("MapInPandas") == 2  # corpus signatures + query signatures
    # The probe side must broadcast; candidates come from an equi-join.
    assert "BroadcastHashJoin" in plan


def test_exact_substring_removal_single_corpus_scan(spark):
    """Round-6 regression guard: without the lazy checkpoints the
    tokenize+window-hash chain re-ran per consumer (3 parquet scans).
    The final executed plan must read the checkpointed intermediates,
    not re-scan parquet."""
    from analyzing_big_data_in_scala_spark.operators.chunking import (
        exact_substring_removal,
    )
    from analyzing_big_data_in_scala_spark.plans.pipeline_queries import _docs

    out = exact_substring_removal(_docs(spark, "/root/testdata/sf0.001"))
    out.count()
    plan = _physical_plan(out)
    assert plan.count("Scan parquet") == 0  # all inputs come from checkpoints
    assert "Scan ExistingRDD" in plan


def test_schema_evolution_additive_merge(spark, tmp_path):
    """Era-1 files lack the new column; mergeSchema NULL-fills them and a
    default (non-merged) read of an era-1-only directory simply doesn't
    see the column — history is never rewritten."""
    from analyzing_big_data_in_scala_spark.sources.evolution import (
        append_era,
        read_merged,
    )

    p = str(tmp_path / "evo")
    append_era(spark.range(5).select(F.col("id").alias("k")), p)
    append_era(
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit("new").alias("extra")),
        p,
    )
    merged = read_merged(spark, p)
    assert set(merged.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in merged.collect()}
    assert all(rows[k] is None for k in range(5))
    assert all(rows[k] == "new" for k in range(5, 8))
