"""Checkpoint-CADENCE A/B for the lazy iterative graph loops (r15,
VERDICT r14 item 3 follow-through): with every per-round materialization
already lazy, is a coarser lineage-cut cadence (every 2 rounds) any
faster? The blocks persist inside the same final job either way; the
trade is block I/O (cadence 1) vs plan depth / analysis time (cadence 2).

Arms (warm session, interleaved, median-of-5, noop sink, sf0.1 edges):
  ppr_c1 / ppr_c2    personalized_pagerank, ranks checkpoint every 1 / 2 rounds
  hits_c1 / hits_c2  hits, auth+hub lineage cut every 1 / 2 rounds
                     (araw/hraw cuts kept in both arms: they are genuine
                     2-consumer frames — norm + divide)

Usage: python tools/graph_cadence_probe.py [passes=5]
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from analyzing_big_data_in_scala_spark.operators import graph as G  # noqa: E402
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
from analyzing_big_data_in_scala_spark.sources.catalog import load_table  # noqa: E402


def ppr_cadence(edges, seeds, cadence: int, alpha=0.15, iterations=10):
    vertices = G._vertices_from_edges(edges)
    seed_ids = vertices.join(seeds, "id", "left_semi").localCheckpoint(eager=False)
    n_seeds = seed_ids.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    contrib_edges = edges.select("src", "dst").join(out_deg, "src").localCheckpoint(eager=False)
    tele = vertices.join(seed_ids.withColumn("_s", F.lit(1)), "id", "left").select(
        "id",
        F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("tele"),
    ).localCheckpoint(eager=False)
    ranks = tele.select("id", F.col("tele").alias("ppr"))
    for i in range(iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id, "inner")
            .select(F.col("dst").alias("id"), (F.col("ppr") / F.col("out_deg")).alias("contrib"))
            .groupBy("id")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = tele.join(contribs, "id", "left").select(
            "id",
            (F.lit(alpha) * F.col("tele") + F.lit(1 - alpha) * F.coalesce("mass", F.lit(0.0))).alias("ppr"),
        )
        if (i + 1) % cadence == 0 or (i + 1) == iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits_cadence(edges, cadence: int, iterations=8):
    vertices = G._vertices_from_edges(edges).localCheckpoint(eager=False)
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    hub = vertices.select("id", F.lit(1.0).alias("hub"))
    auth = None
    for i in range(iterations):
        araw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst").agg(F.sum("hub").alias("s"))
            .localCheckpoint(eager=False)
        )
        an = araw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        auth = araw.crossJoin(F.broadcast(an)).select(
            F.col("dst").alias("id"), F.try_divide("s", "n").alias("auth")
        )
        hraw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src").agg(F.sum("auth").alias("s"))
            .localCheckpoint(eager=False)
        )
        hn = hraw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        hub = hraw.crossJoin(F.broadcast(hn)).select(
            F.col("src").alias("id"), F.try_divide("s", "n").alias("hub")
        )
        if (i + 1) % cadence == 0 or (i + 1) == iterations:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    return (
        vertices.join(auth, "id", "left").join(hub, "id", "left").select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph-cadence-probe")
    spark.sparkContext.setLogLevel("ERROR")
    edges = G.edges_from_events(load_table(spark, sf_dir, "events")).localCheckpoint()
    verts = G._vertices_from_edges(edges)
    seeds = verts.filter(F.col("id") % 20 == 0)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    arms = {
        "ppr_c1": lambda: ppr_cadence(edges, seeds, 1),
        "ppr_c2": lambda: ppr_cadence(edges, seeds, 2),
        "hits_c1": lambda: hits_cadence(edges, 1),
        "hits_c2": lambda: hits_cadence(edges, 2),
    }
    times = {k: [] for k in arms}
    for k in arms:
        _noop(arms[k]())  # warmup
    for p in range(passes):
        for k in arms:
            spark.sparkContext.setJobDescription(f"{k} pass{p}")
            t0 = time.perf_counter()
            _noop(arms[k]())
            times[k].append(time.perf_counter() - t0)
    import statistics
    for k in arms:
        print(f"{k:9s} median {statistics.median(times[k]):6.3f}s  runs {[round(t,3) for t in times[k]]}")
    # parity between cadences (rounded like the registry queries)
    for fam, f1, f2 in (("ppr", arms["ppr_c1"], arms["ppr_c2"]), ("hits", arms["hits_c1"], arms["hits_c2"])):
        a = sorted(tuple(r) for r in f1().collect())
        b = sorted(tuple(r) for r in f2().collect())
        print(f"{fam} cadence parity: {'IDENTICAL' if a == b else 'DIFFER'}")
    spark.stop()


if __name__ == "__main__":
    main()
