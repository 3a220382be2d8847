"""Interleaved A/B: shared shingle-array pass (VERDICT r14 item 7) vs the
current twin-tokenize pipelines, for the minhash audit family.

Arms:
  old  — minhash_recall_eval / minhash_precision_eval as committed (two
         tokenize+shingle passes per query: 64-bit truth + 40-bit minhash)
  new  — same operators with a shared, lazily-checkpointed
         shingle_array_table frame feeding both hash widths

Runs in ONE warm session, alternating arms, median-of-N, noop sink.
Usage: python tools/minhash_share_probe.py [passes=5]
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from analyzing_big_data_in_scala_spark.operators import dedup as D  # noqa: E402
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
from analyzing_big_data_in_scala_spark.sources.catalog import load_table  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def recall_old(docs):
    return D.minhash_recall_eval(docs, num_perm=16, bands=4, k=3)


def recall_new(docs):
    sharr = D.shingle_array_table(docs, 3).localCheckpoint(eager=False)
    true_pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.2, shingle_arrays=sharr)
    cands = D.minhash_candidates(docs, 16, 4, 3, shingle_arrays=sharr)
    band = F.least(F.floor(F.col("jaccard") * 5).cast("int"), F.lit(4))
    graded = (
        true_pairs.join(cands.select("id_a", "id_b", "n_bands"), ["id_a", "id_b"], "left")
        .select(band.alias("jaccard_band"), F.col("n_bands").isNotNull().alias("_hit"))
    )
    return (
        graded.groupBy("jaccard_band")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.sum(F.col("_hit").cast("long")).alias("n_recalled"),
        )
        .select(
            "jaccard_band", "n_true", "n_recalled",
            F.expr("(2000000 * n_recalled + n_true) DIV (2 * n_true)").alias("recall_ppm"),
        )
    )


def precision_old(docs):
    return D.minhash_precision_eval(docs, num_perm=16, bands=4, k=3)


def precision_new(docs):
    sharr = D.shingle_array_table(docs, 3).localCheckpoint(eager=False)
    cands = D.minhash_candidates(docs, 16, 4, 3, shingle_arrays=sharr).localCheckpoint(eager=False)
    sh = D.hashed_shingle_table(docs, 3, shingle_arrays=sharr).localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        cands.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("_sa"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("_sb"))
    graded = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "n_bands",
            F.coalesce(F.col("_i"), F.lit(0)).alias("_i0"),
            (F.col("_sa") + F.col("_sb") - F.coalesce(F.col("_i"), F.lit(0))).alias("_den"),
        )
    )
    return (
        graded.groupBy("n_bands")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(
                (F.lit(100) * F.col("_i0") >= F.lit(20) * F.col("_den")).cast("long")
            ).alias("n_true"),
        )
        .select(
            "n_bands", "n_candidates", "n_true",
            F.expr("(2000000 * n_true + n_candidates) DIV (2 * n_candidates)").alias("precision_ppm"),
        )
    )


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash-share-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    arms = {
        "recall_old": recall_old, "recall_new": recall_new,
        "precision_old": precision_old, "precision_new": precision_new,
    }
    times = {k: [] for k in arms}
    # warmup both shapes once
    for k in arms:
        _noop(arms[k](docs))
    for p in range(passes):
        for k in arms:
            spark.sparkContext.setJobDescription(f"{k} pass{p}")
            t0 = time.perf_counter()
            _noop(arms[k](docs))
            times[k].append(time.perf_counter() - t0)
    import statistics
    for k in arms:
        med = statistics.median(times[k])
        print(f"{k:15s} median {med:6.3f}s  runs {[round(t,3) for t in times[k]]}")
    # value parity: new vs old collected & sorted
    for fam in ("recall", "precision"):
        a = sorted(map(tuple, arms[f"{fam}_old"](docs).collect()))
        b = sorted(map(tuple, arms[f"{fam}_new"](docs).collect()))
        print(f"{fam} parity: {'IDENTICAL' if a == b else 'DIFFER'}")
    spark.stop()


if __name__ == "__main__":
    main()
