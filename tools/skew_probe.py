"""Zipf-skew stress probe: plain vs salted aggregate/join under a
power-law key distribution, at 1x / 16x / 64x data inflation.

    python tools/skew_probe.py [base_sf_dir] [out_md]

The uniform-key inflation in scale_probe.py answers "is anything
quadratic?"; this probe answers the OTHER 100 TB question: "what happens
when one key owns half the data?" Keys are remapped to a deterministic
Zipf(s=2)-like law (key k receives ~1/k^2 of the rows: the head key gets
~50%, the second ~12%, a ~1k-key tail), then the same logical join and
aggregation run three ways:

- join_plain_noaqe  — shuffle join, AQE skew handling OFF: the hot key's
  rows land on ONE reducer (the straggler a 1000-executor cluster pays
  for at every skewed shuffle).
- join_plain_aqe    — AQE skew-join ON (spark.sql.adaptive.skewJoin):
  whether the runtime re-plan rescues the straggler at this size.
- join_salted       — operators._util.salted_equi_join: the manual fix
  for when AQE can't act (bucketed sides, skew known up front).

Broadcast is disabled for the join cases: the probe's dim side is tiny,
and a real plan would broadcast it away — THAT is always the first fix;
the probe measures the shuffle path a non-broadcastable side forces.

- agg_plain / agg_salted — groupBy(key).sum vs _util.salted_aggregate.
  Expected finding (and the reason the salted twin exists as an explicit
  opt-in, not a default): hash aggregation's MAP-SIDE partials already
  collapse a hot key to one row per map partition, so plain sum/count
  stays flat under skew and salting only pays off for wide per-key state
  (collect-like payloads) or disabled partial aggregation. The probe
  records the measured non-effect so the claim is numbers, not folklore.

r10 additions — the WINDOW-operator skew question (the one salting can't
fix: a (key)-partitioned, time-ordered window puts the hot key's entire
sequence on ONE task, and the order dependency rules out salt splits):

- window_asof    — asof_join_backward (union + key window carry) with the
  Zipf keys on both sides.
- window_rle     — run_length_encode (two window passes + aggregate).
  Both measure how the single hot-key sort task degrades as the hot key
  grows; the honest mitigations at 100 TB are time-range pre-bucketing
  (split the hot key's window by coarse time, stitch boundaries) or
  simply tolerating one straggler task per hot key — documented, not
  hidden.

Results REPLACE this probe's section in SCALING.md (re-runs don't
duplicate it; other tools' sections are preserved).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from analyzing_big_data_in_scala_spark.operators import asof as A  # noqa: E402
from analyzing_big_data_in_scala_spark.operators import quantiles as QT  # noqa: E402
from analyzing_big_data_in_scala_spark.operators import sequence as SEQ  # noqa: E402
from analyzing_big_data_in_scala_spark.operators._util import (  # noqa: E402
    salted_aggregate,
    salted_equi_join,
)
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
from analyzing_big_data_in_scala_spark.sources.catalog import load_events  # noqa: E402


def zipf_events(base: DataFrame, copies: int) -> DataFrame:
    """Inflate `copies`x with replica-shifted event ids, then remap
    user_id to a Zipf(s=2)-like law: r ~ Uniform[0, 1e6) via xxhash64 of
    the (replica-unique) event id, key = floor(1e6 / (r+1)) — key k's
    mass is ~1e6/k^2 rows of the range, so key 1 owns ~50% of all rows,
    key 2 ~12%, with a ~1000-key tail. Deterministic end to end."""
    parts = []
    for c in range(copies):
        parts.append(
            base.withColumn("event_id", F.col("event_id") + F.lit(c * 10_000_000))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    r = F.pmod(F.xxhash64("event_id"), F.lit(1_000_000))
    return (
        out.withColumn("user_id", F.floor(F.lit(1_000_000) / (r + 1)).cast("long"))
        .repartition(32)
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev0 = load_events(spark, base_dir).select("event_id", "user_id", "value")

    def noop(df: DataFrame) -> None:
        df.write.mode("overwrite").format("noop").save()

    def set_conf(aqe_skew: bool, broadcast: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760" if broadcast else "-1"
        )

    results: dict[str, dict[int, float]] = {}
    for copies in (1, 16, 64):
        ev = zipf_events(ev0, copies).localCheckpoint()
        # Dim side: one row per distinct key (the lookup a fact join does).
        dim = (
            ev.select("user_id").distinct()
            .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
            .localCheckpoint()
        )

        def join_plain():
            return ev.join(dim, "user_id").groupBy("segment").agg(
                F.sum("value").alias("v"), F.count("*").alias("n")
            )

        cases = {}

        def case_join_noaqe():
            set_conf(aqe_skew=False, broadcast=False)
            noop(join_plain())

        def case_join_aqe():
            set_conf(aqe_skew=True, broadcast=False)
            noop(join_plain())

        def case_join_salted():
            set_conf(aqe_skew=False, broadcast=False)
            noop(
                salted_equi_join(ev, dim, "user_id", buckets=32)
                .groupBy("segment")
                .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
            )

        def case_agg_plain():
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                ev.groupBy("user_id").agg(
                    F.sum("value").alias("v"), F.count("*").alias("n")
                )
            )

        def case_agg_salted():
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                salted_aggregate(
                    ev,
                    ["user_id"],
                    {"v": ("sum", "value"), "n": ("count", None)},
                    salt_col=F.xxhash64("event_id"),
                    buckets=32,
                )
            )

        # Window-operator skew (r10): the Zipf events carry their original
        # timestamps, so the hot user's whole history sorts on one task.
        evw = zipf_events(
            load_events(spark, base_dir).select(
                "event_id", "user_id", "event_type", "ts", "value"
            ),
            copies,
        ).localCheckpoint()
        evp2 = evw.select(
            "event_id", "user_id",
            F.unix_timestamp("ts").cast("long").alias("t"),
        )
        iv2 = (
            evp2.groupBy("user_id", F.floor(F.col("t") / 86400).alias("_d"))
            .agg(F.min("t").alias("s"))
            .withColumn("e", F.col("s") + 14400)
            .drop("_d")
        )

        def case_window_asof():
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                A.asof_join_backward(
                    evp2, iv2, "user_id", "user_id", "t", "s", ["e"]
                )
            )

        def case_window_asof_bucketed():
            # The r10-handoff mitigation, measured against its plain twin:
            # daily pre-buckets split the hot key's single window task
            # into ~span/86400 tasks, boundary carries stitched through
            # the per-bucket summary (asof.asof_join_backward_bucketed).
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                A.asof_join_backward_bucketed(
                    evp2, iv2, "user_id", "user_id", "t", "s", ["e"],
                    bucket_size=86400,
                )
            )

        def case_window_rle():
            set_conf(aqe_skew=True, broadcast=True)
            noop(SEQ.run_length_encode(evw))

        def case_window_rle_bucketed():
            # Daily pre-buckets + run-level stitch: the hot key's second
            # window sees its RUN count, not its row count.
            set_conf(aqe_skew=True, broadcast=True)
            noop(SEQ.run_length_encode_bucketed(evw, bucket_size=86400))

        def case_window_sweep():
            # r11: the prefix-scan shape (CUSUM drawup / ±1 concurrency
            # sweep) as a PLAIN single window per key — running sum AND
            # running min of it, the hot key's whole sequence on one task.
            set_conf(aqe_skew=True, broadcast=True)
            from pyspark.sql import Window as W

            w = (
                W.partitionBy("user_id")
                .orderBy("t", "event_id")
                .rowsBetween(W.unboundedPreceding, 0)
            )
            scanned = evp2.select(
                "user_id",
                F.sum(F.col("t") % 7 - 3).over(w).alias("s"),
                F.min(F.sum(F.col("t") % 7 - 3).over(w)).over(w).alias("m"),
            )
            noop(scanned)

        def case_window_sweep_bucketed():
            # r11 mitigation: operators/sequence.prefix_scan_bucketed —
            # daily buckets split the hot key's scan; carries + prefix
            # minima stitch through per-key windows over day summaries.
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                SEQ.prefix_scan_bucketed(
                    evp2.withColumn("_day", F.expr("t DIV 86400"))
                    .withColumn("_v", F.col("t") % 7 - 3),
                    key_col="user_id", order_cols=("t", "event_id"),
                    value_col="_v", bucket_col="_day",
                    out_sum="s", out_min="m",
                )
            )

        def case_window_lead():
            # r13 (VERDICT r12 item 7): the path/Markov LEAD shape —
            # events_top_transition_paths / events_markov_transitions /
            # events_user_sessions share this (key)-partitioned,
            # time-ordered window with LEADs; the hot key's whole
            # timeline sorts on ONE task, same class as window_rle's
            # first pass.
            set_conf(aqe_skew=True, broadcast=True)
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("t", "event_id")
            e1 = (F.col("t") % 5).cast("int")
            seq = evp2.select(
                "user_id",
                e1.alias("_e1"),
                F.lead(e1, 1).over(w).alias("_e2"),
                F.lead(e1, 2).over(w).alias("_e3"),
            )
            noop(
                seq.where(F.col("_e3").isNotNull())
                .groupBy("_e1", "_e2", "_e3")
                .agg(F.count("*").alias("n"))
            )

        def _markov_frame():
            return evp2.select(
                "user_id",
                F.col("t").cast("timestamp").alias("ts"),
                "event_id",
                (F.col("t") % 5).cast("string").alias("event_type"),
            )

        def case_window_lead_bucketed():
            # r13 mitigation: sequence.markov_transitions_bucketed —
            # LEAD locally within (key, day), boundary transitions
            # stitched from per-bucket first/last summaries
            # (value-identical; oracle is the plain window form).
            set_conf(aqe_skew=True, broadcast=True)
            noop(SEQ.markov_transitions_bucketed(_markov_frame(),
                                                 bucket_size=86400))

        def case_window_lead_plain():
            # The LEAD-1 plain twin of the mitigation above (markov
            # shape incl. its finalize, so the pair is like-for-like;
            # window_lead is the LEAD-2 trigram shape of the same
            # class).
            set_conf(aqe_skew=True, broadcast=True)
            noop(SEQ.markov_transitions(_markov_frame()))

        def _trigram_count(tri):
            return tri.groupBy("t0", "t1", "t2").agg(F.count("*").alias("n"))

        def case_window_lead2_plain():
            # r14 (VERDICT r13 item 4): the LEAD-2 measured pair — plain
            # two-LEAD per-key window over the markov frame with the
            # same trigram-count finalize as the bucketed twin.
            set_conf(aqe_skew=True, broadcast=True)
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("ts", "event_id")
            f = _markov_frame()
            tri = f.select(
                F.col("event_type").alias("t0"),
                F.lead("event_type", 1).over(w).alias("t1"),
                F.lead("event_type", 2).over(w).alias("t2"),
            ).where(F.col("t2").isNotNull())
            noop(_trigram_count(tri))

        def case_window_lead2_bucketed():
            # r14 mitigation: sequence.transition_trigrams_bucketed —
            # both LEADs local within (key, day), boundary trigrams
            # stitched from per-bucket first-2/last-2 summaries
            # (value-identical; plain-window oracle + brute-force
            # differentials in tests/test_r14_paths.py).
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                _trigram_count(
                    SEQ.transition_trigrams_bucketed(
                        _markov_frame(), bucket_size=86400
                    )
                )
            )

        evq = evp2.withColumn("_v", F.col("t") % 1000)

        def case_rank_window():
            # The pre-r12 quantile form: ROW_NUMBER rank stats over the
            # Zipf-keyed partitions — the hot key's whole value set sorts
            # on ONE task (the window-skew class salting can't fix).
            set_conf(aqe_skew=True, broadcast=True)
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("_v", "event_id")
            ranked = evq.select(
                "user_id",
                "_v",
                F.row_number().over(w).alias("rn"),
                F.count("*").over(W.partitionBy("user_id")).alias("n"),
            )
            noop(
                ranked.groupBy("user_id").agg(
                    F.min(
                        F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("_v"))
                    ).alias("med"),
                    F.min(
                        F.when(F.col("rn") == F.expr("(n * 9 + 9) DIV 10"), F.col("_v"))
                    ).alias("p90"),
                )
            )

        def case_rank_freq_table():
            # The r12 migrated form: one map-side-combined (key, value)
            # count aggregate — the hot key collapses to its DISTINCT
            # VALUE count per map partition before any shuffle; windows
            # run over the tiny count table.
            set_conf(aqe_skew=True, broadcast=True)
            noop(
                QT.freq_table_rank_stats(
                    evq.select("user_id", "_v"),
                    "user_id",
                    "_v",
                    {"med": "(n + 1) DIV 2", "p90": "(n * 9 + 9) DIV 10"},
                )
            )

        cases = {
            "join_plain_noaqe": case_join_noaqe,
            "join_plain_aqe": case_join_aqe,
            "join_salted": case_join_salted,
            "agg_plain": case_agg_plain,
            "agg_salted": case_agg_salted,
            "window_asof": case_window_asof,
            "window_asof_bucketed": case_window_asof_bucketed,
            "window_rle": case_window_rle,
            "window_rle_bucketed": case_window_rle_bucketed,
            "window_sweep": case_window_sweep,
            "window_sweep_bucketed": case_window_sweep_bucketed,
            "rank_window": case_rank_window,
            "rank_freq_table": case_rank_freq_table,
            "window_lead": case_window_lead,
            "window_lead_plain": case_window_lead_plain,
            "window_lead_bucketed": case_window_lead_bucketed,
            "window_lead2_plain": case_window_lead2_plain,
            "window_lead2_bucketed": case_window_lead2_bucketed,
        }
        for name, fn in cases.items():
            fn()  # warm (JIT, file listing); second run is the sample
            t = timed(fn)
            results.setdefault(name, {})[copies] = t
            print(f"copies={copies:2d} {name:18s} {t:7.2f}s", flush=True)
        ev.unpersist()
        dim.unpersist()
        evw.unpersist()
    set_conf(aqe_skew=True, broadcast=True)

    lines = [
        "",
        "## Zipf-skew probe (tools/skew_probe.py)",
        "",
        f"Base: `{base_dir}` events with user_id remapped to Zipf(s=2)-like",
        "keys (head key ~50% of rows), inflated 1x/16x/64x. Join cases run",
        "with broadcast DISABLED (a broadcastable dim is always the first",
        "fix; the probe measures the forced-shuffle path). Seconds, 2nd run.",
        "",
        "| case | 1x | 16x | 64x | x64/x1 |",
        "|---|---|---|---|---|",
    ]
    for name, by in results.items():
        ratio = round(by[64] / by[1], 1) if by[1] else float("nan")
        lines.append(f"| {name} | {by[1]} | {by[16]} | {by[64]} | {ratio} |")
    lines += [
        "",
        "Notes:",
        "- `join_salted` should stay near-flat-per-row where",
        "  `join_plain_noaqe` degrades superlinearly (the hot key's single",
        "  reducer); `join_plain_aqe` shows whether AQE's skew split already",
        "  rescues the plan at this data size (its thresholds are tuned for",
        "  256MB+ partitions, so at fixture scale it may not trigger).",
        "- `agg_plain` vs `agg_salted`: map-side partial aggregation already",
        "  collapses hot-key sum/count per map partition, so the plain path",
        "  is expected FLAT and salting buys nothing here — the measured",
        "  non-effect is the documented reason salted_aggregate is an",
        "  explicit opt-in for wide-state aggregations only.",
        "- `window_asof` / `window_rle` (r10): the skew case SALTING CANNOT",
        "  FIX — a (key)-partitioned time-ordered window puts the hot key's",
        "  whole sequence on one task, and order dependency rules out salt",
        "  splits. The measured growth is that one task's sort; the honest",
        "  100 TB mitigations are time-range pre-bucketing of the hot key",
        "  (split by coarse time, stitch the boundary carry) or tolerating",
        "  one straggler task per hot key — documented, not hidden.",
        "- `window_sweep` / `window_sweep_bucketed` (r11): the running",
        "  PREFIX-AGGREGATE shape (CUSUM drawup, +-1 concurrency sweep) —",
        "  plain form = one (key)-window computing the running sum AND the",
        "  running min of it; bucketed form = sequence.prefix_scan_bucketed",
        "  (daily local scans, carries + prefix minima stitched through",
        "  per-key day summaries; value-identical, unit-differentialed).",
        "  The delta under the 50%-mass key is the mitigation's measured",
        "  worth for the r11 cusum/concurrency queries.",
        "- `window_asof_bucketed` (r10 handoff): the pre-bucketing",
        "  mitigation IMPLEMENTED (asof.asof_join_backward_bucketed, daily",
        "  buckets): the hot key's window splits into per-(key, day) tasks",
        "  with a per-bucket carry stitch; value-identical to window_asof",
        "  (hypothesis differential), so the delta vs window_asof is pure",
        "  physical-shape gain under skew.",
        "- `window_rle_bucketed` (r10): same mitigation for RLE — local",
        "  runs per (key, day), then a second RLE over LOCAL RUNS whose",
        "  per-key cost is the run count, not the row count (the honest",
        "  bound: an every-row-alternating key gains nothing); identical",
        "  output (hypothesis differential vs the plain form).",
        "- `rank_window` / `rank_freq_table` (r12): the quantile-migration",
        "  pair — ROW_NUMBER rank stats over Zipf-keyed partitions (the hot",
        "  key's whole value set sorts on ONE task) vs the frequency-table",
        "  decomposition (operators/quantiles.py: one map-side-combined",
        "  (key, value) count aggregate collapses the hot key to its",
        "  DISTINCT-VALUE count per map partition BEFORE any shuffle;",
        "  windows run over the tiny count table). Value-identical (unit",
        "  differentials + unchanged oracles on all five migrated queries);",
        "  the delta is the r12 migration's measured worth.",
        "- `window_lead` / `window_lead_plain` / `window_lead_bucketed`",
        "  (r13, VERDICT r12 item 7): the path/Markov LEAD family —",
        "  `window_lead` is the LEAD-2 trigram shape",
        "  (events_top_transition_paths) as the plain per-key window;",
        "  `window_lead_plain` vs `window_lead_bucketed` is the measured",
        "  LEAD-1 pair: sequence.markov_transitions vs",
        "  markov_transitions_bucketed (r13 — local LEAD within (key, day),",
        "  boundary transitions stitched from per-bucket first/last-type",
        "  summaries; value-identical, plain-window oracle). The LEAD-n",
        "  generalization needs first-n/last-n summaries (a path spanning",
        "  3+ buckets forces middle buckets to hold exactly one event, so",
        "  n rows per side always suffice) — SHIPPED in r14, next row.",
        "- `window_lead2_plain` / `window_lead2_bucketed` (r14, VERDICT",
        "  r13 item 4): the LEAD-2 pair — the plain two-LEAD trigram",
        "  window (events_top_transition_paths) vs",
        "  sequence.transition_trigrams_bucketed (both LEADs local within",
        "  (key, day); boundary trigrams stitched from per-bucket",
        "  first-2/last-2 summaries via LAG-1/LAG-2 over the tiny per-key",
        "  bucket window — a 3-bucket span forces the middle bucket to one",
        "  event, so 2 rows per side suffice). Value-identical: plain-",
        "  window oracle + brute-force and full-stream differentials in",
        "  tests/test_r14_paths.py; the delta is the mitigation's measured",
        "  worth for the path query under the 50%-mass key.",
        "",
    ]
    # Replace THIS probe's section in place (re-runs must not duplicate
    # it); preserve everything before and any later sections after it.
    section = "## Zipf-skew probe (tools/skew_probe.py)"
    body = "\n".join(lines)
    old = open(out_md).read() if os.path.exists(out_md) else ""
    idx = old.find("\n" + section)
    if idx >= 0:
        end = old.find("\n## ", idx + 1)
        old = old[:idx] + (old[end:] if end >= 0 else "")
    with open(out_md, "w") as f:
        f.write(old.rstrip("\n") + "\n" + body)
    print(f"rewrote section in {out_md}")
    spark.stop()


if __name__ == "__main__":
    main()
