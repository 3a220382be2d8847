"""Adamic-Adar decomposition probe (r10 s2): decompose the wedge
enumeration's wall into wedge VOLUME vs per-wedge cost, the same
output-growth-vs-unit-cost method that settled the semantic_dedup /
curation_funnel / interval_overlap watches.

    python tools/aa_probe.py [base_sf_dir]

wedges = sum over centers with deg >= 2 of deg*(deg-1)/2 — exactly the
rows the adjacency self-join produces; candidates = distinct scored
non-adjacent pairs (the aggregate's output). If s-per-million-wedges
stays flat (or falls), the 16x curve is wedge-volume growth, not
operator degradation.

Appends/replaces its own section in SCALING.md (other tools' sections
preserved)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from analyzing_big_data_in_scala_spark.operators import graph as G  # noqa: E402
from analyzing_big_data_in_scala_spark.session import get_spark  # noqa: E402
from analyzing_big_data_in_scala_spark.sources.catalog import load_events  # noqa: E402
from tools.scale_probe import inflate, timed  # noqa: E402

SECTION = "## Adamic-Adar decomposition (tools/aa_probe.py)"
SURVIVAL_SECTION = "## Adamic-Adar cap survival (tools/aa_probe.py)"


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    spark = get_spark("aa-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev0 = load_events(spark, base)

    def noop(df: DataFrame) -> None:
        df.write.mode("overwrite").format("noop").save()

    rows = []
    for copies in (1, 4, 16):
        ev = inflate(ev0, copies, ["event_id", "user_id"], 10_000_000).localCheckpoint()
        edges = G.edges_from_events(ev)
        fn = lambda: noop(G.adamic_adar_topk(edges, k=20))  # noqa: E731
        fn()  # warm
        t = timed(fn)
        e = G.canonical_undirected(edges).localCheckpoint(eager=False)
        deg = (
            e.select(F.col("a").alias("id"))
            .union(e.select(F.col("b").alias("id")))
            .groupBy("id").agg(F.count("*").alias("d"))
        )
        wedges = deg.filter(F.col("d") >= 2).agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
        ).first()["w"]
        cands = G.adamic_adar_topk(edges, k=None).count()
        rows.append((copies, t, int(wedges or 0), int(cands)))
        print(f"adamic_adar x{copies}: wall={t}s wedges={int(wedges):,} "
              f"candidates={int(cands):,}", flush=True)

    t1, w1 = rows[0][1], rows[0][2]
    lines = [
        SECTION,
        "",
        "Wedge volume = Σ deg·(deg−1)/2 over centers with deg ≥ 2 (the",
        "adjacency self-join's exact output); candidates = distinct scored",
        "non-adjacent pairs. Inflation adds users (disjoint graph regions),",
        "so wedge volume should track input ~linearly on this fixture.",
        "",
        "| copies | wall (s) | time/x1 | wedges | wedges/x1 | candidates | s per 1M wedges |",
        "|---|---|---|---|---|---|---|",
    ]
    # A fixture with no deg>=2 centers has zero wedges; report "n/a"
    # instead of dividing by zero.
    def _r(num, den, nd=1):
        return round(num / den, nd) if den else "n/a"

    for copies, t, w, c in rows:
        lines.append(
            f"| {copies} | {t} | {round(t / t1, 1)} | {w:,} | "
            f"{_r(w, w1)} | {c:,} | {_r(t, w / 1e6 if w else 0, 2)} |"
        )
    tL, wL = rows[-1][1], rows[-1][2]
    lines += [
        "",
        f"**Measured conclusion**: {rows[-1][0]}x data -> "
        f"{round(tL / t1, 1)}x wall against {_r(wL, w1)}x wedges —",
        f"per-wedge cost at the top of the curve is "
        f"{_r(tL / wL if wL else 0, t1 / w1 if w1 else 0, 2)}x the 1x cost (<=1 means the",
        "enumeration is linear in its own output and the wall tracks wedge",
        "volume, the operator's inherent cost; the max_center_degree dial",
        "caps that volume on hub-heavy graphs).",
        "",
    ]
    body = "\n".join(lines)
    _replace_section(out_md, SECTION, body)

    # --- Cap-survival probe (r12, VERDICT r11 item 6): how much of the
    # UNCAPPED top-20 survives under max_center_degree 95/256/1024 at
    # each inflation — the measured guidance for the exactness-vs-cost
    # dial the capped query exposes.
    surv_rows = []
    for copies in (1, 4, 16):
        ev = inflate(ev0, copies, ["event_id", "user_id"], 10_000_000).localCheckpoint()
        edges = G.edges_from_events(ev).localCheckpoint(eager=False)
        top = G.adamic_adar_topk(edges, k=20)
        exact = {(r.u, r.v) for r in top.collect()}  # 20 rows, tools-only
        deg_max = (
            G.canonical_undirected(edges)
            .select(F.col("a").alias("id"))
            .union(G.canonical_undirected(edges).select(F.col("b").alias("id")))
            .groupBy("id").agg(F.count("*").alias("d"))
            .agg(F.max("d")).first()[0]
        )
        for cap in (95, 256, 1024):
            fn = lambda: noop(  # noqa: E731
                G.adamic_adar_topk(edges, k=20, max_center_degree=cap)
            )
            fn()  # warm
            t_cap = timed(fn)
            capped = {
                (r.u, r.v)
                for r in G.adamic_adar_topk(
                    edges, k=20, max_center_degree=cap
                ).collect()
            }
            surv_rows.append((copies, cap, len(exact & capped), t_cap, deg_max))
            print(
                f"aa cap x{copies} cap={cap}: survive={len(exact & capped)}/20 "
                f"wall={t_cap}s max_deg={deg_max}",
                flush=True,
            )

    s_lines = [
        SURVIVAL_SECTION,
        "",
        "How many of the UNCAPPED top-20 Adamic-Adar pairs survive when",
        "`max_center_degree` drops celebrity centers before wedge",
        "enumeration (the cost dial: a center of degree d contributes",
        "d(d-1)/2 wedges). Survival 20/20 means the cap is free ACCURACY-",
        "wise at that scale; wall shows what it buys.",
        "",
        "| copies | max degree seen | cap | top-20 survive | capped wall (s) |",
        "|---|---|---|---|---|",
    ]
    for copies, cap, surv, t_cap, deg_max in surv_rows:
        s_lines.append(f"| {copies} | {deg_max} | {cap} | {surv}/20 | {t_cap} |")
    by_cap = {
        cap: min(s for c, cp, s, t, d in surv_rows if cp == cap)
        for cap in (95, 256, 1024)
    }
    safe = [cap for cap, s in sorted(by_cap.items()) if s == 20]
    rec = (
        f"cap {safe[0]}" if safe else "no measured cap preserves the full top-20"
    )
    max_deg_seen = max(d for _, _, _, _, d in surv_rows)
    s_lines += [
        "",
        "**Measured recommendation**: smallest cap preserving the full",
        f"top-20 at every measured inflation: **{rec}** (this fixture's",
        f"degree tail tops out at {max_deg_seen}, so a cap BELOW the tail",
        "excludes the very centers the uncapped top-20 routes through —",
        "survival collapses, the capped ranking is a different measure —",
        "while a cap clearing the tail is exactness-free; default the dial",
        "to ~1.5-2x the observed p99.9 degree and treat anything tighter as",
        "a deliberate semantics change. The registered",
        "graph_adamic_adar_capped query ships cap 95 as that deliberate",
        "hub-excluding measure, value-verified by its own oracle at sf0.01;",
        "on hub-heavier graphs re-run this probe — survival is a property",
        "of the degree tail, not of the operator).",
        "",
    ]
    _replace_section(out_md, SURVIVAL_SECTION, "\n".join(s_lines))
    spark.stop()


def _replace_section(out_md: str, section: str, body: str) -> None:
    old = open(out_md).read() if os.path.exists(out_md) else ""
    # The section can sit at the very start of the file, where the
    # "\n"-prefixed find misses it and a re-run would duplicate it.
    idx = 0 if old.startswith(section) else old.find("\n" + section)
    if idx >= 0:
        end = old.find("\n## ", idx + 1)
        old = old[:idx] + (old[end:] if end >= 0 else "")
    with open(out_md, "w") as f:
        f.write(old.rstrip("\n") + "\n\n" + body + "\n")
    print(f"rewrote section {section!r} in {out_md}")


if __name__ == "__main__":
    main()
