"""DataFrame-native graph analytics (SURVEY.md §2.10 G1-G7).

The reference uses GraphFrames (StandaloneScala/EpinionsGraphFrameAnalysis.scala)
plus a hand-rolled DataFrame PageRank (StandaloneScala/PageRank.scala).
GraphFrames is not available here, and the hand-rolled loop grows an
unbounded lineage (SURVEY.md §4.3.2) — so every algorithm below is a plain
DataFrame program with `localCheckpoint()` lineage cuts per iteration.

A graph is just `(vertices_df, edges_df)` — edges have `src`/`dst` columns
(StandaloneScala/EpinionsGraphFrameAnalysis.scala:56-61).

Scale posture: degrees are single hash aggregations; triangle counting
canonicalizes + dedups edges first (halves the join input) and joins on
vertex keys — AQE's skew-join handles hot vertices; the iterative loops
shuffle once per iteration on the vertex key and checkpoint to keep the
plan O(1) deep regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Fan-out widening lives in _util.fan_out_ready (rationale + the r14
# probe-safety measurement are documented THERE, once — ADVICE r14: the
# module-local wrapper duplicated the ~20-line docstring).
from ._util import fan_out_ready as _fan_out_ready


def edges_from_events(events: DataFrame) -> DataFrame:
    """Derive a deterministic directed edge list from the `events` fixture
    (FIXTURES.md §2): consecutive events inside each (event_type, day)
    partition, ordered by event_id, contribute edge
    user_id(i) -> user_id(i+1). Self-loops dropped.

    Partitioning by (event_type, day) keeps window partitions bounded as
    data grows — no global single-partition sort at 100 TB. The day key is
    floor(epoch/86400), not to_date(), so it is session-timezone-independent
    (matches DuckDB's epoch() on the same parquet instants).
    """
    day = F.floor(F.unix_timestamp("ts") / 86400)
    w = Window.partitionBy("event_type", day).orderBy("event_id")
    return (
        events.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """G2 (EpinionsGraphFrameAnalysis.scala:66): edge count per src."""
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_degree"))


def in_degrees(edges: DataFrame) -> DataFrame:
    """G3 (EpinionsGraphFrameAnalysis.scala:79): edge count per dst."""
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges with src < dst (prep for triangles/CC)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, cache_oriented: bool = True) -> DataFrame:
    """G6 (EpinionsGraphFrameAnalysis.scala:121): triangles per vertex.

    Degree-ordered enumeration (the MapReduce triangle-counting standard,
    Suri & Vassilvitskii WWW'11): orient every undirected edge from the
    (degree, id)-SMALLER endpoint to the larger, build wedges by
    self-joining on the center's OUT-edges, close them against the
    oriented edge set. Each triangle is found exactly once, and wedge
    fan-out per vertex is bounded by its oriented out-degree — O(sqrt(m))
    even for celebrity vertices — so the intermediate wedge relation stays
    near-linear on skewed graphs where id-ordered enumeration explodes
    quadratically. Output is identical to any other exactly-once
    enumeration: (id, triangles) for vertices in >= 1 triangle.

    ``cache_oriented`` materializes the oriented edge list, used four
    times in the plan, via a lazy localCheckpoint (reclaimed when the
    DataFrame is GC'd — no session-lifetime cache leak). The canonical
    edge set (3 consumers) and the degree table (2 consumers: both sides
    of the degree join) are always materialized: without that, Catalyst
    re-plans the full edges-from-source derivation per consumer (observed
    20 source scans in the composed plan).
    """
    e = canonical_undirected(edges).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    ).localCheckpoint(eager=False)
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    if cache_oriented:
        # NOT _fan_out_ready (r14): the degree-ordered orientation bounds
        # wedge fan-out by sqrt(m), so the fixture's wedge volume is small
        # enough that the extra exchange + 32-way task scheduling across
        # this plan's 4 consumers measured SLOWER (5.2 s vs 2.2 s) than
        # the coalesced 2-task compute. The link-prediction scaffold's
        # unbounded deg(w)^2 fan-out is the shape that needs it.
        oriented = oriented.localCheckpoint(eager=False)
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    # Wedges centered at u over its out-neighbors; x<y dedups the pair.
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # Close the wedge: the third edge is oriented (x,y) or (y,x).
    c1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    c2 = oriented.select(F.col("v").alias("x"), F.col("u").alias("y"))
    closing = c1.union(c2)
    tri = wedges.join(closing, ["x", "y"])
    return (
        tri.select(F.explode(F.array("u", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )


def _vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.15,
    max_iterations: int = 10,
    reference_semantics: bool = False,
    checkpoint_every: int = 2,
    tol: float | None = None,
) -> DataFrame:
    """Iterative PageRank as a DataFrame fixpoint loop.

    Default mode (standard-ish, GraphFrames-style damping
    EpinionsGraphFrameAnalysis.scala:93): init 1/N, out-degree counts every
    parallel edge, vertices with no in-links keep the teleport term via a
    left join on the full vertex set.

    `reference_semantics=True` reproduces StandaloneScala/PageRank.scala
    exactly, including its quirks (SURVEY.md Q3-Q5):
      Q3 init rank = 10.0 (:17,42), not 1/N;
      Q4 inner joins (:54,63) so vertices without in-links drop out after
         iteration 1 and dangling mass vanishes;
      Q5 in-links dedup parallel edges via collect_set (:33) while
         out-degree `count` (:30) does not.

    Each iteration ends with `localCheckpoint()` so the logical plan stays
    O(1) deep instead of growing linearly (SURVEY.md §4.3.2).

    `tol`: GraphFrames-style convergence (EpinionsGraphFrameAnalysis.scala:93
    `.tol(0.01)`) — stop when max |Δrank| < tol, checked at checkpoint
    boundaries (the rank frame is materialized there anyway, so the check
    costs one cheap max-aggregate, not an extra pass).

    Returns (id, pagerank).
    """
    vertices = _vertices_from_edges(edges)
    n = vertices.count()

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))  # Q5: counts parallel edges

    if reference_semantics:
        # Q5: contributions flow over DEDUPED edges (collect_set at :33 ==
        # distinct src per dst once exploded at :48).
        flow_edges = edges.select("src", "dst").distinct()
        init_rank = 10.0  # Q3
        join_mode = "inner"  # Q4
    else:
        flow_edges = edges.select("src", "dst")
        init_rank = 1.0 / n
        join_mode = "left"

    # Pre-join edge->out_deg once; this is loop-invariant. Lazy
    # checkpoints (r15): one RDD shared by every iteration inside the
    # final action — materialized on first use, no separate blocking job.
    contrib_edges = flow_edges.join(out_deg, "src").localCheckpoint(eager=False)

    ranks = vertices.select("id", F.lit(float(init_rank)).alias("pagerank")).localCheckpoint(eager=False)

    for i in range(max_iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id, "inner")
            .select(
                F.col("dst").alias("id"),
                (F.col("pagerank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("mass"))
        )
        if join_mode == "left":
            updated = vertices.join(contribs, "id", "left").select(
                "id",
                (F.lit(alpha / n) + F.lit(1 - alpha) * F.coalesce("mass", F.lit(0.0))).alias("pagerank"),
            )
        else:
            # Reference formula at PageRank.scala:66 with inner-join dropout.
            updated = contribs.select(
                "id",
                (F.lit(alpha / n) + F.lit(1 - alpha) * F.col("mass")).alias("pagerank"),
            )
        at_checkpoint = (i + 1) % checkpoint_every == 0 or (i + 1) == max_iterations
        if at_checkpoint and tol is not None:
            # eager=False: the delta probe right below materializes the
            # blocks in its own job (r15).
            updated = updated.localCheckpoint(eager=False)
            delta = (
                updated.alias("u")
                .join(ranks.select("id", F.col("pagerank").alias("prev")), "id", "left")
                .agg(F.max(F.abs(F.col("pagerank") - F.coalesce("prev", F.lit(0.0)))).alias("d"))
                .first()["d"]
            )
            ranks = updated
            if delta is not None and delta < tol:
                break
        else:
            # eager=False: single consumer (the next iteration / the final
            # action) — the lineage cut is what matters, not when the
            # blocks land; eager paid one blocking job per boundary (r15).
            ranks = updated.localCheckpoint(eager=False) if at_checkpoint else updated

    return ranks


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """G5 (EpinionsGraphFrameAnalysis.scala:107): undirected connected
    components via min-label propagation to fixpoint.

    Each iteration: every vertex takes min(own label, neighbors' labels)
    over symmetrized edges; stop when no label changes. O(diameter)
    iterations; `localCheckpoint()` per iteration cuts lineage exactly
    where GraphFrames needed its checkpoint dir (:45).

    Returns (id, component) with component = min vertex id in component.
    """
    # Lazy checkpoints (r15): each round's change count materializes the
    # round's blocks in the same job — see connected_components_two_phase.
    und = canonical_undirected(edges)
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint(eager=False)

    labels = _vertices_from_edges(edges).select("id", F.col("id").alias("component")).localCheckpoint(eager=False)

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def connected_components_two_phase(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """G5 via alternating large-star / small-star (the 'Connected
    Components in MapReduce and Beyond' algorithm): converges in O(log n)
    rounds vs. O(graph diameter) for plain label propagation — the scale
    path for high-diameter graphs (long chains, road networks).

    large-star: every node links its LARGER neighbors to the minimum of
    its neighborhood; small-star: every node links its smaller-or-equal
    neighbors to that minimum. Alternating the two contracts every
    component to a star rooted at its minimum vertex id.

    Returns (id, component) — identical output contract to
    :func:`connected_components` (tested equal).
    """
    # Lazy checkpoint (r15, guide §1/§5 job-chain cut): the first round's
    # signature aggregate below materializes the blocks inside its own
    # job — the old EAGER checkpoint paid a separate blocking job per
    # round for the same blocks (2 driver syncs per round instead of 1).
    e = canonical_undirected(edges).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).localCheckpoint(eager=False)
    vertices = _vertices_from_edges(edges)

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        grouped = sym.groupBy("u").agg(
            F.min("v").alias("min_nbr"), F.collect_set("v").alias("nbrs")
        )
        out = grouped.select(
            "u",
            F.least("min_nbr", F.col("u")).alias("m"),
            F.explode("nbrs").alias("v"),
        ).filter(F.col("v") > F.col("u"))
        return out.select(F.col("v").alias("u"), F.col("m").alias("v")).filter(
            F.col("u") != F.col("v")
        ).distinct()

    def small_star(ed: DataFrame) -> DataFrame:
        # point every edge at the smaller endpoint: (u, v) with v < u
        pointed = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        grouped = pointed.groupBy("u").agg(
            F.min("v").alias("m"), F.collect_set("v").alias("nbrs")
        )
        nbr_edges = grouped.select("u", "m", F.explode("nbrs").alias("v")).filter(
            F.col("v") != F.col("m")
        ).select(F.col("v").alias("u"), F.col("m").alias("v"))
        self_edges = grouped.select("u", F.col("m").alias("v"))
        return nbr_edges.union(self_edges).filter(F.col("u") != F.col("v")).distinct()

    prev_sig = None
    for _ in range(max_iterations):
        # eager=False: the signature .first() right below both computes
        # the round AND persists the checkpoint blocks in one job.
        e = small_star(large_star(e)).localCheckpoint(eager=False)
        # Overflow-safe content signature (ANSI mode: bigint sums can
        # throw): sum of 30-bit hash residues stays far below 2^63.
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 30))), F.lit(0)
            ).alias("s"),
        ).first()
        sig = (sig["n"], sig["s"])
        if sig == prev_sig:
            break
        prev_sig = sig

    # e is now a star forest: (child, root). Roots appear only as targets.
    child_root = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = vertices.join(child_root, "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return child_root.union(roots)


def component_sizes(components: DataFrame) -> DataFrame:
    """Community sizes (EpinionsGraphFrameAnalysis.scala:108)."""
    return components.groupBy("component").agg(F.count("*").alias("size"))


def bfs_hops(
    edges: DataFrame, seeds: DataFrame | None = None, max_iterations: int = 30
) -> DataFrame:
    """Unweighted single/multi-source shortest hop counts over the
    UNDIRECTED graph: (id, hops) for every vertex reachable from the seed
    set within `max_iterations` hops (unreachable vertices are absent).

    `seeds` is a 1-column (id) frame; default = the global min vertex id
    (deterministic, so the query layer can oracle it with a recursive
    CTE). Distributed frontier expansion, the Pregel BFS shape:

    - per round, ONLY the frontier joins the (checkpointed, symmetric)
      edge list — work per round is O(edges incident to the frontier),
      not O(E);
    - newly-discovered vertices = candidates anti-joined against the
      settled set; rounds end when the frontier empties (≤ graph
      diameter, the `while` has a hard cap);
    - `localCheckpoint` per round cuts the growing lineage exactly like
      the other iterative operators here.
    """
    sym = (
        canonical_undirected(edges)
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    # Lazy checkpoints throughout this loop (r15): every frame is
    # materialized by the round's own frontier-emptiness probe (or the
    # next round's), so the old eager checkpoints each paid an extra
    # blocking job per round for blocks the probe job persists anyway.
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint(eager=False)
    if seeds is None:
        # Seed from the TRAVERSAL edge set (sym excludes self-loops via
        # canonical_undirected), not the raw vertex set: a global-min vertex
        # with only self-loop edges exists in _vertices_from_edges but not in
        # sym, and seeding it would diverge from the min(u)-over-sym
        # definition the SQL oracles use.
        seeds = sym.agg(F.min("u").alias("id"))

    settled = seeds.select("id", F.lit(0).cast("int").alias("hops")).localCheckpoint(eager=False)
    frontier = settled
    for _ in range(max_iterations):
        candidates = (
            sym.join(frontier.select(F.col("id").alias("u"), "hops"), "u")
            .select(F.col("v").alias("id"), (F.col("hops") + 1).alias("hops"))
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
        )
        new = candidates.join(settled.select("id"), "id", "left_anti").localCheckpoint(eager=False)
        if new.isEmpty():
            break
        settled = settled.union(new).localCheckpoint(eager=False)
        frontier = new
    return settled


def sssp_weighted(
    edges: DataFrame,
    weight: Column | None = None,
    seeds: DataFrame | None = None,
    max_hops: int = 15,
) -> DataFrame:
    """Single/multi-source shortest WEIGHTED distances over the undirected
    graph: frontier-pruned Bellman-Ford. Returns (id, dist) — the minimum
    total weight over paths of at most `max_hops` edges (at convergence,
    the true shortest distance; the explicit cap makes the semantics
    engine-independent and oracle-expressible as a depth-capped recursive
    CTE).

    `weight` is an expression over the canonical undirected edge columns
    (a, b); default = 1 + portable_hash64("a:b") % 9, a deterministic
    per-edge weight both engines can re-derive. Round k relaxes exactly
    the paths with k edges (improvements cascade through the frontier),
    so running `min(max_hops, until-frontier-empty)` rounds equals full
    Bellman-Ford truncated at `max_hops` — and each round joins ONLY the
    improved vertices against the (checkpointed) edge list, the same
    work-bound-by-frontier shape as :func:`bfs_hops`.
    """
    from ..functions.text import portable_hash64

    und = canonical_undirected(edges)
    if weight is None:
        weight = (
            F.pmod(portable_hash64(F.concat_ws(":", F.col("a"), F.col("b"))), F.lit(9))
            + 1
        )
    w_edges = und.select("a", "b", weight.cast("long").alias("w"))
    # Lazy checkpoints (r15): the per-round emptiness probe materializes
    # the blocks — see bfs_hops.
    sym = w_edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).union(
        w_edges.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    ).localCheckpoint(eager=False)

    if seeds is None:
        # Same seed definition as bfs_hops: min vertex of the self-loop-free
        # symmetric edge set, matching the oracle's MIN(u) FROM sym.
        seeds = sym.agg(F.min("u").alias("id"))
    settled = seeds.select("id", F.lit(0).cast("long").alias("dist")).localCheckpoint(eager=False)
    frontier = settled
    for _ in range(max_hops):
        cand = (
            sym.join(frontier.select(F.col("id").alias("u"), "dist"), "u")
            .select(F.col("v").alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(settled, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=False)
        )
        if improved.isEmpty():
            break
        settled = (
            settled.union(improved)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        frontier = improved
    return settled


def kcore_vertices(
    edges: DataFrame, k: int = 3, max_iterations: int = 30
) -> DataFrame:
    """k-core decomposition (Seidman 1983) by iterative peeling: drop every
    vertex whose degree in the REMAINING subgraph is < k, repeat until
    stable. Returns (id, core_degree) for the surviving vertices — the
    maximal subgraph where everyone has >= k neighbors (the standard
    dense-region / spam-ring / influential-community primitive).

    Distributed shape per round: one degree aggregate + two semi joins to
    drop edges incident to peeled vertices — work is O(remaining edges),
    monotonically shrinking; `localCheckpoint` cuts lineage exactly like
    the other iterative operators here. Peeling converges in at most
    |V| rounds but practically in a handful; the cap bounds the loop and
    the early-exit fires on the first stable round. Self-loops are
    excluded (canonical_undirected), matching the SQL oracle's edge set.
    """
    if k < 1:
        raise ValueError(f"kcore_vertices: need k >= 1, got {k}")
    und = canonical_undirected(edges)
    # Lazy checkpoints (r15): each round's convergence count materializes
    # the blocks in the same job — see bfs_hops.
    cur = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )
    prev_edges = cur.count()
    converged = prev_edges == 0
    for _ in range(max_iterations):
        if converged:
            break
        keep = (
            cur.groupBy("u")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        nxt = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        n = nxt.count()
        cur = nxt
        converged = n == prev_edges
        prev_edges = n
    if not converged:
        # Returning a partially-peeled subgraph would be a silently-wrong
        # k-core (vertices with degree < k still present) AND diverge from
        # the fixed-stage SQL oracle — refuse loudly instead.
        raise RuntimeError(
            f"kcore_vertices: peeling did not converge within {max_iterations} "
            f"rounds ({prev_edges} directed edges remain) — raise max_iterations "
            f"(and keep the oracle's unrolled stage count >= it)"
        )
    return (
        cur.groupBy("u")
        .agg(F.count("*").alias("core_degree"))
        .select(F.col("u").alias("id"), "core_degree")
    )


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label propagation community detection (Raghavan et al.
    2007; the GraphFrames `labelPropagation` counterpart) made fully
    DETERMINISTIC: every vertex starts labeled with its own id; each round
    every vertex simultaneously adopts the most frequent label among its
    UNDIRECTED neighbors, ties broken by SMALLEST label. Returns
    (id, label) after exactly `rounds` rounds.

    Fixed horizon, not convergence: synchronous LPA can oscillate forever
    between two colorings (any bipartite-ish region), so "run until
    stable" is not well-defined — a fixed round count keeps the result an
    engine-independent pure function of the graph, which is what lets an
    unrolled-CTE oracle re-derive it value-for-value (the pagerank
    precedent applied to community detection).

    Scale shape per round: ONE equi-join (undirected edges x labels, both
    hash-partitioned on the join key) + two hash aggregates — the
    (id, label) count and the per-id argmax via min_by over a
    (-count, label) struct (total order, no window, map-side partials).
    Labels are lineage-cut per round like the pagerank loop."""
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for i in range(rounds):
        nbr = und.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        counts = nbr.groupBy("id", "label").agg(F.count("*").alias("n"))
        labels = counts.groupBy("id").agg(
            F.min_by(
                "label",
                F.struct((-F.col("n")).alias("nn"), F.col("label").alias("lb")),
            ).alias("label")
        )
        # Lineage cut every 2 rounds (r15 — the pagerank/hits/ppr cadence
        # dial, see tools/graph_cadence_probe.py): mid-loop labels is
        # single-consumer, so the cut is plan-depth control only.
        if (i + 1) % 2 == 0 or (i + 1) == rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.15,
    iterations: int = 10,
) -> DataFrame:
    """Personalized PageRank / TrustRank (Gyongyi et al. 2004): the
    teleport distribution is uniform over `seeds` (a 1-column id frame)
    instead of uniform over all vertices, so score mass flows outward
    from the seed set — the trust/quality-propagation primitive a
    curation pipeline runs with a hand-audited seed list (trusted
    domains, vetted sources). Returns (id, ppr) for EVERY vertex
    (non-seeds reachable only via teleport score 0 — kept, because "has
    zero trust" is the signal).

    Same loop discipline as :func:`pagerank` (fixed iterations,
    localCheckpoint lineage cuts, loop-invariant out-degree join); init
    r0 = the teleport vector itself. Deterministic for a fixed seed set,
    so the whole fixpoint value-checks against an unrolled-CTE oracle."""
    vertices = _vertices_from_edges(edges)
    seed_ids = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Lazy checkpoints (r15): both frames are single RDDs shared by every
    # iteration of the final action — materialized on first use.
    contrib_edges = edges.select("src", "dst").join(out_deg, "src").localCheckpoint(eager=False)
    # Teleport vector: 1/|S| on seeds, 0 elsewhere — also the init.
    tele = vertices.join(
        seed_ids.withColumn("_s", F.lit(1)), "id", "left"
    ).select(
        "id",
        F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias("tele"),
    ).localCheckpoint(eager=False)
    ranks = tele.select("id", F.col("tele").alias("ppr"))
    for i in range(iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id, "inner")
            .select(
                F.col("dst").alias("id"),
                (F.col("ppr") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = tele.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(alpha) * F.col("tele")
                + F.lit(1 - alpha) * F.coalesce("mass", F.lit(0.0))
            ).alias("ppr"),
        )
        # Lineage cut every 2 rounds (r15 — the pagerank checkpoint_every
        # dial): mid-loop ranks is single-consumer, so the cut is pure
        # plan-depth control; halving the persisted block sets measured
        # 2.92 s -> 2.53 s (tools/graph_cadence_probe.py, bit-identical).
        if (i + 1) % 2 == 0 or (i + 1) == iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame, iterations: int = 8, checkpoint_every: int = 2
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), fixed-iteration power
    method with L2 normalization each half-step:

        auth_i(v) = Σ_{u→v} hub_{i-1}(u)   then auth_i /= ‖auth_i‖₂
        hub_i(u)  = Σ_{u→v} auth_i(v)      then hub_i  /= ‖hub_i‖₂

    Returns (id, auth, hub) for EVERY vertex (vertices with no in-links
    have auth 0, no out-links hub 0 — kept, absence of endorsement is the
    signal). Same loop discipline as :func:`pagerank`: fixed iterations
    (deterministic → value-checkable by an unrolled-CTE oracle), lazy
    `localCheckpoint` lineage cuts on every frame consumed twice (the
    edge list feeds both half-steps; each raw half-step sum feeds its
    L2 norm AND the divide — without the cut each consumer re-runs the
    whole upstream chain). Each half-step is one equi-join + one hash
    aggregate; the L2 norm is a 1-row aggregate broadcast back —
    nothing is collected to the driver.

    ``checkpoint_every`` (r15, the same dial as :func:`pagerank`):
    mid-loop auth/hub are SINGLE-consumer frames, so their lineage cut
    is plan-depth control, not dedup — cutting every 2 iterations
    persists half the corpus-scale block sets for identical values
    (checkpoints never change results; interleaved warm A/B in
    tools/graph_cadence_probe.py: 4.09 s → 3.33 s at sf0.1,
    bit-identical output).
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    # vertices is consumed by the init AND the final zero-fill; the edge
    # list by both half-steps of every iteration — lineage cuts on both.
    vertices = _vertices_from_edges(edges).localCheckpoint(eager=False)
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    # The loop iterates on NONZERO-support frames only: a zero score
    # contributes nothing to the next half-step's sums and nothing to the
    # L2 norm, so carrying the full vertex set through every iteration
    # (a per-half-step left join) is pure overhead — zeros are filled in
    # ONCE at the end. After iteration 1 the auth support is exactly the
    # in-link'd vertices and the hub support the out-link'd ones.
    hub = vertices.select("id", F.lit(1.0).alias("hub"))
    auth = None
    for i in range(iterations):
        araw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
            .localCheckpoint(eager=False)  # consumed by norm AND divide
        )
        an = araw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        # try_divide: an all-zero iterate (edgeless graph) yields NULL
        # -> dropped support, matching DuckDB's x/0.0 contract.
        auth = (
            araw.crossJoin(F.broadcast(an))
            .select(
                F.col("dst").alias("id"),
                F.try_divide("s", "n").alias("auth"),
            )
        )
        hraw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
            .localCheckpoint(eager=False)
        )
        hn = hraw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        hub = (
            hraw.crossJoin(F.broadcast(hn))
            .select(
                F.col("src").alias("id"),
                F.try_divide("s", "n").alias("hub"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or (i + 1) == iterations:
            # auth is consumed by the hub step AND (on the last round)
            # the output; the cadence cut keeps plan depth constant.
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    return (
        vertices.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )


# Per-center Adamic–Adar contribution in integer ppm, shared VERBATIM by
# the Spark plan and the DuckDB oracle. ln() is not a correctly-rounded
# IEEE op, so the quantization happens at the per-CENTER site (one ln per
# vertex — the bm25 recipe): downstream sums are exact BIGINT adds in any
# order. Centers need >= 2 neighbors to form a wedge, so deg >= 2 and
# LN(deg) > 0 wherever this evaluates.
AA_CONTRIB_PPM_SQL = (
    "CAST(ROUND(1000000.0 / LN(CAST(deg AS DOUBLE))) AS BIGINT)"
)


def _wedge_candidate_pairs(
    edges: DataFrame,
    max_center_degree: int | None = None,
    center_weight_sql: str | None = None,
    with_endpoint_degrees: bool = False,
) -> DataFrame:
    """Shared 2-hop candidate scaffold for the link-prediction trio
    (r13 factor-out of the ~40-line chain the three scorers previously
    triplicated — ADVICE r12): canonical undirected edges → adjacency in
    both directions → one degree aggregate → wedge-center filter
    (deg >= 2, optional `max_center_degree` hub cap) → wedges from ONE
    adjacency self-equi-join on the center vertex → aggregate-FIRST to
    candidate pairs → LEFT ANTI against the existing edge set. Returns

        (u, v, common_neighbors [, weight_sum] [, _du, _dv])   u < v

    - `center_weight_sql`: SQL over the center's `deg` evaluated ONCE
      per center and BIGINT-summed per pair into `weight_sum`
      (Adamic–Adar's quantized 1/ln(deg) rides here; siblings skip it
      and pay only a LEFT SEMI against the center set).
    - `with_endpoint_degrees`: join deg onto both candidate endpoints as
      `_du`/`_dv` (Jaccard/PA need them; AA doesn't, so it skips the two
      joins — the helper must not cost a scorer anything the hand-rolled
      form didn't).

    The scale argument lives here once: the scoring aggregate runs
    BEFORE the anti join so the LEFT ANTI sees candidate-PAIR volume,
    not wedge volume (the anti join commutes with the groupBy — it drops
    whole (u, v) groups) and reuses the aggregate's (u, v) hash
    partitioning; multi-consumer frames are lineage-cut (the
    triangle_counts lesson)."""
    e = canonical_undirected(edges).localCheckpoint(eager=False)
    # The adjacency feeds the wedge SELF-JOIN, whose emit is deg(w) rows
    # per input row — a fan-out stage that must not inherit the 1-2
    # AQE-coalesced partitions of the distinct() above (r14: measured 2
    # tasks / 6.5 s on local[32] vs 32 tasks / ~1 s; no-op at scale).
    adj = _fan_out_ready(
        e.select(F.col("a").alias("w"), F.col("b").alias("n"))
        .union(e.select(F.col("b").alias("w"), F.col("a").alias("n")))
    )
    deg = adj.groupBy("w").agg(F.count("*").alias("deg"))
    if with_endpoint_degrees:
        # center filter + both endpoint joins consume it
        deg = deg.localCheckpoint(eager=False)
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    a1 = adj.select("w", F.col("n").alias("u"))
    a2 = adj.select("w", F.col("n").alias("v"))
    wedges = a1.join(a2, "w").filter(F.col("u") < F.col("v"))
    if center_weight_sql is not None:
        contrib = centers.select("w", F.expr(center_weight_sql).alias("_cw"))
        wedges = wedges.join(contrib, "w").select("u", "v", "_cw")
        pairs = wedges.groupBy("u", "v").agg(
            F.count("*").alias("common_neighbors"),
            F.sum("_cw").alias("weight_sum"),
        )
    else:
        wedges = wedges.join(
            centers.select("w"), "w", "left_semi"
        ).select("u", "v")
        pairs = wedges.groupBy("u", "v").agg(
            F.count("*").alias("common_neighbors")
        )
    cand = pairs.join(e, (pairs.u == e.a) & (pairs.v == e.b), "left_anti")
    if with_endpoint_degrees:
        du = deg.select(F.col("w").alias("u"), F.col("deg").alias("_du"))
        dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("_dv"))
        cand = cand.join(du, "u").join(dv, "v")
    return cand


def adamic_adar_topk(
    edges: DataFrame, k: int | None = 20, max_center_degree: int | None = None
) -> DataFrame:
    """Adamic–Adar link prediction over the undirected canonical graph:
    for every NON-adjacent pair (u, v), score = Σ over common neighbors
    w of 1/ln(deg(w)) — the classic "which edges are missing" ranking
    (friend suggestion, entity-linkage candidates). Returns the top-k:

        (u, v, common_neighbors, score_ppm)   with u < v

    deterministically (score DESC, then u, v — rank ties can't flap).

    Scale shape: adjacency (both directions) + one degree aggregate;
    wedges come from ONE self-equi-join of the adjacency on the center
    vertex (fan-out deg(w)² per center — the inherent cost of exact
    common-neighbor enumeration); the scoring aggregate (two-phase,
    map-side partials) runs FIRST so the LEFT ANTI hash join against the
    canonical edge set sees candidate-PAIR volume, not wedge volume —
    on dense graphs pairs ≪ wedges, and the anti join reuses the
    aggregate's (u, v) hash partitioning (the anti join commutes with
    the groupBy: it drops whole (u, v) groups); top-k compiles to
    TakeOrderedAndProject. On hub-heavy graphs pass
    `max_center_degree` to skip celebrity centers (their per-wedge
    contribution 1/ln(deg) is the smallest in the graph, and the cap is
    the standard exactness/cost dial at scale — an UNCAPPED run on a
    100 TB social graph is a deliberate choice, not a default).

    Scaffold (wedges, aggregate-first anti-join, lineage cuts) is the
    shared :func:`_wedge_candidate_pairs`; AA is the weighted member
    (per-center ppm contribution summed in the candidate aggregate) and
    skips the endpoint-degree joins its siblings need."""
    scored = aa_scoring(
        _wedge_candidate_pairs(edges, max_center_degree, center_weight_sql=AA_CONTRIB_PPM_SQL)
    )
    if k is None:
        # Full scored candidate set, unordered — the probe/analysis form
        # (tools/decomposition_probe.py counts it to decompose the wall
        # into wedge volume vs per-wedge cost).
        return scored
    return scored.orderBy(
        F.desc("score_ppm"), F.asc("u"), F.asc("v")
    ).limit(k)


# Scoring projections over a _wedge_candidate_pairs scaffold, shared
# VERBATIM by the registry operators above/below and bench.py's
# shared-scaffold thunks (r15, ADVICE r14: the bench previously
# duplicated these expressions — a formula change there would have
# silently timed a stale score). The AA scaffold carries weight_sum; the
# jaccard/PA scaffolds need with_endpoint_degrees=True.


def aa_scoring(scaffold: DataFrame) -> DataFrame:
    return scaffold.select(
        "u", "v", "common_neighbors", F.col("weight_sum").alias("score_ppm")
    )


def jaccard_scoring(scaffold: DataFrame) -> DataFrame:
    return scaffold.select(
        "u",
        "v",
        "common_neighbors",
        F.expr(
            "(2000000 * common_neighbors + (_du + _dv - common_neighbors))"
            " DIV (2 * (_du + _dv - common_neighbors))"
        ).alias("jaccard_ppm"),
    )


def pa_scoring(scaffold: DataFrame) -> DataFrame:
    return scaffold.select(
        "u",
        "v",
        "common_neighbors",
        (F.col("_du") * F.col("_dv")).cast("long").alias("pa_score"),
    )


def jaccard_link_topk(
    edges: DataFrame, k: int | None = 20, max_center_degree: int | None = None
) -> DataFrame:
    """Jaccard-coefficient link prediction (r12) — the NORMALIZED sibling
    of :func:`adamic_adar_topk`: for every non-adjacent pair (u, v),
    score = |N(u)∩N(v)| / |N(u)∪N(v)| = common / (deg(u)+deg(v)−common).
    Where Adamic–Adar weights rare common neighbors up, Jaccard penalizes
    hub endpoints — the two standard rankings disagree exactly on
    hub-adjacent candidates, which is why both ship. Returns the top-k

        (u, v, common_neighbors, jaccard_ppm)   with u < v

    deterministically (score DESC, then u, v). PURE BIGINT end to end:
    counts and degrees are integers and the only division is the final
    round-half-up ppm — no float anywhere (unlike AA's one quantized ln
    site), so the score is trivially bit-identical cross-engine.

    Scale shape: identical to adamic_adar_topk (one adjacency
    self-equi-join for wedges, aggregate-first then LEFT ANTI against
    the canonical edges, two degree hash joins on the candidate-pair
    table — candidate volume, never wedge volume); `max_center_degree`
    is the same hub-cost dial, with the same semantics caveat: capped
    centers' wedges are skipped, so `common` undercounts through hubs.
    Scaffold is the shared :func:`_wedge_candidate_pairs`
    (unweighted, with endpoint degrees); only the scoring expression and
    top-k live here."""
    scored = jaccard_scoring(
        _wedge_candidate_pairs(edges, max_center_degree, with_endpoint_degrees=True)
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("jaccard_ppm"), F.asc("u"), F.asc("v")).limit(k)


def preferential_attachment_topk(
    edges: DataFrame, k: int | None = 20, max_center_degree: int | None = None
) -> DataFrame:
    """Preferential-attachment link prediction (r12) — the third member
    of the classic trio (Adamic–Adar weights rare common neighbors,
    Jaccard penalizes hubs, PA BETS ON hubs: score = deg(u)·deg(v)).
    Candidates are the standard 2-hop restriction (non-adjacent pairs
    with >= 1 common neighbor — true PA over ALL non-adjacent pairs is
    |V|²-quadratic by definition and is a deliberate analysis choice,
    not a default; the 2-hop set is where link formation is actually
    plausible and keeps the operator wedge-bounded). Returns the top-k

        (u, v, common_neighbors, pa_score)   with u < v

    deterministically (score DESC, then u, v). PURE BIGINT: degrees and
    the product — no division, no float. Scaffold is the shared
    :func:`_wedge_candidate_pairs` (unweighted, with endpoint degrees);
    only the deg(u)*deg(v) scoring expression and top-k live here."""
    scored = pa_scoring(
        _wedge_candidate_pairs(edges, max_center_degree, with_endpoint_degrees=True)
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("pa_score"), F.asc("u"), F.asc("v")).limit(k)
