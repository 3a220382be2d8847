"""Graph-analytics queries (SURVEY.md §2.10) over an edge list derived
deterministically from the `events` fixture: consecutive events within each
(event_type, day) partition contribute user->user edges (FIXTURES.md §2).

Degrees and triangle counts are SQL-expressible -> full DuckDB oracles.
Iterative PageRank / connected components are driver-controlled fixpoint
loops -> rows-only checks (the unit tests pin their numerics on
hand-computed micro-graphs instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as G
from ..sources.catalog import load_table
from .registry import query

# DuckDB twin of operators.graph.edges_from_events.
_SQL_EDGES = """
edges AS (
    SELECT src, dst FROM (
        SELECT user_id AS src,
               LEAD(user_id) OVER (PARTITION BY event_type, CAST(FLOOR(epoch(ts)/86400) AS BIGINT)
                                   ORDER BY event_id) AS dst
        FROM events
    )
    WHERE dst IS NOT NULL AND src <> dst
)
"""

_SQL_CANON = _SQL_EDGES + """,
canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.edges_from_events(load_table(spark, sf_dir, "events"))


@query(
    "graph_out_degrees",
    oracle=f"""
        WITH {_SQL_EDGES}
        SELECT src AS id, COUNT(*) AS out_degree FROM edges GROUP BY src
        ORDER BY out_degree DESC, id ASC
        LIMIT 20
    """,
    description="G2 outDegrees top-20 (EpinionsGraphFrameAnalysis.scala:64-75)",
)
def graph_out_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        G.out_degrees(_edges(spark, sf_dir))
        .orderBy(F.desc("out_degree"), F.asc("id"))
        .limit(20)
    )


@query(
    "graph_in_degrees",
    oracle=f"""
        WITH {_SQL_EDGES}
        SELECT dst AS id, COUNT(*) AS in_degree FROM edges GROUP BY dst
        ORDER BY in_degree DESC, id ASC
        LIMIT 20
    """,
    description="G3 inDegrees top-20 (EpinionsGraphFrameAnalysis.scala:77-88)",
)
def graph_in_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        G.in_degrees(_edges(spark, sf_dir))
        .orderBy(F.desc("in_degree"), F.asc("id"))
        .limit(20)
    )


@query(
    "graph_triangle_counts",
    oracle=f"""
        WITH {_SQL_CANON},
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM canon e1
            JOIN canon e2 ON e1.b = e2.a
            JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
            SELECT x AS id FROM tri UNION ALL
            SELECT y FROM tri UNION ALL
            SELECT z FROM tri
        )
        SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id
        ORDER BY triangles DESC, id ASC
        LIMIT 20
    """,
    description="G6 triangleCount top-20 (EpinionsGraphFrameAnalysis.scala:119-131)",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        G.triangle_counts(_edges(spark, sf_dir))
        .orderBy(F.desc("triangles"), F.asc("id"))
        .limit(20)
    )


@query(
    "graph_pagerank",
    oracle=None,  # iterative fixpoint; unit tests pin numerics on micro-graphs
    description="G4 PageRank (damping 0.15, 10 iters) top-20 (EpinionsGraphFrameAnalysis.scala:91-103)",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = G.pagerank(_edges(spark, sf_dir), alpha=0.15, max_iterations=10)
    return pr.select("id", F.round("pagerank", 8).alias("pagerank")).orderBy(
        F.desc("pagerank"), F.asc("id")
    ).limit(20)


@query(
    "graph_pagerank_tol",
    oracle=None,
    description="G4 PageRank run-to-convergence (tol=0.01, GraphFrames parity: EpinionsGraphFrameAnalysis.scala:93)",
)
def graph_pagerank_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = G.pagerank(_edges(spark, sf_dir), alpha=0.15, max_iterations=40, tol=0.01)
    return pr.select("id", F.round("pagerank", 8).alias("pagerank")).orderBy(
        F.desc("pagerank"), F.asc("id")
    ).limit(20)


@query(
    "graph_pagerank_reference",
    oracle=None,
    description="G7 hand-rolled PageRank with quirks Q3-Q5 (StandaloneScala/PageRank.scala:24-77)",
)
def graph_pagerank_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = G.pagerank(
        _edges(spark, sf_dir), alpha=0.15, max_iterations=10, reference_semantics=True
    )
    return pr.select("id", F.round("pagerank", 8).alias("pagerank")).orderBy(
        F.desc("pagerank"), F.asc("id")
    ).limit(20)


@query(
    "graph_component_sizes",
    oracle=None,  # fixpoint loop; micro-graph unit tests pin semantics
    description="G5 connected components -> top-20 component sizes (EpinionsGraphFrameAnalysis.scala:105-117)",
)
def graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = G.connected_components(_edges(spark, sf_dir))
    return (
        G.component_sizes(comps)
        .orderBy(F.desc("size"), F.asc("component"))
        .limit(20)
    )


@query(
    "graph_components_two_phase",
    oracle=None,  # tested equal to label propagation (tests/test_graph.py)
    description="G5 scale path: large-star/small-star CC in O(log n) rounds -> top-20 sizes",
)
def graph_components_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = G.connected_components_two_phase(_edges(spark, sf_dir))
    return (
        G.component_sizes(comps)
        .orderBy(F.desc("size"), F.asc("component"))
        .limit(20)
    )
