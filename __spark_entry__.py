"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``analyzing_big_data_in_scala_spark``; this module
just adapts the query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from analyzing_big_data_in_scala_spark.plans import oracle_sql_map, query_map
from analyzing_big_data_in_scala_spark.plans.registry import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top customers by order count + spend (SURVEY.md §7.2 slice 0 — the
    Epinions top-k-by-degree shape retargeted at the fixtures).
    """
    return QUERIES["top_customers_by_orders"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query; non-SQL-expressible
    ops (iterative PageRank/CC, ML pipeline, SimHash) are omitted -> the
    driver records a rows-only check for those."""
    return oracle_sql_map()
