"""SQL surface: register the fixture tables as temp views and run ANSI SQL
through Spark's own parser/Catalyst — the same engine the DataFrame API
compiles into, exposed for users who query in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """One temp view per fixture table (events with the nanos fix applied)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
