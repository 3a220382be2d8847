"""Query registry: the single source of truth consumed by __spark_entry__.py.

Each query is a named (spark, sf_dir) -> DataFrame callable plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string over the same
tables. Column names are shared between both sides — the driver's comparator
sorts columns by name before hashing, so every computed column is aliased
identically in the Spark plan and the SQL text (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver runs rows-only check
    description: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, description: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query. Used as a decorator in the plans modules."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, description=description or (fn.__doc__ or "").strip())
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
