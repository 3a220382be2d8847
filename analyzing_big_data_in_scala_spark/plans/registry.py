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
    # Scale the oracle's constants were pinned at (e.g. "sf0.01"), or None
    # when the oracle is scale-generic SQL. Pinned oracles are only valid
    # at exactly that sf — the local self-check and the pytest parity sweep
    # skip them elsewhere (a pinned-constants table compared at any other
    # scale is a guaranteed false red). The driver runs at sf0.01, which is
    # why every pin in the repo is an sf0.01 pin.
    pinned_sf: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    pinned_sf: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. Used as a decorator in the plans modules."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            description=description or (fn.__doc__ or "").strip(),
            pinned_sf=pinned_sf,
        )
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
