"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.1):
row-count + schema-width + order-insensitive value hash, with columns sorted
by name. Used by tests and by `python tests/oracle_check.py` for a quick
self-check before the driver's own gate runs.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

# Queries whose oracle is a constants table pinned at one specific scale:
# checking them at any other sf is a guaranteed false red, so the
# self-check (and the pytest parity sweep) skip them elsewhere. Derived
# from the registry (QuerySpec.pinned_sf) — the @query registration is the
# single source of truth for where an oracle's constants were measured.
import sys as _sys  # noqa: E402

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:  # `python tests/oracle_check.py` has tests/ first
    _sys.path.insert(0, _REPO_ROOT)
from analyzing_big_data_in_scala_spark.plans import QUERIES as _QUERIES  # noqa: E402

PINNED_SF: dict[str, str] = {
    name: spec.pinned_sf for name, spec in _QUERIES.items() if spec.pinned_sf
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    # TYPE-FAITHFUL normalization (ADVICE r3, medium): the driver
    # canonicalizes both sides via pandas, where DuckDB HUGEINT (an uncast
    # SUM over integers) becomes float64 and hash-mismatches Spark's int64
    # even for bit-identical values. Tagging the normalized string with the
    # type class ("i" vs "f") makes that divergence fail LOCALLY too —
    # local green must imply driver green. Floats hash at full shortest
    # round-trip repr (17 sig digits), never collapsed to ints.
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if v is None:
        return ""
    if isinstance(v, (bool, np.bool_)):
        return "b" + str(int(v))
    if isinstance(v, (int, np.integer)):
        return "i" + str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return "f" + repr(f)
    try:
        if pd.isna(v):  # NaT and pandas NA markers
            return ""
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    # Both sides go THROUGH pandas, mirroring the driver's canonicalization
    # path: Spark via toPandas() (Arrow), DuckDB via .df() — so dtype
    # conversions the driver sees (HUGEINT->float64, nullable int->float64)
    # happen here identically instead of being papered over by fetchall()'s
    # exact Python ints.
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = [tuple(r) for r in s_pdf.to_numpy(dtype=object)]
    o_pdf = con.execute(sql).df()
    o_cols = list(o_pdf.columns)
    o_rows = [tuple(r) for r in o_pdf.to_numpy(dtype=object)]
    out = {
        "rows_match": len(s_rows) == len(o_rows),
        "cols_match": sorted(s_cols) == sorted(o_cols),
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
    }
    if out["rows_match"] and out["cols_match"]:
        sc = canonical_rows(s_cols, s_rows)
        oc = canonical_rows(o_cols, o_rows)
        out["values_match"] = sc == oc
        if not out["values_match"]:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b]
            out["first_diffs"] = diff[:5]
    else:
        out["values_match"] = False
    return out


def main() -> int:
    import sys

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    sys.path.insert(0, "/root/repo")
    from analyzing_big_data_in_scala_spark.plans.registry import QUERIES
    from analyzing_big_data_in_scala_spark.session import get_spark
    import analyzing_big_data_in_scala_spark.plans  # noqa: F401

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb_conn(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        pinned = PINNED_SF.get(name)
        # Exact basename compare (not substring): 'sf0.01' must not match
        # a hypothetical 'sf0.012' / 'sf0.01-alt' fixture dir.
        if pinned is not None and os.path.basename(sf_dir.rstrip("/")) != pinned:
            print(f"SKIP {name}: constants oracle pinned to {pinned}")
            continue
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows")
                continue
            r = compare(df, con, spec.oracle)
            ok = r["values_match"]
            print(f"{'OK  ' if ok else 'FAIL'} {name}: spark={r['spark_rows']} oracle={r['oracle_rows']}")
            if not ok:
                failures += 1
                print("   ", {k: v for k, v in r.items() if k not in ("spark_rows", "oracle_rows")})
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
