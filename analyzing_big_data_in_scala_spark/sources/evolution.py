"""Parquet schema evolution (beyond-reference; the lakehouse concern every
long-lived table hits): producers add columns over time, and the reader
must see ONE unified schema across old and new files without rewriting
history.

Spark's parquet source does this with `mergeSchema` — schema union across
files' footers, missing columns NULL-filled per row group. It is OFF by
default because footer-merging every file costs a distributed schema pass
on wide tables; these helpers make the choice explicit instead of a
stringly-typed option:

- old-era files simply lack the new columns (no rewrite, no backfill job);
- `read_merged` pays the footer union once at load;
- at 100 TB the alternative — rewriting history to backfill a column —
  is a full-corpus job; schema-on-read is free at write time and
  NULL-fills at scan time, which is exactly the trade a training-data
  lake wants for additive evolution.

Only ADDITIVE evolution is safe this way (new nullable columns). Type
changes or renames are rewrites by nature; `read_merged` surfaces those
as Spark's merge-incompatibility error rather than guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def append_era(df: DataFrame, path: str) -> None:
    """Append one era's files to `path` with THIS era's schema — old files
    are never touched, new columns exist only in new footers."""
    df.write.mode("append").parquet(path)


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read all eras under one unified schema: the union of every file's
    columns, rows NULL-filled where their era lacked a column."""
    return spark.read.option("mergeSchema", "true").parquet(path)
