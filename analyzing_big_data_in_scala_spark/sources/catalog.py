"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

Covers the reference's scan surface (SURVEY.md §2.1 S1-S7) re-targeted at
typed parquet: where the reference reads schema-less text/CSV and coerces
lazily (ScalaNotebooks/MovieSearchEngine.scala:25-29,
StandaloneScala/PageRank.scala:27), we read parquet with its real types and
keep column pruning / predicate pushdown available to Catalyst.

Scale note: `load_table` is a plain `spark.read.parquet` — no driver-side
materialization, no schema inference pass over data files (parquet footers
carry the schema), so the same call works on a 100 TB table directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# All fixture tables (TESTDATA.md). Order matters nowhere; listed for docs.
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Equivalent of the reference's source reads
    (SURVEY.md S1-S5) on typed parquet."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """If `col` arrived as raw nanos (bigint, via nanosAsLong), convert to a
    proper timestamp at microsecond precision. Integer division (`div`), not
    float, so no precision loss on 1e18-scale nanos."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(col) == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long
    (legacy conf, runtime-settable) and rebuild a microsecond timestamp —
    truncation never crosses a second boundary, so second-granularity
    bucketing matches engines that read nanos natively (DuckDB)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_nanos_ts(df)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: one line -> one `value` row (ScalaNotebooks/MovieSearchEngine.scala:25)."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = False,
    comment: str | None = None,
    schema=None,
    column_names: list[str] | None = None,
) -> DataFrame:
    """S2-S5: CSV/TSV scans with the reference's option surface
    (sep: ScalaNotebooks/MovieSearchEngine.scala:28; header:
    StandaloneScala/PageRank.scala:27; comment:
    StandaloneScala/EpinionsGraphFrameAnalysis.scala:49-53). Positional
    renaming via `column_names` matches the reference's `.toDF(...)` style."""
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if comment is not None:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if column_names is not None:
        df = df.toDF(*column_names)
    return df


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """S9: CSV sink with header+overwrite
    (StandaloneScala/EpinionsGraphFrameAnalysis.scala:71-75)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (beyond-reference; the natural 100 TB sink). Partitioned
    writes enable downstream partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source (beyond-reference; the lingua franca of scraped /
    exported training corpora). ALWAYS pass an explicit schema at scale:
    schema inference runs a full extra pass over the data, and with
    multiLine=false (the default here) Spark splits files by line so reads
    parallelize like text. Unparseable rows land in _corrupt_record
    (PERMISSIVE mode) rather than failing the job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """JSON-lines sink — one object per line, splittable on re-read."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (beyond-reference): the other columnar format with
    predicate pushdown + column pruning, for interop with Hive-era lakes."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """ORC sink (zlib by default; same partitioned-layout contract as
    write_parquet)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
