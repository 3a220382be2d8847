"""Small-file compaction: the 100 TB housekeeping operator.

Streaming sinks, incremental ingest, and over-parallel writers leave
datasets as thousands of KB-sized files; every subsequent scan then pays
per-file open/footer/seek costs and the driver pays listing time, which at
data-lake scale routinely dominates the query itself. Compaction rewrites
a dataset into files near a target size (the parquet sweet spot is
~128 MB-1 GB: large enough to amortize footers and row-group headers,
small enough to split scans evenly).

Sizing is MEASURED, not guessed: in-memory plan statistics misestimate
on-disk parquet by the compression ratio (often 5-10x), so the compactor
lists the actual bytes on disk and divides by the target. The rewrite is
one `repartition(n)` — a full shuffle, deliberately: `coalesce` avoids the
shuffle but chains unevenly-sized input splits into unevenly-sized output
files and caps upstream parallelism at n.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def dataset_file_stats(path: str, suffix: str = ".parquet") -> tuple[int, int]:
    """(n_files, total_bytes) of the data files under `path` (recursive,
    hidden/_SUCCESS files excluded). Plain os.walk: local and HDFS-mounted
    paths; on object stores swap in the FileSystem API listing."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")) or not f.endswith(suffix):
                continue
            n += 1
            total += os.path.getsize(os.path.join(root, f))
    return n, total


def plan_compaction(total_bytes: int, target_file_bytes: int = 128 << 20) -> int:
    """Number of output files so each lands near (at most) the target."""
    return max(1, -(-total_bytes // target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite the parquet dataset at `path` into ~target-sized files,
    atomically (write to a sibling temp dir, then swap directories — the
    local-FS stand-in for a table-format commit; on Delta/Iceberg use
    their OPTIMIZE/rewrite_data_files instead, same math).

    Returns {"files_before", "bytes", "files_after", "skipped"}. No-op
    (skipped=True) unless the rewrite would at least HALVE the file count
    (and `min_files_to_compact` is met): rewriting every byte of a dataset
    to shave one or two files is pure cost, and the 2x bar also keeps
    repeated compaction idempotent (a just-compacted dataset whose bytes
    shrank slightly won't re-trigger).
    """
    n_before, total = dataset_file_stats(path)
    n_target = plan_compaction(total, target_file_bytes)
    if n_before < min_files_to_compact or n_before < 2 * n_target:
        return {
            "files_before": n_before,
            "bytes": total,
            "files_after": n_before,
            "skipped": True,
        }

    parent = os.path.dirname(os.path.abspath(path))
    tmp = os.path.join(parent, f"_compact_{uuid.uuid4().hex[:8]}")
    old = os.path.join(parent, f"_precompact_{uuid.uuid4().hex[:8]}")
    df: DataFrame = spark.read.parquet(path)
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    # Swap: reads started before the swap keep their open handles (POSIX);
    # new reads see the compacted layout.
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)

    n_after, _ = dataset_file_stats(path)
    return {
        "files_before": n_before,
        "bytes": total,
        "files_after": n_after,
        "skipped": False,
    }
