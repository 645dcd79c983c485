"""Storage layer: Parquet(/Delta-style) tables with truncate-and-load parity.

The reference's inter-stage IR is a MongoDB collection written with
truncate-and-load semantics (`R/storage.R:80-106`: ``remove("{}")`` then
insert-all, plus a metadata doc recording column order). The engine's native
storage is columnar Parquet with ``mode("overwrite")`` — the same contract
(idempotent full rewrite), but scan-efficient: column pruning and predicate
pushdown reach the files, and Parquet schemas are ordered, so the reference's
column-order metadata document (`R/storage.R:36-48,92-99`) is unnecessary.

At 100 TB the write path partitions by a low-cardinality natural key
(``landing_date`` for fact tables — SURVEY §7.1 step 7) so downstream reads
get partition pruning; callers opt in via ``partition_by``.
"""

from __future__ import annotations

import datetime as _dt
import subprocess
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path: str, columns: Iterable[str] | None = None) -> DataFrame:
    """Scan a stored table (reference `mdb_collection_pull`, R/storage.R:26-51).

    ``columns`` prunes the scan eagerly; Catalyst would prune anyway for a
    lazy downstream select, but an explicit projection documents intent.
    """
    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None,
                fmt: str = "parquet") -> None:
    """Truncate-and-load (reference `mdb_collection_push`, R/storage.R:80-106)."""
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def add_version(filename: str, extension: str = "", sha_nchar: int = 7,
                sep: str = "__") -> str:
    """Versioned filename helper (reference `add_version`, R/utils.R:30-52).

    Appends ``YYYYmmddHHMMSS_<gitsha{sha_nchar}>`` to ``filename``.
    """
    stamp = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%d%H%M%S")
    try:
        sha = subprocess.run(
            ["git", "rev-parse", f"--short={sha_nchar}", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        sha = "nogit"
    version = f"{stamp}_{sha}"
    if extension and not extension.startswith("."):
        extension = "." + extension
    return f"{filename}{sep}{version}{extension}"


def upsert_partitions(df: DataFrame, path: str,
                      partition_by: list[str]) -> None:
    """Incremental partition upsert — the 100 TB alternative to
    truncate-and-load.

    The reference rewrites every collection on each 2-day cron run
    (`R/storage.R:89`); at scale that is a full-table rewrite for a
    trailing-edge change. With dynamic partition overwrite, only the
    partitions PRESENT in ``df`` are replaced — untouched partitions
    (historic ``landing_date``s) keep their files, so a daily incremental
    run costs O(new data), not O(table). Readers see partition-level
    atomicity (each partition directory swaps whole).
    """
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(*partition_by)
         .format("parquet").save(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def compact_table(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-files compaction: rewrite a table directory into
    ``target_files`` files and atomically swap it in. Returns the data-file
    count after compaction.

    Streaming/incremental sinks accrete many small files per partition
    over time; at 100 TB scan cost is dominated by per-file open/footer
    overhead once files shrink below a row group. Compaction = read →
    ``repartition(n)`` → write to a side directory → directory swap (a
    table-format catalog — Delta/Iceberg — would do the swap as a metadata
    commit instead; same plan underneath).
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__compact_old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path)
               if f.endswith(".parquet") and not f.startswith("."))
