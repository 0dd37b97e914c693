"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partitioned writes accumulate small
files; at 100 TB the file count — not the byte count — becomes the
bottleneck (driver-side listing, task-per-file scheduling, NameNode/
object-store metadata pressure). Compaction rewrites a directory to
~target-sized files and atomically swaps it in.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite the parquet directory at ``path`` into ≈``target_file_
    bytes`` files. Returns {files_before, files_after, bytes}.

    Mechanics: size the output by actual on-disk bytes (not row count —
    compression ratios vary wildly across columns), write to a sibling
    staging dir, then swap via rename — readers never observe a
    half-compacted table. No-op below ``min_files``. The local
    filesystem swap models the cloud path (write new prefix + flip a
    manifest/pointer); object stores have no atomic dir rename."""

    def _list(p):
        out = []
        for root, _, files in os.walk(p):
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(".parquet")
            )
        return out

    before = _list(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    if len(before) < min_files:
        return {"files_before": len(before), "files_after": len(before), "bytes": total_bytes}

    n_out = max(1, round(total_bytes / target_file_bytes))
    staging = path.rstrip("/") + ".__compact_tmp__"
    shutil.rmtree(staging, ignore_errors=True)
    # coalesce, not repartition: compaction must not shuffle — each
    # output task concatenates input splits
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(staging)

    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(_list(path)),
        "bytes": total_bytes,
    }


def write_partitioned(
    df,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int = 0,
    dynamic_overwrite: bool = False,
) -> None:
    """Partitioned parquet write — the standard shape of a 100 TB sink.

    * ``repartition(partition_by)`` first: without it every task holds
      a writer per live partition value (tasks × partitions small
      files, the classic dynamic-partition explosion); with it each
      partition's rows land in one task's writer.
    * ``sortWithinPartitions`` clusters rows inside each file so
      downstream range predicates on the sort key skip row groups via
      parquet min/max stats — free pruning, no index.
    * ``maxRecordsPerFile`` bounds file size without another shuffle.
    * ``partitionOverwriteMode=dynamic`` replaces only partitions
      present in ``df`` — the idempotent daily-rewrite primitive;
      static overwrite would drop every other partition of the table.
    """
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    writer = out.write
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.mode("overwrite").partitionBy(*partition_by).parquet(path)


def metadata_stats(spark, path: str, cols: list[str]):
    """COUNT/MIN/MAX answered from parquet FOOTERS, not data pages —
    Spark's V2 aggregate pushdown (``PushedAggregation`` at the scan).
    At 100 TB this is the difference between a metadata read (KBs per
    file) and a full-table scan for the pre-flight questions every
    pipeline asks (row counts, key ranges, date spans).

    The engine session reads through the V1 parquet path (the default;
    broader feature coverage), and ``useV1SourceList`` is a runtime
    conf — so this helper flips to the V2 reader + aggregatePushdown
    just for this plan and restores both confs afterward. Returns one
    Row: ``n, min_<c>, max_<c>...``. The pushdown silently degrades to
    a normal scan when a column's type doesn't support footer stats —
    results are identical either way (asserted in tests); only the
    plan shape changes."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.sources.useV1SourceList",
            "spark.sql.parquet.aggregatePushdown",
        )
    }
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        return spark.read.parquet(path).agg(*aggs).collect()[0]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def metadata_stats_by_partition(spark, path: str, part_col: str, cols: list[str]):
    """Per-partition COUNT/MIN/MAX from parquet footers — the grouped
    variant of :func:`metadata_stats`. Group-by pushdown only exists
    for PARTITION columns (the group key must be derivable from file
    paths, not data pages), so this is also the measured argument for
    partitioning by your reporting dimension: the same question on an
    unpartitioned layout is a full scan. Returns a list of Rows
    ``(part_col, n, min_<c>, max_<c>...)``."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.sources.useV1SourceList",
            "spark.sql.parquet.aggregatePushdown",
        )
    }
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        return (
            spark.read.parquet(path).groupBy(part_col).agg(*aggs).collect()
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
