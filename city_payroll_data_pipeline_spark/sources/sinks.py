"""Sinks (SURVEY §2.1 S4, S5, S8-S10).

Full-refresh materialization (every reference model is ``kind FULL``,
config.yaml:24) maps to overwrite-mode writes. Parquet overwrite is
atomic-per-directory and needs no WAL checkpoint/vacuum housekeeping
(the reference's L6/L7 lifecycle ops collapse to nothing).

Scale notes: writers take an optional ``partition_by`` (e.g. tenant,
date) so downstream scans partition-prune, and ``coalesce`` for the
small-output case (a 50-row report should not produce 32 files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """S9/S10: parquet sink (raw strings-only or clean fact)."""
    if coalesce:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", coalesce: int | None = 1
) -> None:
    """S4/S8: CSV sink (raw backup, report/export archives). Reports are
    small → default coalesce(1) for a single client-friendly file."""
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode(mode).option("header", True).csv(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized write: range-partition on ``order_cols`` then
    sort within each partition before writing. Every output file holds
    a disjoint range of the sort key, so its parquet min/max footer
    statistics are tight — a later filter on the key prunes whole
    files at planning time instead of scanning them. The linear-order
    analog of Z-ordering; at 100 TB, layout at write time is the
    cheapest query optimization there is (paid once, used by every
    scan)."""
    (
        df.repartitionByRange(n_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. The operational counterpart of
    streaming ingestion — a file-watcher sink lands one small file per
    micro-batch, and at 100 TB scan throughput dies on per-file open
    costs long before data volume matters (the classic small-file
    problem; Delta/Iceberg call this OPTIMIZE).

    Write-to-temp-then-swap: Spark cannot safely overwrite a directory
    it is lazily reading. The two renames are not one atomic step, so
    a crash can leave the dataset parked under its backup name — the
    recovery preamble below repairs that automatically on the next
    call (restore the backup if the live dir is missing, clear stale
    backup/tmp otherwise) instead of failing the rename on leftovers.
    Returns the new file count."""
    import math
    import shutil as _sh

    tmp = path.rstrip("/") + "._compact_tmp"
    bak = path.rstrip("/") + "._compact_bak"
    if os.path.isdir(bak):
        if not os.path.isdir(path):
            # crashed between the two renames: the original data is
            # intact under the backup name — restore it
            os.rename(bak, path)
        else:
            _sh.rmtree(bak)  # crashed after the swap: stale backup
    if os.path.isdir(tmp):
        _sh.rmtree(tmp)  # partial compaction output, always safe

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    _sh.rmtree(bak)
    return n_files


def save_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    bucket_by: list[str] | None = None,
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """S5: full-refresh managed table (``kind FULL`` -> overwrite).

    ``bucket_by`` pre-hash-partitions the table on disk: two tables
    bucketed on their join key with the same bucket count join WITHOUT
    a shuffle (Catalyst sees the matching output partitioning). For a
    fact table joined repeatedly on the same key at 100 TB, this is
    the single biggest shuffle saving available — pay the partitioning
    once at write time instead of per query. ``sort_by`` additionally
    pre-sorts within buckets, removing the merge-join sort too."""
    writer = df.write.mode(mode).format("parquet")
    if bucket_by:
        writer = writer.bucketBy(num_buckets, *bucket_by)
        if sort_by:
            writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """JSON-lines sink (one object per line, compressed shards) — the
    export format downstream tokenizer/training jobs consume. Shard
    count follows the input partitioning: repartition upstream to
    size shards; partition_by gives hive-style dirs for pruning."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — for Hive-ecosystem consumers; zlib-compressed by
    default, stripe min/max indexes written automatically."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def zorder_value(cols, mins, maxs, bits: int = 16):
    """Morton (Z-order) key from N numeric columns: each column is
    scaled to a ``bits``-bit integer grid over its [min, max] range,
    then the bit-spread values are interleaved. Pure JVM expressions
    (shifts + masks) — codegen'd, no UDF.

    ``bits`` is capped at 63 // n_cols: the interleave reaches bit
    position bits·n − 1, so the uncapped default (16) with 4 columns
    would set the bigint SIGN bit (large keys sort before small ones)
    and with 5+ columns Java's shiftleft wraps the shift amount mod
    64, scrambling the Morton code entirely."""
    from pyspark.sql import functions as F

    bits = min(bits, 63 // max(1, len(cols)))

    def spread(x, stride):
        # spread `bits` low bits of x so consecutive bits land
        # `stride` apart (stride = number of interleaved columns)
        out = F.lit(0).cast("bigint")
        for i in range(bits):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1).cast("bigint"))
            out = out.bitwiseOR(F.shiftleft(bit, i * stride))
        return out

    n = len(cols)
    z = F.lit(0).cast("bigint")
    grid_max = (1 << bits) - 1
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = float(hi - lo) or 1.0
        scaled = F.least(
            F.lit(grid_max),
            F.floor((c.cast("double") - lo) / span * grid_max).cast("bigint"),
        )
        z = z.bitwiseOR(F.shiftleft(spread(scaled, n), j))
    return z


def write_zorder_parquet(
    df, path: str, cols: list[str], n_files: int = 8, bits: int = 16
) -> None:
    """Z-order clustered write: range-partition + sort on the Morton
    key of ``cols`` so every output file covers a small hyper-rectangle
    of the key space. Parquet min/max footer stats on EACH clustered
    column then prune files for predicates on ANY of them — the
    multi-dimensional generalization of write_sorted_parquet (which
    optimizes exactly one ordering). One extra agg pass for ranges +
    one range shuffle at write time buys per-file skipping forever."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    z = zorder_value(
        [F.col(c) for c in cols],
        [stats[f"lo_{c}"] for c in cols],
        [stats[f"hi_{c}"] for c in cols],
        bits=bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
