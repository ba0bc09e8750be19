"""Versioned parquet tables with MERGE/upsert — the incremental
counterpart to the reference's full-refresh-only writes (every model
is ``kind FULL``, config.yaml:24; see SURVEY §2.1 S5).

Plain parquet has no transaction log, and Spark cannot safely
overwrite a directory it is concurrently reading. The minimal safe
shape (a micro "lakehouse" without a format dependency):

    table_root/
      v=1/  v=2/  ...      immutable version directories
      _LATEST               text file holding the live version number

* Writers materialize the next version COMPLETELY, then flip _LATEST —
  a single small-file rename-level operation, so readers never observe
  a half-written table and old versions stay queryable (time travel /
  rollback for free).
* ``merge_upsert`` computes new = updates ∪ (current ⟂ updates): the
  anti-join shuffles both sides on the key once — the same plan shape
  Delta/Iceberg MERGE lowers to for full-overwrite tables. At 100 TB
  with partitioned tables you'd overwrite only affected partitions;
  the version-flip protocol is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LATEST = "_LATEST"


def _latest_path(root: str) -> str:
    return os.path.join(root, _LATEST)


def current_version(root: str) -> int:
    """0 = table does not exist yet."""
    try:
        with open(_latest_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def read_table(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the live version (or a pinned one — time travel)."""
    v = version if version is not None else current_version(root)
    if v <= 0:
        raise FileNotFoundError(f"no committed version under {root}")
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def _commit(df: DataFrame, root: str, next_v: int) -> None:
    df.write.mode("overwrite").parquet(os.path.join(root, f"v={next_v}"))
    tmp = _latest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(next_v))
    os.replace(tmp, _latest_path(root))  # atomic flip


def write_version(df: DataFrame, root: str) -> int:
    """Full snapshot write as a new version (the ``kind FULL`` path)."""
    os.makedirs(root, exist_ok=True)
    next_v = current_version(root) + 1
    _commit(df, root, next_v)
    return next_v


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str | list[str],
    schema_evolution: bool = False,
) -> int:
    """MERGE semantics on the key (a column name or list of them):
    matching rows are replaced by the update rows, unmatched update
    rows are inserted, all other current rows carry over. A key may
    match multiple rows on either side — replace-by-key replaces the
    whole group. Returns the committed version.

    ``schema_evolution=True`` lets the update batch add columns (old
    rows get NULL) — ``unionByName(allowMissingColumns)``, the same
    mergeSchema behavior Delta/Iceberg offer. Off by default: silent
    schema drift at 100 TB is usually a bug, not a feature."""
    keys = [key] if isinstance(key, str) else list(key)
    v = current_version(root)
    if v == 0:
        return write_version(updates, root)
    current = read_table(spark, root, v)
    survivors = current.join(
        updates.select(*keys).distinct(), on=keys, how="left_anti"
    )
    merged = survivors.unionByName(
        updates, allowMissingColumns=schema_evolution
    )
    next_v = v + 1
    _commit(merged, root, next_v)
    return next_v


def delete_where(
    spark: SparkSession, root: str, condition
) -> int:
    """Anti-materialize a delete (GDPR/right-to-forget pass): commit a
    new version without the matching rows. Rows where ``condition``
    evaluates to NULL are KEPT — a delete must remove only rows that
    provably match (bare ``filter(~cond)`` would also drop every row
    where the predicate column is NULL, silently destroying unrelated
    records)."""
    v = current_version(root)
    current = read_table(spark, root, v)
    next_v = v + 1
    _commit(
        current.filter(~F.coalesce(condition, F.lit(False))), root, next_v
    )
    return next_v


def vacuum(root: str, keep_last: int = 2) -> list[int]:
    """Drop version directories older than the newest ``keep_last``
    (reference L6 ``CHECKPOINT; VACUUM`` serve_flight.py:196-198,
    reborn for versioned tables: the WAL-merge half is unnecessary
    with immutable parquet, the space-reclaim half is this). Never
    touches the live version; returns the versions removed."""
    import re
    import shutil

    live = current_version(root)
    versions = sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"v=(\d+)", d)) and os.path.isdir(os.path.join(root, d))
    )
    cut = max(live - keep_last + 1, 1)
    removed = [v for v in versions if v < cut]
    for v in removed:
        shutil.rmtree(os.path.join(root, f"v={v}"))
    return removed
