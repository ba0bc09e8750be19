"""The oracle-checked query suite.

Every operator from SURVEY §2 (plus the beyond-parity training-data
operators) is exposed as a named :class:`Query`: a PySpark callable
``(spark, sf_dir) -> DataFrame`` paired with an ANSI-SQL oracle string
that DuckDB runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash at sf=0.01.

Determinism rule: any aggregate over doubles whose value depends on
summation order is computed via exact DECIMAL arithmetic and cast back
to double (see ``suite.parity`` helpers) so Spark's partial/final
shuffle aggregation and DuckDB's single-threaded sum produce
bit-identical results.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver does a weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


# Test hook (tests/test_partition_invariance.py): when set, every
# loaded table is round-robin repartitioned to this many partitions so
# the sweep exercises input-layout sensitivity (e.g. mapInPandas
# candidate generation), not just shuffle-partition counts.
_HOSTILE_REPARTITION: int | None = None


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    # pin the session timezone for every suite query: date_trunc,
    # unix_timestamp, and pandas conversion are session-tz-dependent,
    # while the DuckDB oracle is tz-naive — a non-UTC session (e.g. a
    # driver-owned one) would shift hour/day boundaries and every
    # rendered timestamp value.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        df = events_table(spark, sf_dir)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # spread=True: redistribute across all cores before a compute-heavy
    # projection (shingling, quantized dot products). The testdata
    # files are single-row-group parquet — unsplittable, so the scan is
    # ONE task and an expensive per-row expression runs serially while
    # 31 cores idle. The repartition shuffles only the small raw input
    # (KBs here), negligible against the compute it parallelizes. At
    # production scale inputs arrive in thousands of splits and the
    # scan parallelizes itself — keep spread=False there.
    if _HOSTILE_REPARTITION is not None:
        df = df.repartition(_HOSTILE_REPARTITION)
    elif spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has stored ``ts`` as TIMESTAMP(NANOS) in some
    testdata generations (which Spark's parquet reader rejects — read
    as raw nanos via legacy conf, then exact integer ``div`` to micros)
    and plain TIMESTAMP(MICROS) in others. Normalize both to a session
    TimestampType column so downstream queries see one shape; DuckDB's
    ns→us cast truncates identically in the nanos case.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        # genuinely NANOS-typed file: the conf must STAY set for the
        # scan to execute; within this system events.parquet is the
        # only nanos file, so the session-wide setting has no other
        # reader to affect (documented trade — a per-read option does
        # not exist for this legacy conf)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # MICROS-generation testdata: the legacy conf was not needed —
        # restore it so unrelated reads in this shared session keep
        # Spark's loud default error on unexpected nanos files instead
        # of silently receiving bigint nanos
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
        if isinstance(dt, TimestampNTZType):
            # session tz is pinned to UTC in table(); the cast is exact
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def build_suite() -> dict[str, Query]:
    from city_payroll_data_pipeline_spark.suite import (
        advanced,
        analytics,
        mlops,
        parity,
        relational,
        textops,
        vectors,
    )

    suite: dict[str, Query] = {}
    for mod in (parity, relational, textops, vectors, analytics, advanced, mlops):
        overlap = suite.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        suite.update(mod.QUERIES)
    return suite
