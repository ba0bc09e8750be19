"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]`` (single JVM); the same configuration
scales to a multi-executor cluster because every knob here is
data-size-relative, not host-specific:

* AQE on — runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switches mean the same logical
  plan survives a 1000x scale-up without retuning.
* Arrow on — columnar pandas interchange for ingest/egress and for the
  Pandas-UDF operators (similarity, multimodal).
* ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster AQE's coalescing makes the initial number mostly
  irrelevant as long as it is not absurdly small.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python workers.

    Any operator that runs Python on executors (mapInPandas /
    pandas_udf) pickles closures that reference this package *by
    module name* — on a real cluster (and even local mode when the
    driver runs from another cwd) the workers can't import it unless
    the library is shipped. ``addPyFile`` is the standard mechanism:
    zip the package once, distribute via the context. Idempotent per
    SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_cppds_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"cppds_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._cppds_pkg_shipped = True  # noqa: SLF001


def get_spark(
    app_name: str = "city_payroll_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return (or create) the engine's SparkSession.

    Reuses an already-active session when one exists (e.g. the driver
    harness owns the session) — in that case the config is left as-is.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
