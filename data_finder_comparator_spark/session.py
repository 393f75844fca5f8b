"""SparkSession factory tuned for the local[N] harness but configured the
way a real cluster job would be (AQE, adaptive skew handling, Arrow).

Replaces the reference's process-global state + config.ini scalars
(/root/reference/main.py:638-686) with explicit, per-session Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-finder-comparator-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the driver contract: ``local[$SPARK_GRAFT_CPUS]``
    with shuffle parallelism matched to cores (not the 200 default,
    which over-parallelizes small local data and under-parallelizes a
    real cluster — on a cluster this would be set to ~2-3x total cores
    or left to AQE coalescing).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # session-lifetime by intent: the test parquet stores
        # TIMESTAMP(NANOS), read as long and rebuilt as NTZ (see
        # sources/parquet.load_table, which also sets this for
        # externally-created sessions like the driver's)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
