"""Parquet scans (the engine's primary source).

Replaces the reference's xlsx single-sheet scan S1
(/root/reference/main.py:19-21). Columnar parquet gives Catalyst
predicate pushdown + column pruning for free — at 100 TB a scan that
reads only the projected columns and prunes row groups on pushed
filters is the difference between minutes and hours.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .. import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# tables whose parquet stores TIMESTAMP(NANOS): read as long, rebuild NTZ
_NANOS_LONG_COLS = {"events": [("ts", "ts")]}


def ns_long_to_ntz(src: str) -> str:
    """SQL expr rebuilding TIMESTAMP_NTZ from a long-nanoseconds column:
    epoch NTZ + an exact microsecond interval (micros < 2^53, so the
    double seconds value is exact to the microsecond)."""
    return (
        f"timestamp_ntz '1970-01-01 00:00:00' + "
        f"make_dt_interval(0, 0, 0, CAST({src} div 1000 AS DOUBLE) / 1000000.0)"
    )


def parquet_field_type(sf_dir: str, name: str, col: str):
    """Physical type of one column straight from the parquet footer
    (pyarrow, driver-side metadata read — no Spark job, no data scan).

    The batch path infers its schema from the footer automatically; a
    file STREAM source must declare a schema up front, and declaring the
    wrong unit (e.g. long-nanos against a timestamp[us] file) silently
    produces garbage timestamps. Callers derive the declared stream
    schema from this so the footer stays the single source of truth."""
    import pyarrow.parquet as pq

    return pq.read_schema(os.path.join(sf_dir, f"{name}.parquet")).field(col).type


def stores_nanos_long(sf_dir: str, name: str, col: str) -> bool:
    """True iff the parquet column arrives Spark-side as a raw long of
    nanoseconds (TIMESTAMP(NANOS) under the legacy nanosAsLong conf, or
    a genuine int64 column following the same convention)."""
    return str(parquet_field_type(sf_dir, name, col)) in ("int64", "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Schema comes from the parquet footer (no
    inference pass over data, unlike pd.read_excel dtype sniffing).

    The test parquet stores TIMESTAMP(NANOS) which vanilla Spark
    rejects; with the legacy conf below Spark 4 reads it as
    TIMESTAMP_NTZ (µs precision). The conf is session-lifetime BY
    INTENT (set in the ``get_spark`` factory too); it is re-asserted
    here because the driver runs these queries under its own
    externally-created session, where a restore-after-read would break
    the lazily-executed scan that still needs it at action time.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field, src in _NANOS_LONG_COLS.get(name, []):
        if dict(df.dtypes).get(field) == "bigint":
            # long nanoseconds -> TIMESTAMP_NTZ, timezone-independent
            df = df.withColumn(field, F.expr(ns_long_to_ntz(src)))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so operators can be
    written in either DataFrame or SQL form against the same names the
    DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
