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

from .. import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Schema comes from the parquet footer (no
    inference pass over data, unlike pd.read_excel dtype sniffing)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so operators can be
    written in either DataFrame or SQL form against the same names the
    DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
