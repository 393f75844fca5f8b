"""Excel source/sink (S1 parity; /root/reference/main.py:19-21).

The reference's primary I/O is xlsx; this engine's is parquet. xlsx
support is provided for drop-in parity but gated behind import-try:
no xlsx engine (openpyxl/xlsxwriter) ships in this container, and on a
real cluster xlsx is a driver-side convenience format anyway (a single
workbook is not splittable — it is read on the driver and parallelized,
or converted to parquet first; the `com.crealytics:spark-excel`
connector would be the JVM-native alternative when its jar is present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - depends on container contents
    import openpyxl  # noqa: F401

    HAS_XLSX = True
except ImportError:
    HAS_XLSX = False


def read_excel(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """Single-sheet xlsx scan -> DataFrame (schema inferred by pandas,
    then frozen by Spark). Driver-side read + distributed parallelize."""
    if not HAS_XLSX:
        raise NotImplementedError(
            "xlsx support requires openpyxl (not installed in this "
            "environment); convert to parquet or install an xlsx engine"
        )
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet)
    return spark.createDataFrame(pdf)


def write_excel(df: DataFrame, path: str) -> None:
    """Append-style xlsx sink (S3/S4 parity). Collects to the driver —
    only valid for small curated outputs, exactly the reference's
    regime (its sink grew one row at a time)."""
    if not HAS_XLSX:
        raise NotImplementedError(
            "xlsx support requires openpyxl (not installed in this "
            "environment); use df.write.parquet / append_sink instead"
        )
    df.toPandas().to_excel(path, index=False)
