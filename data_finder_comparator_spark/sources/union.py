"""Folder ingestion with union-by-name semantics.

The reference builds its candidate table by concatenating every xlsx
file in a folder, aligning frames by column name and null-filling
missing columns (pandas ``concat`` — /root/reference/main.py:690-696,
operator S2/U1 in SURVEY.md §2). The Spark-native equivalents:

* homogeneous schemas → a single multi-file ``spark.read.parquet(dir)``
  scan (one job, partition-parallel, no union nodes in the plan);
* heterogeneous schemas → ``unionByName(allowMissingColumns=True)``
  which is exactly pandas-concat-by-name: permissive UNION ALL,
  null-filling columns a file lacks, duplicate rows preserved.

At scale the homogeneous path matters: a folder of 100k parquet files
is one distributed scan, not 100k driver-side reads.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL BY NAME over an arbitrary list of frames
    (pandas-concat semantics: align by column name, null-fill missing,
    keep duplicates, no row-identity)."""
    if not dfs:
        raise ValueError("union_by_name requires at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def hadoop_ls(spark: SparkSession, folder: str, suffix: str | None = None) -> list[str]:
    """Sorted folder listing through the Hadoop FileSystem API — works
    for any scheme Spark can read (file://, hdfs://, s3a://), where
    os.listdir would bind to driver-local paths. Hidden/metadata
    entries (underscore and dot prefixes) are skipped. A ``suffix``
    also matches its codec-compressed shard names (``.json`` accepts
    ``.json.gz``): Spark's text sources decompress transparently, and
    production corpora ship as many small ``.jsonl.gz``/``.csv.gz``
    shards precisely because one gz file is one non-splittable
    partition."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(folder)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # transparent codec decompression is a TEXT-source feature: a
    # .parquet.gz / .orc.gz is unreadable (gzip wraps the container and
    # breaks footer seeks), so .gz shard names are accepted only for
    # the line-oriented formats
    gz_ok = suffix is not None and suffix.lstrip(".") in ("json", "jsonl", "csv", "txt", "text")
    suffixes = None if suffix is None else ((suffix, f"{suffix}.gz") if gz_ok else (suffix,))
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if not st.getPath().getName().startswith(("_", "."))
        and (suffixes is None or st.getPath().getName().endswith(suffixes))
    )


def read_folder_union_by_name(
    spark: SparkSession, folder: str, fmt: str = "parquet"
) -> DataFrame:
    """Read every file in *folder* and union by name.

    Tries the fast single-scan path first (works when schemas agree);
    falls back to per-file reads + unionByName for heterogeneous
    folders, mirroring /root/reference/main.py:692-696.
    """
    files = hadoop_ls(spark, folder, None if fmt == "any" else f".{fmt}")
    if not files:
        raise ValueError(f"no .{fmt} files in {folder}")
    # format(...).load accepts a path LIST for every source; the
    # per-format reader methods differ (parquet(*paths) is varargs but
    # json/csv take (path, schema, ...) — unpacking files into json()
    # would parse the second path as a DDL schema string)
    src = spark.read.format(fmt if fmt != "any" else "parquet")
    schemas = set()
    dfs = []
    for f in files:
        df = src.load(f)
        dfs.append(df)
        schemas.add(tuple(sorted((c.name, c.dataType.simpleString()) for c in df.schema)))
    if len(schemas) == 1:
        # homogeneous: one multi-file scan, partition-parallel
        return src.load(files)
    return union_by_name(dfs)
