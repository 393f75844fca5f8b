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
    ``fmt="any"`` dispatches a MIXED folder per file extension
    (see ``_read_mixed_folder``).

    Probe cost (r12 review): per-file schema probes run on a driver
    thread pool (parquet/orc probes are footer reads; json/csv probes
    are inference scans — inherently per-file when heterogeneity must
    be DETECTED, which is this function's contract), and when the
    folder turns out homogeneous the probed schema is passed to the
    single multi-file scan so json/csv never pay a second full
    inference pass over all files."""
    if fmt == "any":
        return _read_mixed_folder(spark, folder)
    files = hadoop_ls(spark, folder, f".{fmt}")
    if not files:
        raise ValueError(f"no .{fmt} files in {folder}")
    # xlsx is not a Spark data source: route every workbook through the
    # stdlib SpreadsheetML codec, same as the fmt="any" dispatch (the
    # bare format("xlsx") previously crashed here, r13 review)
    if fmt == "xlsx":
        from .excel import read_excel

        return union_by_name([read_excel(spark, _xlsx_local(f)) for f in files])
    # jsonl is an extension alias, not a registered source name — it
    # reads through the json reader (previously crashed, r13 review)
    src_fmt = "json" if fmt == "jsonl" else fmt
    # csv contract for the ad-hoc probe path: files carry a header row
    # (the reference's ingestion assumption) and types are inferred —
    # without these options header rows ingested as DATA rows and every
    # column arrived as string (r13 review). Callers with headerless
    # csv read explicitly with their own options.
    opts = {"header": "true", "inferSchema": "true"} if src_fmt == "csv" else {}

    # format(...).load accepts a path LIST for every source; the
    # per-format reader methods differ (parquet(*paths) is varargs but
    # json/csv take (path, schema, ...) — unpacking files into json()
    # would parse the second path as a DDL schema string).
    # spark.read returns a FRESH DataFrameReader per access, so probe
    # threads never share a mutable builder.
    def _probe(f: str) -> DataFrame:
        return spark.read.format(src_fmt).options(**opts).load(f)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        dfs = list(ex.map(_probe, files))
    schemas = {
        tuple(sorted((c.name, c.dataType.simpleString()) for c in df.schema))
        for df in dfs
    }
    if len(schemas) == 1:
        # homogeneous: one multi-file scan, partition-parallel. The
        # self-describing columnar formats re-resolve cheaply from
        # footers; the inference formats reuse the probed schema
        # instead of re-inferring over every file
        src = spark.read.format(src_fmt).options(**opts)
        if src_fmt in ("json", "csv"):
            src = src.schema(dfs[0].schema)
        return src.load(files)
    return union_by_name(dfs)


def _xlsx_local(f: str) -> str:
    """Strip the ``file:`` scheme for the driver-side xlsx codec;
    refuse non-local schemes loudly (workbooks decode on the driver)."""
    local = f[len("file:"):] if f.startswith("file:") else f
    if ":" in local.split("/", 1)[0] and "://" in f:
        raise ValueError(f"xlsx decode needs a local path; got {f!r}")
    return local


# fmt="any" file routing: self-describing formats only. csv is
# deliberately absent (header-vs-data is a caller contract — pass
# fmt="csv" explicitly); .gz acceptance mirrors hadoop_ls (text
# sources decompress transparently, containers do not).
_MIXED_READERS = ("parquet", "orc", "json", "jsonl", "xlsx")


def _read_mixed_folder(spark: SparkSession, folder: str) -> DataFrame:
    """True mixed-format folder union (``fmt="any"`` — previously an
    untested trap that read every file with the parquet reader, r12
    review): each file routes through its format's reader by
    extension, frames align by name with null fill. Unknown
    extensions refuse LOUDLY with the full offending list — a silent
    skip would under-count the corpus."""
    files = hadoop_ls(spark, folder, None)
    if not files:
        raise ValueError(f"no files in {folder}")
    dfs, unknown = [], []
    for f in files:
        name = f.rsplit("/", 1)[-1].lower()
        base, gz = (name[:-3], True) if name.endswith(".gz") else (name, False)
        ext = base.rsplit(".", 1)[-1] if "." in base else ""
        if gz and ext not in ("json", "jsonl"):
            unknown.append(name)  # gzip wraps containers unreadably
        elif ext == "parquet":
            dfs.append(spark.read.parquet(f))
        elif ext == "orc":
            dfs.append(spark.read.orc(f))
        elif ext in ("json", "jsonl"):
            dfs.append(spark.read.json(f))
        elif ext == "xlsx":
            from .excel import read_excel

            dfs.append(read_excel(spark, _xlsx_local(f)))
        else:
            unknown.append(name)
    if unknown:
        raise ValueError(
            f"fmt='any' cannot route {sorted(unknown)} — supported "
            f"extensions: {_MIXED_READERS} (+.gz for json/jsonl); csv "
            "needs an explicit fmt='csv' call (header contract)"
        )
    return union_by_name(dfs)
