"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders,
events ⋈ orders) is shuffling both sides on the join key every query.
Bucketing pays that shuffle ONCE at write time: both tables are written
pre-hash-partitioned into the same number of buckets on the join key,
and every subsequent equi-join on that key is planned as a
SortMergeJoin with NO Exchange on either side (bucket i joins bucket i
locally). The reference has no persistent storage layout at all (xlsx
re-read per run, /root/reference/main.py:688-696); this is the Spark
answer to making the hot join key a property of the data.

Bucketed writes go through the session catalog (``saveAsTable``) —
bucket metadata lives in the metastore, which is what lets the planner
trust the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    location: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    table. Sorting within buckets lets SortMergeJoin skip its sort
    stage entirely.

    Default is an EXTERNAL table at a per-process scratch location —
    the session's warehouse dir is relative to the calling process's
    CWD, which a library cannot assume is writable; pass ``location``
    (or pre-configure spark.sql.warehouse.dir) to control placement in
    a real deployment. The bucket metadata lives in the catalog either
    way, which is what lets the planner trust the layout."""
    from ..util import fresh_run_dir

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is None:
        location = fresh_run_dir("bucketed_table", table)
    else:
        # a stale directory under an explicit location would fail the
        # CREATE — but NEVER destroy a caller-supplied path that this
        # code did not write: only a previous completed table write
        # (marked by _SUCCESS) or an empty directory may be cleared
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path
        loc = hpath(location)
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            empty = not fs.listStatus(loc)
            prior_write = fs.exists(hpath(str(loc) + "/_SUCCESS"))
            if not (empty or prior_write):
                raise IOError(
                    f"write_bucketed: refusing to clear {location} — it is "
                    "non-empty and not a previous bucketed-table write "
                    "(no _SUCCESS marker); pass a fresh or dedicated path"
                )
            fs.delete(loc, True)
    w = (
        df.write.mode("overwrite")
        .option("path", location)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key. With
    matching bucket counts the physical plan contains no Exchange —
    verify with ``df.explain()`` (tests assert this).

    ``force_sort_merge`` adds a merge hint so small test-scale inputs
    don't plan as a broadcast join (which would hide the bucket
    layout); at real scale the planner picks SortMergeJoin on its own."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)
