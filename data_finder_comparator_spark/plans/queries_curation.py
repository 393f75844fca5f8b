"""Curation / sources / row-ops query family (SURVEY.md §2.1, §2.2, §2.7)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import curation_decisions, with_row_ids
from ..sources.excel import read_excel, write_excel
from ..sources.parquet import load_table
from ..sources.union import union_by_name
from .catalog import query
from .queries_fuzzy import _FLAGSHIP_ORACLE, fuzzy_join_tiers

# ---------------------------------------------------------------------------
# U1/S2: permissive UNION ALL BY NAME over heterogeneous projections —
# pandas-concat semantics (/root/reference/main.py:690-696) without the
# driver-side loop: three differently-shaped frames, null-filled.
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT p_partkey, p_name, p_brand,
       CAST(NULL AS DOUBLE) AS p_retailprice,
       CAST(NULL AS INTEGER) AS p_size,
       'f0' AS src
FROM part WHERE p_partkey % 3 = 0
UNION ALL
SELECT p_partkey, p_name, CAST(NULL AS VARCHAR), p_retailprice, CAST(NULL AS INTEGER), 'f1'
FROM part WHERE p_partkey % 3 = 1
UNION ALL
SELECT p_partkey, p_name, p_brand, CAST(NULL AS DOUBLE), p_size, 'f2'
FROM part WHERE p_partkey % 3 = 2
"""


@query("union_by_name_folder", oracle=_UNION_ORACLE)
def union_by_name_folder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulates a folder of files with overlapping-but-different
    schemas (FIXTURES.md A2) and unions them by name."""
    part = load_table(spark, sf_dir, "part")
    f0 = part.filter(F.col("p_partkey") % 3 == 0).select(
        "p_partkey", "p_name", "p_brand", F.lit("f0").alias("src")
    )
    f1 = part.filter(F.col("p_partkey") % 3 == 1).select(
        "p_partkey", "p_name", "p_retailprice", F.lit("f1").alias("src")
    )
    f2 = part.filter(F.col("p_partkey") % 3 == 2).select(
        "p_partkey", "p_name", "p_brand", "p_size", F.lit("f2").alias("src")
    )
    return union_by_name([f0, f1, f2]).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice", "p_size", "src"
    )


# ---------------------------------------------------------------------------
# S1: the reference's primary source — a folder of xlsx workbooks
# (/root/reference/main.py:19-21, :688-696) — exercised for real via the
# vendored pure-stdlib SpreadsheetML codec.
# ---------------------------------------------------------------------------

_EXCEL_ORACLE = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey,
       CAST(n_nationkey AS DOUBLE) * 1.5 AS key_x
FROM nation
"""


@query("excel_folder_roundtrip", oracle=_EXCEL_ORACLE)
def excel_folder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes the nation dim (plus a double column to exercise float
    round-trip) into a folder of three xlsx workbooks, reads every
    workbook back, and unions by name — the reference's ingestion loop
    (main.py:690-696) end to end. Driver-side by design: workbooks are
    not splittable; this path exists for small curated tables while
    bulk data stays parquet."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        (F.col("n_nationkey").cast("double") * F.lit(1.5)).alias("key_x"),
    )
    d = tempfile.mkdtemp(prefix="xlsx_folder_")
    try:
        for i in range(3):
            write_excel(
                nation.filter(F.col("n_nationkey") % 3 == i),
                os.path.join(d, f"f{i}.xlsx"),
            )
        dfs = [
            read_excel(spark, os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".xlsx")
        ]
        return union_by_name(dfs)
    finally:
        # read_excel fully decodes on the driver (parallelized rows, no
        # lazy file reference), so the folder is dead once read
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# S2 across a third format: folder-of-CSV ingestion, fully distributed
# on both sides (Spark csv writer -> folder of part files -> csv reader
# with schema inference), unioned by name like the xlsx/parquet paths.
# ---------------------------------------------------------------------------

_CSV_ORACLE = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
       s_name,
       CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
"""


@query("csv_folder_roundtrip", oracle=_CSV_ORACLE)
def csv_folder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier dim written to two CSV folders (distributed write, one
    part file per task) and read back through the engine's folder
    reader (``read_folder_union_by_name`` — r15: the read-back now
    exercises the BOUNDED probe path: first-line header signatures
    detect heterogeneity driver-side, one inference scan per signature
    group supplies the schema, and each homogeneous folder reads as a
    single multi-file scan instead of N probe scans + a re-read), then
    unioned by name. Unlike the xlsx path nothing touches the driver;
    CSV doubles round-trip exactly (Java shortest-repr toString) and
    edge whitespace is preserved (the writer's default trimming is
    disabled). One deterministic temp dir per (process, sf_dir),
    cleared on re-run — the returned DataFrame scans it lazily."""
    from ..sources.union import read_folder_union_by_name
    from ..util import fresh_run_dir

    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long"),
        "s_name",
        F.col("s_nationkey").cast("long"),
        F.col("s_acctbal").cast("double"),
    )
    d = fresh_run_dir("csv_folder", sf_dir)
    for name, part in (("even", 0), ("odd", 1)):
        sup.filter(F.col("s_suppkey") % 2 == part).write.mode("overwrite").option(
            "ignoreLeadingWhiteSpace", False
        ).option("ignoreTrailingWhiteSpace", False).csv(
            os.path.join(d, name), header=True
        )
    dfs = [
        read_folder_union_by_name(spark, os.path.join(d, name), fmt="csv")
        for name in ("even", "odd")
    ]
    return union_by_name(dfs).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
    )


# ---------------------------------------------------------------------------
# S2 across a fourth format: folder-of-ORC ingestion. ORC is Spark's
# other first-class columnar format (predicate pushdown, column
# pruning, vectorized reader all work like parquet); the roundtrip
# proves the engine's folder-scan machinery is format-agnostic. DuckDB
# cannot read ORC, so the oracle reads the SAME rows from the original
# parquet table — a hash match proves the ORC write+scan is lossless.
# ---------------------------------------------------------------------------

_ORC_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_name,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
"""


@query("orc_folder_roundtrip", oracle=_ORC_ORACLE)
def orc_folder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dim written to two ORC folders (distributed write) and
    read back, unioned by name — the same split/scan/union shape as the
    csv/json/xlsx/parquet paths. ORC round-trips longs and doubles
    bit-exactly, so the parquet-derived oracle hash must match."""
    from ..util import fresh_run_dir

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    d = fresh_run_dir("orc_folder", sf_dir)
    for name, part in (("even", 0), ("odd", 1)):
        cust.filter(F.col("c_custkey") % 2 == part).write.mode("overwrite").orc(
            os.path.join(d, name)
        )
    dfs = [spark.read.orc(os.path.join(d, name)) for name in ("even", "odd")]
    return union_by_name(dfs)


# ---------------------------------------------------------------------------
# Hive-style partitioned layout + partition pruning: the on-disk
# organization a 100 TB corpus actually uses. Documents are written
# ``partitionBy("lang")`` (one directory per language, written
# distributed), and the read-back filters two languages — Spark prunes
# at the DIRECTORY level (PartitionFilters in the scan, pinned by
# tests/test_plan_shapes.py), so the other partitions' files are never
# opened. At scale this is the difference between scanning 2/5 of the
# corpus and scanning all of it.
# ---------------------------------------------------------------------------

_PARTITIONED_ORACLE = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang IN ('en', 'fr')
GROUP BY lang, source
"""


@query("partitioned_lang_roundtrip", oracle=_PARTITIONED_ORACLE)
def partitioned_lang_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents written to a hive-partitioned parquet layout
    (``partitionBy("lang")``) and read back with a two-language filter
    that prunes at the partition-directory level, then aggregated per
    (lang, source). The oracle recomputes from the flat table — a hash
    match proves the partitioned roundtrip is lossless and the pruned
    scan complete."""
    from ..util import fresh_run_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    d = fresh_run_dir("part_lang", sf_dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(d)
    return (
        spark.read.parquet(d)
        .filter(F.col("lang").isin("en", "fr"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# P4: deterministic row ids (positional-row replacement).
# ---------------------------------------------------------------------------

_ROW_IDS_ORACLE = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS row_id
FROM orders WHERE o_orderkey % 100 = 0
"""


@query("deterministic_row_ids", oracle=_ROW_IDS_ORACLE)
def deterministic_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-based ids over an explicit total order, on a pre-filtered
    subset (a global row_number funnels through one partition — correct
    only for small curated outputs; use partitioned ids for facts)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return with_row_ids(orders, ["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "row_id"
    )


# ---------------------------------------------------------------------------
# S3/S4/P5: the keep/replace verdict as a deterministic policy over the
# flagship tier table.
# ---------------------------------------------------------------------------

_CURATION_ORACLE = f"""
WITH flag AS ({_FLAGSHIP_ORACLE}),
agg AS (
  SELECT probe_id, probe,
         sum(CASE WHEN tier = 'exact' THEN 1 ELSE 0 END) AS n_exact,
         sum(CASE WHEN tier = 'best' THEN 1 ELSE 0 END) AS n_best,
         max(CASE WHEN tier = 'best' THEN cand END) AS best_cand
  FROM flag GROUP BY probe_id, probe
)
SELECT probe_id, probe,
       CASE WHEN n_exact > 0 THEN 'keep'
            WHEN n_best = 1 THEN 'replace'
            ELSE 'keep' END AS action,
       CASE WHEN n_exact = 0 AND n_best = 1 THEN best_cand
            ELSE probe END AS final_key
FROM agg
"""


@query("keep_replace_curation", oracle=_CURATION_ORACLE)
def keep_replace_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_decisions(fuzzy_join_tiers(spark, sf_dir))


_CURATION_COUNTS_ORACLE = f"""
WITH cur AS ({_CURATION_ORACLE})
SELECT action, CAST(count(*) AS BIGINT) AS n_rows
FROM cur GROUP BY action
"""


@query("curation_counts", oracle=_CURATION_COUNTS_ORACLE)
def curation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/S6: sink row-count probe, per action."""
    return (
        keep_replace_curation(spark, sf_dir)
        .groupBy("action")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# S2 across a fourth format: folder-of-JSON-lines ingestion (the
# interchange format most scraped/curated corpora arrive in).
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
FROM region
UNION ALL
SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation
"""


@query("json_folder_roundtrip", oracle=_JSON_ORACLE)
def json_folder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two differently-shaped dims written as JSON-lines folders
    (distributed writer), read back through the engine's folder reader
    (``read_folder_union_by_name`` — r15: drives the bounded probe
    path, where first-record key signatures group files driver-side
    and one inference scan per group replaces the old
    inference-scan-per-file probe) and unioned by name —
    heterogeneous-source ingestion over the format scraped corpora
    actually arrive in."""
    from ..sources.union import read_folder_union_by_name
    from ..util import fresh_run_dir

    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("r_regionkey"), "r_name"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("r_regionkey"),
        F.col("n_name").alias("r_name"),
    )
    d = fresh_run_dir("json_folder", sf_dir)
    region.write.mode("overwrite").json(os.path.join(d, "region"))
    nation.write.mode("overwrite").json(os.path.join(d, "nation"))
    dfs = [
        read_folder_union_by_name(spark, os.path.join(d, name), fmt="json")
        for name in ("region", "nation")
    ]
    return union_by_name(dfs).select(
        F.col("r_regionkey").cast("long").alias("r_regionkey"), "r_name"
    )


# ---------------------------------------------------------------------------
# Table-version diff — the "comparator" half of the reference's name,
# lifted from per-cell GUI review (main.py:521-553 Keep/Replace) to
# dataset scale: classify every key as added / deleted / changed /
# unchanged between two table versions via ONE full-outer join on the
# key. The "previous version" is derived deterministically from orders
# (drop %97 keys, bump o_totalprice on %101, synthesize %103 keys
# shifted beyond the key domain) so both engines can restate it.
# At 100 TB both sides shuffle once on the join key; counts reduce
# map-side. No row bodies ever reach the driver.
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH prev AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.5
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 0
),
joined AS (
  SELECT CASE
           WHEN p.o_orderkey IS NULL THEN 'added'
           WHEN c.o_orderkey IS NULL THEN 'deleted'
           WHEN c.o_totalprice IS DISTINCT FROM p.o_totalprice
             OR c.o_custkey IS DISTINCT FROM p.o_custkey
             OR c.o_orderstatus IS DISTINCT FROM p.o_orderstatus
             OR c.o_orderdate IS DISTINCT FROM p.o_orderdate
             OR c.o_orderpriority IS DISTINCT FROM p.o_orderpriority
           THEN 'changed'
           ELSE 'unchanged'
         END AS status,
         coalesce(c.o_orderkey, p.o_orderkey) AS key
  FROM orders c FULL OUTER JOIN prev p ON c.o_orderkey = p.o_orderkey
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(key) AS BIGINT) AS key_sum
FROM joined GROUP BY status
"""


@query("table_version_diff", oracle=_DIFF_ORACLE)
def table_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = load_table(spark, sf_dir, "orders")
    prev = (
        cur.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.5
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            cur.filter(F.col("o_orderkey") % 103 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000000
            )
        )
    )
    p = prev.select(*[F.col(c).alias(f"p_{c}") for c in prev.columns])
    j = cur.join(p, cur.o_orderkey == p.p_o_orderkey, "full_outer")
    data_cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    # null-safe equality over every non-key column; a NULL on either
    # side must compare as a difference, not propagate to UNKNOWN
    same = F.lit(True)
    for c in data_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"p_{c}"))
    status = (
        F.when(F.col("p_o_orderkey").isNull(), F.lit("added"))
        .when(F.col("o_orderkey").isNull(), F.lit("deleted"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce("o_orderkey", "p_o_orderkey").alias("key"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("key").cast("long").alias("key_sum"),
        )
    )


# ---------------------------------------------------------------------------
# S2 across formats in ONE folder (r17, the r16 verdict's item 5): the
# ingestion shape scraped corpora actually arrive in — a parquet shard,
# a jsonl shard, a plain-text shard, and a gzipped text shard side by
# side. ``fmt="any"`` routes each file through its format's reader by
# extension (parquet scan, ONE bounded-probe inference job for the
# jsonl, ONE batched text scan for txt + txt.gz — never a per-file
# inference scan), then aligns by name with null fill. The oracle
# recomputes the union from the orders table: each shard is a
# deterministic o_orderkey % 4 slice with its own projection, so a
# hash match proves the routing, the null fill, AND losslessness of
# every format's write+read. At 100 TB each format's member files
# batch into that format's one distributed scan — job count is
# O(formats), not O(files).
# ---------------------------------------------------------------------------

_MIXED_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderstatus,
       CAST(NULL AS VARCHAR) AS value
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT CAST(o_orderkey AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       o_orderstatus, CAST(NULL AS VARCHAR)
FROM orders WHERE o_orderkey % 4 = 1
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), o_orderpriority
FROM orders WHERE o_orderkey % 4 = 2
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), o_orderpriority
FROM orders WHERE o_orderkey % 4 = 3
"""


def _move_single_part(tmp: str, dest: str) -> None:
    """Move the one part file of a coalesce(1) Spark write into the
    mixed folder under its format's extension. Loud if the write
    produced anything but exactly one part — a silent glob pick would
    drop data."""
    parts = [f for f in os.listdir(tmp) if f.startswith("part-") and not f.endswith(".crc")]
    if len(parts) != 1:
        raise RuntimeError(f"expected one part file in {tmp}, got {parts}")
    shutil.move(os.path.join(tmp, parts[0]), dest)
    shutil.rmtree(tmp)


@query("mixed_folder_any", oracle=_MIXED_ORACLE)
def mixed_folder_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mixed folder — orders.parquet + slice.jsonl + notes.txt +
    notes2.txt.gz — read back through ``fmt="any"`` routing
    (``sources/union.py:_read_mixed_folder``): per-extension reader
    dispatch, batched jsonl inference, one text scan for both txt
    shards (gzip transparent), union by name with null fill."""
    from ..sources.union import read_folder_union_by_name
    from ..util import fresh_run_dir

    orders = load_table(spark, sf_dir, "orders")
    d = fresh_run_dir("mixed_folder", sf_dir)
    os.makedirs(d)

    pq = orders.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        F.col("o_totalprice").cast("double"),
    )
    pq.coalesce(1).write.parquet(os.path.join(d, "_pq"))
    _move_single_part(os.path.join(d, "_pq"), os.path.join(d, "orders.parquet"))

    js = orders.filter(F.col("o_orderkey") % 4 == 1).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus"
    )
    js.coalesce(1).write.json(os.path.join(d, "_js"))
    _move_single_part(os.path.join(d, "_js"), os.path.join(d, "slice.jsonl"))

    tx = orders.filter(F.col("o_orderkey") % 4 == 2).select(
        F.col("o_orderpriority").alias("value")
    )
    tx.coalesce(1).write.text(os.path.join(d, "_tx"))
    _move_single_part(os.path.join(d, "_tx"), os.path.join(d, "notes.txt"))

    # the gz shard comes out of Spark's own text writer with the gzip
    # codec — distributed write, nothing through the driver
    gz = orders.filter(F.col("o_orderkey") % 4 == 3).select(
        F.col("o_orderpriority").alias("value")
    )
    gz.coalesce(1).write.option("compression", "gzip").text(os.path.join(d, "_gz"))
    _move_single_part(os.path.join(d, "_gz"), os.path.join(d, "notes2.txt.gz"))

    out = read_folder_union_by_name(spark, d, fmt="any")
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
        F.col("value").cast("string").alias("value"),
    )
