"""Driver-checked lakehouse queries.

The transactional table (``sinks/lakehouse.py``) is the dataset-scale
form of the reference's Keep/Replace curation loop
(/root/reference/main.py:521-553): incoming rows replace same-key rows
and append otherwise, with deletes as the explicit third verb. Until
r11 the component was pytest-gated only (the registry saturated in r8
before it existed); this module puts a full MERGE roundtrip in the
driver's CORRECTNESS window — create from ``orders``, merge a keyed
delta (updates + inserts), delete a keyed slice, read back the latest
snapshot — with a plain-SQL DuckDB oracle restating the post-merge
state (anti-join + union + filter), so the commit log, the clustered
write layout, the Bloom/footer file-skipping stack and the snapshot
reader are all under the driver's hash check, not just pytest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import query

# The delta is derived deterministically from orders itself so DuckDB
# can restate it — and it is deliberately a key BAND, not a modulus:
# the table is range-clustered on the key, so a banded delta is the
# point-merge regime the skipping stack exists for (only the few files
# whose footer range overlaps the band are rewritten; a %-based delta
# would touch every file and the "merge" would be a full-table rewrite
# — measured 2x the wall for zero extra semantic coverage). Updates:
# keys in [100, 5000] get their price doubled and status 'U' (WHEN
# MATCHED UPDATE); inserts: keys in [100, 1100] re-enter shifted past
# the key domain as status-'N' rows (WHEN NOT MATCHED INSERT); then
# the post-merge [2000, 3200] slice is deleted. Double arithmetic is
# *2 (exact in binary floating point), so both engines hash
# identically with no rounding fence.
_MERGE_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 2 AS o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey BETWEEN 100 AND 5000
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
         o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey BETWEEN 100 AND 1100
),
merged AS (
  SELECT * FROM src
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
FROM merged
WHERE o_orderkey NOT BETWEEN 2000 AND 3200
"""


@query("lakehouse_merge_roundtrip", oracle=_MERGE_ORACLE)
def lakehouse_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-table MERGE roundtrip (r11, the r10 verdict's top
    item): bootstrap a clustered + Bloom-indexed table from ``orders``,
    MERGE a key-banded delta (price-doubled updates + shifted-key
    inserts), DELETE the [2000, 3200] key band, and return the latest
    snapshot read.

    Exercises, under the driver's DuckDB hash: the crash-atomic commit
    log (3 commits), ``cluster_by`` range layout on write, per-file
    Bloom sidecars + footer-stats hit detection in merge/delete (only
    files containing matched keys are rewritten; the rest carry by
    reference), and the manifest snapshot reader. At 100 TB the same
    plan holds: hit detection is manifest + sidecar IO plus an exact
    scan of only the hit files, the rewrite is an anti-join of those
    files against a broadcast-size key set, and untouched data is
    never read or written."""
    from ..sinks.lakehouse import TransactionalTable
    from ..util import fresh_run_dir

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    d = fresh_run_dir("lakehouse_merge", sf_dir)
    t = TransactionalTable(
        spark,
        os.path.join(d, "tbl"),
        cluster_by=["o_orderkey"],
        bloom_col="o_orderkey",
        # r13: checkpoint after EVERY commit, so the manifest-checkpoint
        # plane — the incremental builder (incl. merge/delete dirty
        # classification), the rolling pointer, and current_version's
        # forward probe — runs under the driver's hash gate too, not
        # just pytest; three one-manifest checkpoints cost ~nothing
        checkpoint_interval=1,
    )
    # n_out=16: the source is ONE parquet file at harness SFs, and the
    # default clustered width follows input width — which would funnel
    # the bootstrap through one range task and leave ONE giant file for
    # every later point merge to rewrite. 16 range files is the shape a
    # real table has, and is what lets the banded merge/delete below
    # rewrite 1-2 files instead of the table.
    t.append(base, n_out=16)
    delta = (
        base.filter(F.col("o_orderkey").between(100, 5000))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            base.filter(F.col("o_orderkey").between(100, 1100))
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    t.merge(delta, "o_orderkey")
    t.delete(
        t.read().filter(F.col("o_orderkey").between(2000, 3200)).select("o_orderkey"),
        "o_orderkey",
    )
    assert t.current_version() == 3  # append, merge, delete
    return t.read()


def _register_datasource(spark: SparkSession) -> None:
    """Idempotent ``lakehouse`` format registration for this session
    (the Python Data Source registry tolerates re-registration, but a
    per-session guard keeps the driver's 50-query loop from re-shipping
    the class every call)."""
    if not getattr(spark, "_lakehouse_ds_registered", False):
        from ..sources.lakehouse_source import LakehouseDataSource

        spark.dataSource.register(LakehouseDataSource)
        spark._lakehouse_ds_registered = True


@query("lakehouse_datasource_snapshot", oracle=_MERGE_ORACLE)
def lakehouse_datasource_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse Python Data Source's first driver row (r12, the
    r11 verdict's item 4): build the SAME append→MERGE→DELETE table as
    ``lakehouse_merge_roundtrip`` (deliberately byte-identical inputs so
    the two queries share one oracle — engine reader vs Data Source
    reader is a strategy-equivalence pair, like the fuzzy band/broadcast
    variants), then read the latest snapshot back through
    ``spark.read.format("lakehouse")`` instead of ``t.read()``.

    Under the driver's hash this exercises ``sources/lakehouse_source.py``
    end to end: manifest-driven planning (one input partition per data
    file — the file list comes from the commit log, never a directory
    listing), pyarrow worker-side reads honoring the physical column
    mapping, version pinning at plan time, and the ``_version`` /
    ``_commit_op`` provenance columns (asserted present, then projected
    away to match the shared oracle). At 100 TB the plan is the same:
    planning cost is manifest size, read cost is only the snapshot's
    live files, and workers never touch the commit log.

    The build is intentionally NOT factored into a shared helper:
    whichever sibling query is parked in a given round, the rotation
    policy keeps parked queries' code byte-stable — so each of the
    three lakehouse rows owns its build verbatim."""
    from ..sinks.lakehouse import TransactionalTable
    from ..util import fresh_run_dir

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    d = fresh_run_dir("lakehouse_ds_snap", sf_dir)
    t = TransactionalTable(
        spark,
        os.path.join(d, "tbl"),
        cluster_by=["o_orderkey"],
        bloom_col="o_orderkey",
        # r13: checkpoint after EVERY commit, so the manifest-checkpoint
        # plane — the incremental builder (incl. merge/delete dirty
        # classification), the rolling pointer, and current_version's
        # forward probe — runs under the driver's hash gate too, not
        # just pytest; three one-manifest checkpoints cost ~nothing
        checkpoint_interval=1,
    )
    t.append(base, n_out=16)
    delta = (
        base.filter(F.col("o_orderkey").between(100, 5000))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            base.filter(F.col("o_orderkey").between(100, 1100))
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    t.merge(delta, "o_orderkey")
    t.delete(
        t.read().filter(F.col("o_orderkey").between(2000, 3200)).select("o_orderkey"),
        "o_orderkey",
    )
    _register_datasource(spark)
    snap = spark.read.format("lakehouse").load(os.path.join(d, "tbl"))
    assert {"_version", "_commit_op"} <= set(snap.columns)
    return snap.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


_PUSHDOWN_ORACLE = (
    "SELECT * FROM (" + _MERGE_ORACLE + ") WHERE o_orderkey BETWEEN 4000 AND 4700"
)


@query("lakehouse_pushdown_snapshot", oracle=_PUSHDOWN_ORACLE)
def lakehouse_pushdown_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSv2 filter-pushdown reader's first driver row (r13): the
    same append→MERGE→DELETE table as ``lakehouse_merge_roundtrip``,
    read back through ``spark.read.format("lakehouse")`` with
    ``.option("filterPushdown", "true")`` and a key-band predicate —
    the pushed range becomes per-file footer-bound checks at planning,
    so only the 1-2 of 16 range-clustered files whose ranges can hold
    [4000, 4700] are ever opened (pruning behavior unit-pinned by
    test_lakehouse_datasource_filter_pushdown_prunes_files; this row
    puts the RESULT under the driver's DuckDB hash: pushdown must
    never change an answer, only the files read).

    Requires ``spark.sql.python.filterPushdown.enabled``; set here and
    left on for the session — Spark consults it lazily at every plan
    of this DataFrame, so resetting before return would break the
    driver's later collect, and the conf only affects readers that
    opt into pushFilters (ours is per-read opt-in)."""
    from ..sinks.lakehouse import TransactionalTable
    from ..util import fresh_run_dir

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    d = fresh_run_dir("lakehouse_pushdown", sf_dir)
    t = TransactionalTable(
        spark,
        os.path.join(d, "tbl"),
        cluster_by=["o_orderkey"],
        bloom_col="o_orderkey",
        checkpoint_interval=1,
    )
    t.append(base, n_out=16)
    delta = (
        base.filter(F.col("o_orderkey").between(100, 5000))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            base.filter(F.col("o_orderkey").between(100, 1100))
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    t.merge(delta, "o_orderkey")
    t.delete(
        t.read().filter(F.col("o_orderkey").between(2000, 3200)).select("o_orderkey"),
        "o_orderkey",
    )
    _register_datasource(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    snap = (
        spark.read.format("lakehouse")
        .option("filterPushdown", "true")
        .load(os.path.join(d, "tbl"))
        .filter(F.col("o_orderkey").between(4000, 4700))
    )
    return snap.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
