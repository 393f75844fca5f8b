"""Transactional lakehouse sink (sinks/lakehouse.py): commit-log
semantics the staged-swap ``upsert_sink`` cannot give — concurrent
writers with no lost rows, file-level merge pruning, time travel,
orphan vacuum. Reference semantics: Keep/Replace at dataset scale
(/root/reference/main.py:521-553) == MERGE by key."""

from __future__ import annotations

import json
import os

import pytest

from data_finder_comparator_spark.sinks.lakehouse import (
    CommitConflict,
    TransactionalTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lakehouse_merge_bootstrap_and_upsert(spark, tmp_path):
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, k string, v double"
    )
    assert t.merge(base, "id") == 1
    assert _rows(t.read()) == _rows(base)

    up = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], "id long, k string, v double")
    assert t.merge(up, "id") == 2
    expect = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, k string, v double",
    )
    assert _rows(t.read()) == _rows(expect)
    # time travel: version 1 still reads the pre-merge table
    assert _rows(t.read(version=1)) == _rows(base)


def test_lakehouse_merge_rewrites_only_affected_files(spark, tmp_path):
    """The 100-TB property: a merge touching keys in ONE data file
    carries every other file into the new manifest BY REFERENCE."""
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    # two appends => two txn dirs; the second holds only ids 100..104
    a = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "id long, k string")
    b = spark.createDataFrame([(100 + i, f"s{i}") for i in range(5)], "id long, k string")
    t.merge(a, "id")
    t.append(b)
    v2 = t.snapshot()[1]["files"]
    up = spark.createDataFrame([(102, "S2!")], "id long, k string")
    t.merge(up, "id")
    v3 = t.snapshot()[1]["files"]
    # every file NOT containing id 102 must appear verbatim in v3
    carried = set(v2) & set(v3)
    assert carried, "merge rewrote every file — pruning is broken"
    # the file(s) holding id 102 must NOT carry over
    rewritten = set(v2) - set(v3)
    assert rewritten, "no file was rewritten for the matched key"
    got = {(r.id, r.k) for r in t.read().collect()}
    assert (102, "S2!") in got and (102, "s2") not in got
    assert len(got) == 10


def test_lakehouse_concurrent_merges_no_lost_rows(spark, tmp_path):
    """Two interleaved merges (VERDICT r8 item 4): writer B commits
    BETWEEN writer A's data-file write and A's commit attempt. A's
    first claim must fail, and its retry must re-merge against B's
    snapshot — both writers' rows survive."""
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(i, "base", float(i)) for i in range(10)], "id long, src string, v double"
    )
    t.merge(base, "id")

    b_df = spark.createDataFrame([(3, "B", -3.0), (50, "B", 50.0)], "id long, src string, v double")
    a_df = spark.createDataFrame([(7, "A", -7.0), (60, "A", 60.0)], "id long, src string, v double")

    fired = {"n": 0}

    def sneak_in_writer_b():
        if fired["n"] == 0:  # only before A's FIRST commit attempt
            t.merge(b_df, "id")
        fired["n"] += 1

    v = t.merge(a_df, "id", before_commit=sneak_in_writer_b)
    # A needed two attempts: B took v2, A landed v3
    assert v == 3 and fired["n"] == 2
    got = {(r.id, r.src) for r in t.read().collect()}
    assert (3, "B") in got and (50, "B") in got   # B's merge survived
    assert (7, "A") in got and (60, "A") in got   # A's merge applied
    assert (3, "base") not in got and (7, "base") not in got
    assert len(got) == 12  # 8 untouched base + 2 B + 2 A


def test_lakehouse_conflict_exhaustion_raises(spark, tmp_path):
    """A writer that loses every race surfaces CommitConflict instead
    of spinning or silently dropping the write."""
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    t.merge(spark.createDataFrame([(1, "x")], "id long, k string"), "id")

    def always_steal():
        # steal the next version slot directly in the commit log
        v, man = t.snapshot()
        with open(t._strip_scheme(t._manifest_path(v + 1)), "w") as f:
            json.dump({"version": v + 1, "parent": v, "op": "steal",
                       "files": man["files"], "schema": man["schema"]}, f)

    with pytest.raises(CommitConflict):
        t.merge(
            spark.createDataFrame([(2, "y")], "id long, k string"),
            "id",
            max_retries=3,
            before_commit=always_steal,
        )


def test_lakehouse_vacuum_removes_only_orphans(spark, tmp_path):
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    t.merge(spark.createDataFrame([(1, "a")], "id long, k string"), "id")
    t.merge(spark.createDataFrame([(1, "A2")], "id long, k string"), "id")
    # plant an orphan txn dir (a crashed writer's data files)
    orphan_dir = tmp_path / "tbl" / "data" / "txn-orphan"
    os.makedirs(orphan_dir)
    (orphan_dir / "part-000.parquet").write_bytes(b"bogus")
    removed = t.vacuum()
    assert removed == ["txn-orphan/part-000.parquet"]
    # both snapshots still read (historical files kept for time travel)
    assert [r.k for r in t.read(version=1).collect()] == ["a"]
    assert [r.k for r in t.read(version=2).collect()] == ["A2"]


def test_lakehouse_append_only_commit(spark, tmp_path):
    t = TransactionalTable(spark, str(tmp_path / "tbl"))
    a = spark.createDataFrame([(1, "a")], "id long, k string")
    b = spark.createDataFrame([(2, "b")], "id long, k string")
    t.append(a)
    t.append(b)
    assert t.current_version() == 2
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    # append never rewrites: v1's file set is a strict subset of v2's
    f1 = t.snapshot(1)[1]["files"]
    f2 = t.snapshot(2)[1]["files"]
    assert set(f1) < set(f2)
