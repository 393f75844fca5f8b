"""Manifest checkpoints (r13): Delta-style commit-log rollups.

Every `checkpoint_interval` commits (and before every expiry) the
table writes a checkpoint object — the live file list annotated with
each file's adding version/op, the non-append ("dirty") version list,
and the (version, commit-ts) pairs — plus a rolling `_last_checkpoint`
pointer. What these buy, each pinned here:

* `current_version` / the stream's `latestOffset` probe FORWARD from
  the pointer instead of listing the whole commit log — flat in
  history length;
* a fresh stream's catch-up over clean-append history serves from ONE
  checkpoint object instead of walking every manifest — byte-identical
  partitions to the walk, proven by direct comparison;
* `version_at` binary-searches the checkpoint's recorded commit times
  below the descending walk's reach;
* a lagging stream below the expiry cutoff still serves clean-append
  history (expiry checkpoints first), while dirty history keeps the
  loud FileNotFoundError/resync contract;
* everything is ADVISORY: corrupt/missing pointer or checkpoint
  degrades to the plain walk, never to a wrong answer.

Most tests fabricate manifests directly through `_try_commit` (the
checkpoint plane is pure control-plane JSON — no Spark needed); one
end-to-end test drives a real readStream over an expired history.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from data_finder_comparator_spark.sinks.lakehouse import (
    _CKPT_POINTER,
    TransactionalTable,
)
from data_finder_comparator_spark.sources.lakehouse_source import (
    _ChangeStreamReader,
)
from pyspark.sql.types import LongType, StructField, StructType

SCHEMA_JSON = StructType([StructField("id", LongType())]).json()


def _mk_table(tmp_path, interval=4):
    return TransactionalTable(
        None, str(tmp_path / "tbl"), checkpoint_interval=interval
    )


def _commit(t, v, op, files, ts=None):
    man = {
        "version": v,
        "parent": v - 1,
        "op": op,
        "ts": time.time() + v if ts is None else ts,
        "files": list(files),
        "schema": SCHEMA_JSON,
        "stats": {},
        "txns": {},
    }
    assert t._try_commit(v, man), f"slot {v} already claimed"


def _append_chain(t, n, start=1, prefix="txn", files=None):
    """n clean single-file appends; returns the running file list.
    Continuations (start > 1) must pass the prior ``files`` list —
    an append's manifest carries the FULL file set, so omitting it
    fabricates an overwrite."""
    files = list(files or [])
    for v in range(start, start + n):
        files.append(f"{prefix}{v}/part-0.parquet")
        _commit(t, v, "append", files)
    return files


def _parts(reader, start, end):
    return [
        (p.rel, p.version, p.op)
        for p in reader.partitions({"version": start}, {"version": end})
    ]


def _walk_parts(t, reader, start, end):
    """partitions() with the checkpoint plane disabled — the reference
    walk the shortcut must reproduce file-for-file."""
    orig = TransactionalTable.latest_checkpoint
    TransactionalTable.latest_checkpoint = (
        lambda self, max_version=None: None
    )
    try:
        return _parts(reader, start, end)
    finally:
        TransactionalTable.latest_checkpoint = orig


def test_checkpoint_cadence_pointer_and_fast_head(tmp_path):
    """Every interval-th commit writes a checkpoint + advances the
    pointer; current_version probes forward from it and stays correct
    as commits land past the newest checkpoint."""
    t = _mk_table(tmp_path, interval=4)
    _append_chain(t, 10)
    assert t._pointer_version() == 8  # cadence: v4 superseded by v8
    ck = t.latest_checkpoint()
    assert ck["version"] == 8 and len(ck["entries"]) == 8
    assert ck["dirty"] == []
    assert t.current_version() == 10  # probe walks 8 -> 10
    # checkpoint objects for both cadence hits exist until expiry
    assert t._load_checkpoint(4) is not None
    # an interval of 0 disables the cadence entirely
    t2 = TransactionalTable(
        None, str(tmp_path / "tbl2"), checkpoint_interval=0
    )
    _append_chain(t2, 5)
    assert t2._pointer_version() is None
    assert t2.current_version() == 5  # listing fallback


def test_catchup_via_checkpoint_matches_walk_exactly(tmp_path):
    """Clean-append history (with a manifest-only commit mixed in):
    the checkpoint-served catch-up equals the manifest walk partition
    for partition — rel, version and op — from any start offset."""
    t = _mk_table(tmp_path, interval=4)
    files = _append_chain(t, 6)
    _commit(t, 7, "add_constraint", files)  # manifest-only: no rows
    _append_chain(t, 2, start=8, prefix="late", files=files)  # v8 ckpt fires
    files = json.loads(
        t.store.read_bytes(t._manifest_rel(9))
    )["files"]
    assert t._pointer_version() == 8
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    for start in (0, 3, 7):
        assert _parts(r, start, 9) == _walk_parts(t, r, start, 9), start
    # bootstrap op normalization: v1's files stream as 'append'
    assert _parts(r, 0, 9)[0][2] == "append"


def test_dirty_range_refuses_like_walk_and_past_dirt_serves(tmp_path):
    """A merge inside the covered range blocks the shortcut: the
    refusal (no ignoreChanges) is identical to the walk's; a start
    offset past the dirt re-enables the shortcut, still walk-equal."""
    t = _mk_table(tmp_path, interval=4)
    _commit(t, 1, "append", ["txn1/a.parquet"])
    _commit(t, 2, "append", ["txn1/a.parquet", "txn2/b.parquet"])
    # merge rewrites file a
    _commit(t, 3, "merge", ["txn2/b.parquet", "txn3/rw.parquet"])
    _commit(
        t, 4, "append", ["txn2/b.parquet", "txn3/rw.parquet", "txn4/c.parquet"]
    )
    assert t.latest_checkpoint()["dirty"] == [3]
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    with pytest.raises(ValueError, match="ignoreChanges"):
        r.partitions({"version": 0}, {"version": 4})
    assert _parts(r, 3, 4) == _walk_parts(t, r, 3, 4)
    # ignoreChanges over the dirty range: checkpoint must NOT shortcut
    # (it would miss the merge-added file grouping) — walk fallback,
    # identical to the no-checkpoint result
    r2 = _ChangeStreamReader(t.path, 0, True, SCHEMA_JSON)
    assert _parts(r2, 0, 4) == _walk_parts(t, r2, 0, 4)
    assert ("txn3/rw.parquet", 3, "merge") in _parts(r2, 0, 4)


def test_optimize_is_dirty_for_the_stream_shortcut(tmp_path):
    """Compaction changes the file set but no logical row: the walk
    skips its files entirely, so the shortcut must refuse the range
    (entries carry the compacted file, not the originals it replaced)."""
    t = _mk_table(tmp_path, interval=2)
    _append_chain(t, 2)
    _commit(t, 3, "optimize", ["txn3/compact.parquet"])
    _commit(t, 4, "append", ["txn3/compact.parquet", "txn4/d.parquet"])
    assert t.latest_checkpoint()["dirty"] == [3]
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    got = _parts(r, 0, 4)
    assert got == _walk_parts(t, r, 0, 4)
    assert not any(rel.startswith("txn3/") for rel, _v, _op in got)


def test_corrupt_pointer_and_checkpoint_are_advisory(tmp_path):
    """Torn pointer, truncated checkpoint, pointer at a missing
    checkpoint: every reader degrades to the listing/walk and stays
    correct."""
    t = _mk_table(tmp_path, interval=4)
    _append_chain(t, 9)
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    want = _walk_parts(t, r, 0, 9)
    # torn pointer bytes
    t.store.put(_CKPT_POINTER, b"not json {")
    assert t.current_version() == 9
    assert t.latest_checkpoint()["version"] == 8  # listing scan fallback
    assert _parts(r, 0, 9) == want
    # pointer at a version with no checkpoint object
    t.store.put(_CKPT_POINTER, json.dumps({"version": 7}).encode())
    assert t.current_version() == 9
    assert _parts(r, 0, 9) == want
    # truncated checkpoint object under a valid pointer
    t.store.put(t._checkpoint_rel(8), b'{"version": 8, "entr')
    t.store.put(_CKPT_POINTER, json.dumps({"version": 8}).encode())
    assert t.current_version() == 9
    assert t.latest_checkpoint()["version"] == 4  # next-best readable
    assert _parts(r, 0, 9) == want
    # version_at still resolves through the degraded plane
    ts3 = json.loads(t.store.read_bytes(t._manifest_rel(3)))["ts"]
    assert t.version_at(ts3 + 1e-4) == 3


def test_expiry_checkpoints_first_and_serves_lagging_clean_stream(tmp_path):
    """expire_snapshots writes a head checkpoint before deleting, so a
    stream starting below the cutoff over clean-append history gets its
    whole catch-up from the checkpoint — where the walk alone would die
    on the first expired manifest. Dirty history keeps the loud
    failure. Old checkpoint objects are pruned to the newest two."""
    t = _mk_table(tmp_path, interval=4)
    _append_chain(t, 10)
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    want = _parts(r, 0, 10)
    assert t.expire_snapshots(keep_last=1) == list(range(1, 10))
    assert t.current_version() == 10
    assert _parts(r, 0, 10) == want  # served from ckpt-v10
    with pytest.raises(FileNotFoundError):
        _walk_parts(t, r, 0, 10)  # the walk alone is dead — shortcut did it
    # ckpt pruning: cadence wrote v4/v8, expiry wrote v10 — keep 2
    assert t._load_checkpoint(4) is None
    assert t._load_checkpoint(8) is not None
    assert t._load_checkpoint(10) is not None
    # dirty history below the cutoff: loud failure, not silent serve
    t2 = _mk_table(tmp_path / "dirty", interval=0)
    _commit(t2, 1, "append", ["txn1/a.parquet"])
    _commit(t2, 2, "merge", ["txn2/rw.parquet"])
    _commit(t2, 3, "append", ["txn2/rw.parquet", "txn3/b.parquet"])
    t2.expire_snapshots(keep_last=1)
    r2 = _ChangeStreamReader(t2.path, 0, True, SCHEMA_JSON)
    with pytest.raises(FileNotFoundError):
        r2.partitions({"version": 0}, {"version": 3})


def test_version_at_binary_search_matches_walk(tmp_path):
    """Below the newest checkpoint, version_at answers from the
    checkpoint's (version, ts) pairs — same result as the full
    descending walk for every commit instant, and expired versions
    are skipped identically (ValueError when nothing old enough
    survives)."""
    t = _mk_table(tmp_path, interval=4)
    base = time.time()
    files = []
    for v in range(1, 10):
        files.append(f"txn{v}/part-0.parquet")
        _commit(t, v, "append", files, ts=base + 10 * v)
    for v in range(1, 10):
        assert t.version_at(base + 10 * v + 1) == v
        assert t.version_at(base + 10 * v) == v
    with pytest.raises(ValueError):
        t.version_at(base + 5)  # predates v1
    t.expire_snapshots(keep_last=2)
    assert t.version_at(base + 91) == 9
    assert t.version_at(base + 81) == 8
    with pytest.raises(ValueError):
        t.version_at(base + 79)  # only expired versions are that old


def test_current_version_pointer_below_cutoff_falls_back(tmp_path):
    """A stale pointer whose checkpoint manifest was expired (e.g. a
    crashed expiry's leftovers) must not strand the probe: the missing
    base manifest routes to the authoritative listing."""
    t = _mk_table(tmp_path, interval=4)
    _append_chain(t, 6)
    t.expire_snapshots(keep_last=1)  # pointer -> 6, manifests 1..5 gone
    t.store.put(_CKPT_POINTER, json.dumps({"version": 3}).encode())
    assert t.current_version() == 6  # manifest v3 missing -> listing


def test_streaming_e2e_catchup_from_checkpoint_after_expiry(
    spark, tmp_path
):
    """Real table, real readStream: appends past the cadence, expire
    everything but the head, then a FRESH stream (no prior offsets)
    still delivers every row — its first batch plans from the manifest
    checkpoint, including file reads below the expiry cutoff (clean
    appends are never vacuumable: every file is still live at head)."""
    from data_finder_comparator_spark.sources.lakehouse_source import (
        LakehouseDataSource,
    )

    spark.dataSource.register(LakehouseDataSource)
    path = str(tmp_path / "tbl")
    t = TransactionalTable(spark, path, checkpoint_interval=3)
    for i in range(5):
        t.append(
            spark.createDataFrame([(i, f"r{i}")], "id long, v string")
        )
    t.expire_snapshots(keep_last=1)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("lakehouse")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r.v, r._version)
        for r in spark.read.parquet(out)
        .select("id", "v", "_version")
        .collect()
    )
    assert got == [(i, f"r{i}", i + 1) for i in range(5)]


def test_checkpoint_rebases_past_gap_onto_full_checkpoint(tmp_path):
    """The degradation race (r13 review finding 3): an expiry
    checkpoints at ITS head then deletes old manifests while another
    writer builds from an older base and hits the gap. The gapped
    build must REBASE onto the surviving full checkpoint — one race
    must not degrade the table's checkpoints forever."""
    t = _mk_table(tmp_path, interval=4)
    files = _append_chain(t, 8)  # full checkpoints at 4 and 8, pointer at 8
    # simulate the racer's view: manifests 1..5 expired, pointer
    # regressed to the OLD checkpoint so the next build walks the gap
    for v in range(1, 6):
        t.store.delete(t._manifest_rel(v))
    t.store.put(_CKPT_POINTER, json.dumps({"version": 4}).encode())
    _append_chain(t, 1, start=9, prefix="late", files=files)
    t.write_checkpoint()  # base ckpt-4 -> gap at v5 -> rebase on ckpt-8
    ck = t.latest_checkpoint()
    assert ck["version"] == 9 and ck.get("entries") is not None
    assert len(ck["entries"]) == 9 and ck["dirty"] == []
    # and the stream shortcut works over the (expired) history again
    r = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    assert [p[1] for p in _parts(r, 0, 9)] == list(range(1, 10))


def test_degraded_checkpoint_base_recovers_to_full(tmp_path):
    """A degraded (entries-less) checkpoint that became the newest one
    must not be inherited forever: the next build prefers the newest
    FULL checkpoint as its base and comes out full again when every
    manifest since it is live."""
    t = _mk_table(tmp_path, interval=0)
    files = _append_chain(t, 6)
    t.write_checkpoint()  # full ckpt-6
    files = _append_chain(t, 2, start=7, prefix="late", files=files)
    t.store.put_if_absent(
        t._checkpoint_rel(8),
        json.dumps(
            {"version": 8, "ts": 0.0, "entries": None, "dirty": None,
             "version_ts": []}
        ).encode(),
    )
    t.store.put(_CKPT_POINTER, json.dumps({"version": 8}).encode())
    _append_chain(t, 1, start=9, prefix="x", files=files)
    t.write_checkpoint()
    ck = t.latest_checkpoint()
    assert ck["version"] == 9 and ck.get("entries") is not None
    assert len(ck["entries"]) == 9


def test_starting_timestamp_resolution_via_checkpoint(tmp_path):
    """startingTimestamp's exclusive-start resolution answers from the
    checkpoint's recorded commit times below the walk's reach — same
    result as the walk for live history, and EXACT (not slid down to
    the next live manifest) when the boundary version was expired."""
    from data_finder_comparator_spark.sources.lakehouse_source import (
        _exclusive_start_for_timestamp,
    )

    t = _mk_table(tmp_path, interval=4)
    base = time.time()
    files = []
    for v in range(1, 10):
        files.append(f"txn{v}/part-0.parquet")
        _commit(t, v, "append", files, ts=base + 10 * v)
    # parity with the walk on live history: exclusive start = newest
    # version strictly BEFORE the instant
    for v in range(1, 10):
        assert _exclusive_start_for_timestamp(t, base + 10 * v) == v - 1
        assert _exclusive_start_for_timestamp(t, base + 10 * v + 1) == v
    assert _exclusive_start_for_timestamp(t, base) == 0
    # expired boundary: keep_last=2 retires 1..7; an instant just past
    # v5's commit must still resolve to exactly 5 (the walk alone could
    # only answer 0 here and re-deliver v1..v5)
    t.expire_snapshots(keep_last=2)
    assert _exclusive_start_for_timestamp(t, base + 51) == 5


def test_ignore_deletes_skips_delete_only_commits(tmp_path):
    """Delta's narrower opt-in: ignoreDeletes accepts DELETE-ONLY
    commits (files removed, none added) by skipping them, while
    rewrite commits still demand ignoreChanges; without either flag
    the delete-only commit refuses loudly, naming both options."""
    t = _mk_table(tmp_path, interval=0)
    _commit(t, 1, "append", ["txn1/a.parquet"])
    _commit(t, 2, "append", ["txn1/a.parquet", "txn2/b.parquet"])
    # delete drops a whole file, adds nothing
    _commit(t, 3, "delete", ["txn2/b.parquet"])
    _commit(t, 4, "append", ["txn2/b.parquet", "txn4/c.parquet"])

    plain = _ChangeStreamReader(t.path, 0, False, SCHEMA_JSON)
    with pytest.raises(ValueError, match="ignoreDeletes"):
        plain.partitions({"version": 0}, {"version": 4})

    skip_deletes = _ChangeStreamReader(
        t.path, 0, False, SCHEMA_JSON, ignore_deletes=True
    )
    got = _parts(skip_deletes, 0, 4)
    assert [(p[0], p[1]) for p in got] == [
        ("txn1/a.parquet", 1),
        ("txn2/b.parquet", 2),
        ("txn4/c.parquet", 4),
    ]
    # a REWRITE commit is not covered by ignoreDeletes
    _commit(t, 5, "merge", ["txn2/b.parquet", "txn4/c.parquet", "txn5/rw.parquet"])
    _commit(t, 6, "delete", ["txn4/c.parquet", "txn5/rw.parquet"])
    with pytest.raises(ValueError, match="ignoreChanges"):
        skip_deletes.partitions({"version": 4}, {"version": 6})
    # ignoreChanges subsumes ignoreDeletes: both commits pass
    both = _ChangeStreamReader(t.path, 0, True, SCHEMA_JSON)
    assert [p[1] for p in _parts(both, 4, 6)] == [5]


def test_half_null_checkpoint_degrades_not_crashes(tmp_path):
    """entries and dirty degrade together by construction; a hand-edited
    checkpoint with entries present but dirty null must read as
    unreadable (walk fallback) instead of crashing the incremental
    builder — one malformed object must never wedge expire_snapshots."""
    t = _mk_table(tmp_path, interval=0)
    files = _append_chain(t, 3)
    t.write_checkpoint()
    ck = json.loads(t.store.read_bytes(t._checkpoint_rel(3)))
    ck["dirty"] = None  # entries stay
    t.store.delete(t._checkpoint_rel(3))
    t.store.put_if_absent(
        t._checkpoint_rel(3), json.dumps(ck).encode()
    )
    assert t.latest_checkpoint() is None  # structurally invalid
    _append_chain(t, 1, start=4, files=files)
    assert t.write_checkpoint() == 4  # rebuilt from scratch, no crash
    assert t.latest_checkpoint()["version"] == 4
    assert t.expire_snapshots(keep_last=1) == [1, 2, 3]


def test_mid_sweep_probe_returns_listing_not_stale_head(tmp_path):
    """A reader whose pointer was REGRESSED by the _advance_pointer race
    and who walks into a concurrent expiry sweep must fall back to the
    listing, never return a stale head (r13 ADVICE #1). Simulated at
    the existence-probe level: manifest 5 is alive when the probe
    starts, 6 is already swept, and 5 is gone by the post-walk
    re-check — exactly the ascending-sweep TOCTOU interleaving."""
    t = _mk_table(tmp_path, interval=4)
    _append_chain(t, 10)
    t.write_checkpoint()
    # the race's end state: pointer regressed below the sweep range
    t.store.put(_CKPT_POINTER, json.dumps({"version": 5}).encode())
    real = t._object_exists
    seen = {"v5": 0}

    def fake(rel):
        if rel.endswith("v00000005.json"):
            seen["v5"] += 1
            return seen["v5"] == 1  # alive at probe start, swept by re-check
        if rel.endswith("v00000006.json"):
            return False  # sweep already deleted it
        return real(rel)

    t._object_exists = fake
    assert t.current_version() == 10  # listing fallback, not stale 5
    assert seen["v5"] >= 2  # the post-walk liveness re-check ran


def test_advance_pointer_repairs_stale_overwrite(tmp_path):
    """_advance_pointer re-reads after its put and re-puts when a racing
    stale writer clobbered it (r13 ADVICE #1): simulate the bad
    interleaving by turning our first pointer put into the racer's
    stale value landing after ours."""
    t = _mk_table(tmp_path, interval=0)
    _append_chain(t, 3)
    real_put = t.store.put
    state = {"raced": False}

    def racing_put(rel, data):
        if rel == _CKPT_POINTER and not state["raced"]:
            state["raced"] = True
            # our put lands, then the stale racer overwrites: net effect
            real_put(rel, json.dumps({"version": 1}).encode())
            return None
        return real_put(rel, data)

    t.store.put = racing_put
    t._advance_pointer(2)
    assert t._pointer_version() == 2  # repaired, not left at the racer's 1


def test_checkpoint_version_ts_pruned_to_live_and_capped(tmp_path, monkeypatch):
    """The checkpoint's (version, ts) list is bounded (r13 ADVICE #2):
    pairs below the oldest live manifest are pruned at the next build
    (they can never be a version_at answer — candidates are
    liveness-probed), and the hard cap backstops never-expiring
    tables."""
    import data_finder_comparator_spark.sinks.lakehouse as lh

    t = _mk_table(tmp_path, interval=4)
    files = _append_chain(t, 12)
    t.write_checkpoint()
    ck = t.latest_checkpoint()
    assert [v for v, _ in ck["version_ts"]] == list(range(1, 13))

    t.expire_snapshots(keep_last=3)  # deletes manifests 1..9
    files = _append_chain(t, 2, start=13, files=files)
    t.write_checkpoint()
    ck = t.latest_checkpoint()
    assert [v for v, _ in ck["version_ts"]] == list(range(10, 15))

    monkeypatch.setattr(lh, "_VERSION_TS_CAP", 3)
    _append_chain(t, 1, start=15, files=files)
    t.write_checkpoint()
    ck = t.latest_checkpoint()
    assert [v for v, _ in ck["version_ts"]] == [13, 14, 15]


def test_starting_timestamp_mtime_expiry_race_skips_not_crashes(tmp_path):
    """A manifest with no ``ts`` field whose file expires between the
    walk's read and the mtime probe must be SKIPPED — the same race
    tolerance version_at's walk has (r14 review: the stream-start
    resolver previously crashed FileNotFoundError here)."""
    from data_finder_comparator_spark.sources.lakehouse_source import (
        _exclusive_start_for_timestamp,
    )

    t = _mk_table(tmp_path, interval=0)
    base = time.time()
    files = []
    for v in range(1, 4):
        files.append(f"txn{v}/part-0.parquet")
        man = {
            "version": v,
            "parent": v - 1,
            "op": "append",
            "files": list(files),
            "schema": SCHEMA_JSON,
            "stats": {},
            "txns": {},
        }
        if v != 2:
            man["ts"] = base + 10 * v
        assert t._try_commit(v, man)
    os.utime(
        t._strip_scheme(t._manifest_path(2)), (base + 20, base + 20)
    )
    # sanity: with the file present, the mtime fallback answers
    assert _exclusive_start_for_timestamp(t, base + 21) == 2
    real_mtime = t.store.mtime

    def racing_mtime(rel):
        if rel.endswith("v00000002.json"):
            raise FileNotFoundError(rel)  # expired mid-walk
        return real_mtime(rel)

    t.store.mtime = racing_mtime
    # v2 skipped like version_at's walk: the answer slides to v1
    assert _exclusive_start_for_timestamp(t, base + 21) == 1


# ---------------------------------------------------------------------------
# Randomized-history property: the checkpoint plane (pointer probe,
# version_at resolution, checkpoint-served stream planning, version_ts
# prune/cap) must agree with a pure-Python reference model under ANY
# interleaving of commits, expiries, and checkpoint builds — the fixed
# scenarios above pin known shapes; this hunts the interleavings they
# don't reach. Control-plane only: no Spark, each example is a few
# dozen tiny JSON files.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HISTORY_OPS = st.lists(
    st.one_of(
        st.just(("append",)),
        st.just(("merge",)),
        st.just(("delete",)),
        st.tuples(st.just("expire"), st.integers(min_value=1, max_value=3)),
        st.just(("checkpoint",)),
    ),
    min_size=1,
    max_size=24,
)


@settings(
    deadline=None,
    max_examples=40,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=_HISTORY_OPS)
def test_checkpoint_plane_randomized_history(tmp_path_factory, ops):
    from data_finder_comparator_spark.sources.lakehouse_source import (
        _ChangeStreamReader,
    )

    t = TransactionalTable(
        None,
        str(tmp_path_factory.mktemp("ckpt_prop") / "tbl"),
        checkpoint_interval=3,
    )
    base = 1_000_000.0
    model: dict[int, tuple[str, tuple, float]] = {}  # v -> (op, files, ts)
    live: set[int] = set()
    files: list[str] = []
    v = 0
    counter = 0
    for op in ops:
        kind = op[0]
        if kind == "expire":
            if v:
                t.expire_snapshots(keep_last=op[1])
                live -= set(range(1, v - max(op[1], 1) + 1))
            continue
        if kind == "checkpoint":
            t.write_checkpoint()
            continue
        v += 1
        if kind == "append" or not files:
            counter += 1
            files = files + [f"f{counter}.parquet"]
            op_name = "append"
        elif kind == "merge":  # rewrite: drop oldest, add one
            counter += 1
            files = files[1:] + [f"f{counter}.parquet"]
            op_name = "merge"
        else:  # delete-only: files removed, none added
            files = files[1:]
            op_name = "delete"
        _commit(t, v, op_name, files, ts=base + 10 * v)
        model[v] = (op_name, tuple(files), base + 10 * v)
        live.add(v)

    # head + latest snapshot match the model whatever the interleaving
    assert t.current_version() == v
    if v == 0:
        return
    assert set(t.snapshot()[1]["files"]) == set(model[v][1])

    def check_version_at():
        for probe_v in range(1, v + 1):
            inst = base + 10 * probe_v + 5
            exp = max((u for u in live if u <= probe_v), default=None)
            if exp is None:
                with pytest.raises(ValueError):
                    t.version_at(inst)
            else:
                assert t.version_at(inst) == exp

    check_version_at()
    # a fresh checkpoint (exercising the incremental builder + the
    # version_ts prune/cap against however the history expired) must
    # not change any resolution
    t.write_checkpoint()
    assert t.current_version() == v
    check_version_at()

    # stream planning from just past the last dirt/expiry: the range is
    # pure appends, so whether it serves from the checkpoint shortcut
    # or the walk, the planned (version -> files) must equal the
    # model's per-version additions
    dirty = {u for u, (o, _f, _ts) in model.items() if o != "append"}
    expired = set(model) - live
    sv = max(dirty | expired, default=0)
    if v > sv:
        reader = _ChangeStreamReader(t.path, sv, False, t.snapshot()[1]["schema"])
        try:
            parts = reader.partitions({"version": sv}, {"version": v})
        except FileNotFoundError:
            parts = None  # sv's manifest expired and no eligible ckpt
        if parts is not None:
            got: dict[int, set] = {}
            for p in parts:
                got.setdefault(p.version, set()).add(p.rel)
            exp_add: dict[int, set] = {}
            for u in range(sv + 1, v + 1):
                prevf = set(model[u - 1][1]) if u - 1 in model else set()
                add_u = set(model[u][1]) - prevf
                if add_u:
                    exp_add[u] = add_u
            assert got == exp_add
