"""``lakehouse`` Python Data Source — the transactional table as a
first-class Spark source.

PySpark 4's Python Data Source API lets the commit log drive Spark's
own planner: after ``spark.dataSource.register(LakehouseDataSource)``,

* ``spark.read.format("lakehouse").option("version", 3).load(path)``
  reads a snapshot (time travel via ``version``), one input partition
  per data file — no driver-side union plan, and the FILE LIST comes
  from the manifest, never a directory listing;
* ``spark.readStream.format("lakehouse").load(path)`` streams the
  table's new rows with exactly-once offsets: an offset IS a committed
  version, so checkpoint replay re-reads the same immutable manifests
  and yields byte-identical batches.

Streaming semantics (Delta-source-compatible, loud where Delta is):
each micro-batch covers versions (start, end]; ``append`` commits emit
their added files' rows; ``optimize`` commits are SKIPPED (rewrite-only
— no logical rows change; Iceberg skips REPLACE snapshots the same
way); manifest-only commits (constraints, drop/rename column, expiry)
add no files and emit nothing; ``merge``/``merge_into``/``delete``/
``restore`` commits REFUSE by default — their added files mix carried
rows with changed rows, so emitting them is at-least-once with
duplicates — unless ``ignoreChanges=true`` opts into exactly that
contract, or ``ignoreDeletes=true`` (the narrower opt-in, r13) skips
DELETE-ONLY commits — files removed, none added — without accepting
rewrites (both are Delta's options of the same names; ignoreChanges
subsumes ignoreDeletes). Every emitted row carries ``_version`` (the
commit that added its file) and ``_commit_op``.

Column mapping is honored end to end: workers read PHYSICAL column
names from the files and project to the logical schema; hive partition
values come from the file path; evolution gaps read as nulls — the
same contract as ``TransactionalTable.read``, re-implemented over
pyarrow because data-source workers run plain Python with no
SparkSession.

A lagging stream whose versions were retired by ``expire_snapshots``
either serves its catch-up from the table's manifest CHECKPOINT (r13:
possible exactly when the covered history is clean appends — the
checkpoint's ``entries`` carry every live file's adding version, so
the batch is identical to the manifest walk's) or fails loudly
(FileNotFoundError) rather than silently skipping data — resync by
restarting from a fresh stream checkpoint, exactly as with Delta CDF
past retention.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_PROVENANCE = [
    StructField("_version", LongType(), False),
    StructField("_commit_op", StringType(), True),
]

# ops whose added files are pure new rows / pure rewrites — one source
# of truth with the table's checkpoint builder, whose `dirty` list must
# classify commits exactly like this reader does. Imported from the
# lakehouse_ops LEAF module (r19): this module runs in every cold
# data-source worker fork, and the full sinks.lakehouse module is
# driver-side machinery those forks never call — same guide §4.5
# import-diet rule as r18's lazy-pandas fix in sources/media.py.
from ..sinks.lakehouse_ops import (  # noqa: E402
    STREAM_APPEND_OPS as _APPEND_OPS,
    STREAM_REWRITE_OPS as _REWRITE_ONLY_OPS,
)


class _FilePartition(InputPartition):
    """One data file: everything a worker needs, precomputed on the
    driver (no table handle, no manifest IO worker-side). The file is
    addressed as (store spec, manifest-relative path) — workers rebuild
    the storage client from the picklable spec (r12: data-plane IO
    through the storage seam; an object-store port is a new spec kind,
    not engine surgery)."""

    def __init__(self, store_spec, rel, schema_json, phys, partition_values, version, op):
        self.store_spec = store_spec
        self.rel = rel
        self.schema_json = schema_json  # logical StructType JSON string
        self.phys = phys  # {logical: physical}
        self.partition_values = partition_values
        self.version = version
        self.op = op


def _table(path: str, store_spec=None):
    from ..sinks.lakehouse import TransactionalTable

    # control-plane only: schema/manifest walks never touch the
    # SparkSession the handle normally carries. ``store_spec`` (r13 —
    # the .option("storeSpec", <json>) plumbing, a JSON string or the
    # decoded dict) rebuilds a non-default store client, so tables on
    # worker-addressable network stores are readable and writable
    # through the DSv2 surface exactly like path-backed ones.
    store = None
    if store_spec:
        from ..sinks.storage import store_from_spec

        spec = (
            json.loads(store_spec)
            if isinstance(store_spec, str)
            else store_spec
        )
        store = store_from_spec(spec)
    return TransactionalTable(None, path, store=store)


def _logical_schema(
    path: str, version: int | None = None, store_spec=None
) -> StructType:
    t = _table(path, store_spec)
    v, man = t.snapshot(version)
    if v == 0:
        raise FileNotFoundError(f"no committed version at {path}")
    return StructType.fromJson(json.loads(man["schema"]))


def _file_partitions(path: str, schema_json: str, rels, version, op,
                     store_spec=None):
    """Driver-side: resolve each manifest-relative file to a worker
    partition carrying the logical→physical projection plan.
    ``schema_json`` is the schema the SOURCE declared (the latest /
    requested version's) — every emitted batch must project to it,
    whatever era the file is from; physical names are stable across
    renames, so old files read correctly under the new schema."""
    t = _table(path, store_spec)
    spec = t.store.spec()
    if spec is None:
        raise ValueError(
            "lakehouse data source: the table's store is not "
            "addressable from worker processes (no picklable spec) — "
            "read in-process stores via TransactionalTable.read"
        )
    schema = StructType.fromJson(json.loads(schema_json))
    phys = t._physical_names(schema)
    ptypes = {f.name: f.dataType for f in schema.fields}
    parts = []
    for rel in rels:
        pvals = t._parse_partition_values(rel, ptypes)
        parts.append(
            _FilePartition(
                spec,
                rel,
                schema_json,
                phys,
                pvals,
                version,
                op,
            )
        )
    return parts


def _read_file_partition(part: _FilePartition):
    """Worker-side: parquet file → arrow RecordBatches in the LOGICAL
    schema + provenance columns. The file opens through the store
    rebuilt from the partition's spec (r12), and the projection is
    ``TransactionalTable._project_arrow`` — the SAME code the engine
    reader runs (physical column if present, hive partition value if
    the column lives in the path, null otherwise), so the two readers
    cannot drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sinks.lakehouse import TransactionalTable
    from ..sinks.storage import store_from_spec

    schema = StructType.fromJson(json.loads(part.schema_json))
    store = store_from_spec(part.store_spec)
    with store.open_read(f"data/{part.rel}") as fh:
        raw = pq.read_table(fh)
    n = raw.num_rows
    out = TransactionalTable._project_arrow(
        raw, schema, part.phys, part.partition_values
    )
    out = out.append_column(
        pa.field("_version", pa.int64(), nullable=False),
        pa.array([part.version] * n, pa.int64()),
    )
    out = out.append_column(
        pa.field("_commit_op", pa.string(), nullable=True),
        pa.array([part.op] * n, pa.string()),
    )
    yield from out.combine_chunks().to_batches()


_HISTORY_SCHEMA = StructType(
    [
        StructField("version", LongType(), False),
        StructField("parent", LongType(), True),
        StructField("ts", StringType(), True),
        StructField("op", StringType(), True),
        StructField("n_files", LongType(), True),
        StructField("txn_app", StringType(), True),
        StructField("txn_version", LongType(), True),
    ]
)


class _HistoryReader(DataSourceReader):
    """DESCRIBE HISTORY as a metadata table: one row per LIVE manifest.
    The rows are control-plane-small (one JSON per commit), so they are
    resolved on the driver at planning time and shipped inside a single
    input partition — no worker-side manifest IO."""

    def __init__(self, path: str, store_spec=None):
        t = _table(path, store_spec)
        rows = []
        for man in t.history():
            txn = man.get("txn") or {}
            rows.append(
                (
                    int(man["version"]),
                    int(man["parent"]) if man.get("parent") is not None else None,
                    str(man["ts"]) if man.get("ts") is not None else None,
                    man.get("op"),
                    len(man.get("files") or []),
                    txn.get("app"),
                    int(txn["version"]) if "version" in txn else None,
                )
            )
        self.rows = rows

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        return iter(self.rows)


class _SnapshotReader(DataSourceReader):
    def __init__(self, path: str, version: int | None, store_spec=None):
        self.path = path
        self.version = version
        self.store_spec = store_spec

    def _select_rels(self, t, man) -> list:
        """The file list this read plans; the pruning subclass shrinks
        it by pushed-filter footer ranges."""
        return man["files"]

    def partitions(self):
        t = _table(self.path, self.store_spec)
        v, man = t.snapshot(self.version)
        if v == 0:
            raise FileNotFoundError(f"no committed version at {self.path}")
        return _file_partitions(
            self.path,
            man["schema"],
            self._select_rels(t, man),
            v,
            man.get("op") or "snapshot",
            store_spec=self.store_spec,
        )

    def read(self, partition):
        # Spark's planner represents an EMPTY partitions() list as one
        # None partition (plan_data_source_read) — a fully-pruned read
        # or an all-rows-deleted snapshot must yield nothing, not crash
        if partition is None:
            return
        yield from _read_file_partition(partition)


# Bloom layer probe cap for pushed IN lists — the planning-time mirror
# of the engine's _BLOOM_PROBE_CAP rationale: a bulk key set touches
# most files anyway, and hashing k positions x |keys| per surviving
# file serially on the driver would turn planning into the scan it is
# supposed to avoid. Range pruning still applies above the cap.
_PUSHDOWN_BLOOM_PROBE_CAP = 1_000


class _PruningSnapshotReader(_SnapshotReader):
    """Snapshot reader with FILE-SKIPPING filter pushdown (r13):
    null-rejecting comparison filters become per-column [lo, hi]
    bounds tested against each data file's manifest footer range —
    `df.filter(key == k)` through plain ``spark.read`` then opens only
    the files that can hold ``k``, exactly like the engine reader's
    ``read(prune=...)`` (partition values ride the same stats as
    min==max, so hive pruning falls out too). Skipping is conservative
    and ADVISORY: every pushed filter is returned unhandled, so Spark
    re-applies the full predicate to the surviving files — correctness
    never depends on the stats.

    Opt-in via ``.option("filterPushdown", "true")`` because Spark
    REFUSES any reader that merely implements ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false (its default)
    — shipping this on the default reader would break every session
    that has not enabled the conf."""

    def __init__(self, path: str, version: int | None, store_spec=None):
        super().__init__(path, version, store_spec)
        # per-instance from birth: one plan's pushed filters must never
        # leak into another reader (class-level defaults would be a
        # shared-mutable trap the moment anything appends in place)
        self._constraints: list = []
        self._point_probes: list = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualNullSafe,
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        cons = []
        probes = []  # (col, point keys) for the Bloom sidecar layer
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue  # nested columns: no file stats recorded
            col = attr[0]
            # only NULL-REJECTING shapes prune: footer min/max exclude
            # nulls, so a no-overlap verdict proves no MATCHING row —
            # IsNull/IsNotNull/Not/string matches stay unhandled-only
            if isinstance(f, (EqualTo, EqualNullSafe)):
                # = NULL matches nothing; <=> NULL matches nulls, which
                # stats cannot see — both prune only on a real value
                if f.value is not None:
                    cons.append((col, f.value, f.value))
                    probes.append((col, (f.value,)))
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                # strictness ignored: an endpoint-only overlap keeps the
                # file (conservative), never drops one
                if f.value is not None:
                    cons.append((col, f.value, None))
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                if f.value is not None:
                    cons.append((col, None, f.value))
            elif isinstance(f, In):
                vals = [x for x in f.value if x is not None]
                if vals:
                    try:
                        cons.append((col, min(vals), max(vals)))
                    except TypeError:
                        pass  # mixed/unorderable values: no pruning
                    if len(vals) <= _PUSHDOWN_BLOOM_PROBE_CAP:
                        probes.append((col, tuple(vals)))
        self._constraints = cons
        self._point_probes = probes
        return filters  # ALL unhandled: Spark re-applies everything

    def _select_rels(self, t, man) -> list:
        rels = man["files"]
        if not (self._constraints or self._point_probes):
            return rels
        stats = man.get("stats") or {}
        schema = StructType.fromJson(json.loads(man["schema"]))
        pm = t._physical_names(schema)  # stats keys are physical
        for col, lo, hi in self._constraints:
            rels = [
                rel
                for rel in rels
                if t._range_overlap(stats.get(rel), pm.get(col, col), lo, hi)
            ]
        # the Bloom layer under the ranges: a point probe (=, IN) on
        # the table's bloom_col drops files whose sidecar PROVES every
        # probed key absent — the hash-like-key case footer ranges
        # cannot see. Same conservative contract (sidecar missing /
        # different column / non-int-str key keeps the file), applied
        # AFTER range pruning so at most the range survivors pay the
        # sidecar read.
        for col, keys in self._point_probes:
            pcol = pm.get(col, col)
            rels = [
                rel
                for rel in rels
                if not t._bloom_excludes(stats.get(rel), keys, pcol)
            ]
        return rels


class _ChangeStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        starting_version: int,
        ignore_changes: bool,
        declared_schema_json: str,
        store_spec=None,
        ignore_deletes: bool = False,
    ):
        self.path = path
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes
        # Delta's narrower opt-in: accept DELETE-ONLY commits (files
        # removed, none added) by skipping them — removed rows are not
        # retractable in an append-only stream — without accepting
        # rewrites (those still need ignoreChanges). ignoreChanges
        # subsumes this, exactly as in Delta.
        self.ignore_deletes = ignore_deletes
        self.declared_schema_json = declared_schema_json
        self.store_spec = store_spec

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        # No maxVersionsPerTrigger-style admission control, deliberately:
        # this API's latestOffset never sees the CHECKPOINTED start, so
        # any self-tracked cap re-anchors wrong after a restart and can
        # announce an offset BELOW the committed one — Spark would plan
        # a bogus empty batch, commit the regressed offset, and then
        # re-deliver already-processed versions. Until the planner
        # passes the start (or per-partition admission lands in the
        # Python API), a fresh stream over a long history pays one big
        # first batch — bounded per version by that version's file
        # count, and startingVersion/startingTimestamp cut the history.
        return {"version": _table(self.path, self.store_spec).current_version()}

    def partitions(self, start: dict, end: dict):
        t = _table(self.path, self.store_spec)
        if end["version"] <= start["version"]:
            return []
        # every batch projects to the schema this source instance
        # DECLARED at planning time (a rename committing mid-stream
        # must not flip batch schemas under Spark); physical names are
        # stable across renames so any era's files read correctly
        end_schema = self.declared_schema_json
        parts = []
        sv, ev = start["version"], end["version"]
        # Checkpoint shortcut (r13): when a manifest checkpoint at C in
        # (sv, ev] exists and no commit in (sv, C] changed the file set
        # non-appendably, the checkpoint's entries — live files with
        # their adding version/op — ARE the walk's output for (sv, C],
        # file for file (clean appends never remove, so every added
        # file of the range is still live). Catch-up over a long
        # history then reads ONE object instead of every manifest, and
        # works even below the expiry cutoff. Any dirt in range, an
        # entries-less (gap-degraded) checkpoint, or no checkpoint at
        # all falls back to the plain walk — identical semantics,
        # including the ignoreChanges refusal.
        walk_from = sv
        # pointer pre-check: a caught-up stream (sv at-or-past the
        # newest checkpoint — every steady-state trigger) must not GET
        # and parse the O(live files) checkpoint object just to discover
        # the shortcut cannot apply; one tiny pointer read decides
        # (r13 review finding 4). A pointer past ev (old-range replay)
        # still consults the listing for an older checkpoint — rare by
        # construction. A missing/corrupt pointer skips the shortcut
        # outright: advisory plane, the walk is always correct.
        pv = t._pointer_version()
        ck = t.latest_checkpoint(max_version=ev) if (
            pv is not None and pv > sv
        ) else None
        if (
            ck is not None
            and ck.get("entries") is not None
            and ck.get("dirty") is not None
            and sv < int(ck["version"]) <= ev
            and all(int(d) <= sv for d in ck["dirty"])
        ):
            groups: dict[int, tuple[str, list]] = {}
            for rel, v_add, op in ck["entries"]:
                if int(v_add) > sv:  # <= C by construction
                    groups.setdefault(int(v_add), (op, []))[1].append(rel)
            # resolve store spec / schema / partition types ONCE for the
            # whole checkpoint range (per-version _file_partitions calls
            # would re-resolve them per commit — O(history) table
            # constructions, defeating the single-object read)
            spec = t.store.spec()
            if spec is None:
                raise ValueError(
                    "lakehouse data source: the table's store is not "
                    "addressable from worker processes (no picklable "
                    "spec) — read in-process stores via "
                    "TransactionalTable.read"
                )
            schema = StructType.fromJson(json.loads(end_schema))
            phys = t._physical_names(schema)
            ptypes = {f.name: f.dataType for f in schema.fields}
            for v_add in sorted(groups):
                op, rels = groups[v_add]
                parts.extend(
                    _FilePartition(
                        spec,
                        rel,
                        end_schema,
                        phys,
                        t._parse_partition_values(rel, ptypes),
                        v_add,
                        op,
                    )
                    for rel in rels
                )
            prev_files = {rel for rel, _v, _op in ck["entries"]}
            walk_from = int(ck["version"])
        else:
            # each manifest is read exactly once: the loop carries the
            # previous version's file set forward (the naive parent
            # lookup doubled control-plane IO — r11 review finding 7)
            prev_files = (
                set(t._read_manifest(sv)["files"]) if sv >= 1 else set()
            )
        for v in range(walk_from + 1, ev + 1):
            man = t._read_manifest(v)  # loud when expired: no silent gaps
            op = man.get("op") or "unknown"
            cur_files = set(man["files"])
            added = [rel for rel in man["files"] if rel not in prev_files]
            removed = prev_files - cur_files
            prev_files = cur_files
            if op in _REWRITE_ONLY_OPS:
                continue  # compaction: contents identical by contract
            if v == 1 and added:
                op = "append"  # bootstrap: the whole table is new rows
            if op not in _APPEND_OPS:
                # a delete can REMOVE whole files while adding none —
                # skipping it would stream 'nothing changed' over a
                # data change (r11 review finding 3), so any non-append
                # commit that touched the file set refuses without the
                # opt-in, exactly like Delta absent ignoreChanges/
                # ignoreDeletes
                if (
                    not added
                    and removed
                    and (self.ignore_deletes or self.ignore_changes)
                ):
                    continue  # delete-only commit, explicitly opted out
                if (added or removed) and not self.ignore_changes:
                    raise ValueError(
                        f"version {v} is a {op!r} commit that changed the "
                        "file set: streaming its added files duplicates "
                        "carried rows, and its removed files are not "
                        "representable in an append-only stream. Pass "
                        ".option('ignoreChanges', 'true') to accept "
                        "at-least-once delivery of rewritten files, or "
                        ".option('ignoreDeletes', 'true') if only "
                        "delete-only commits need skipping (both are "
                        "Delta's contracts), or consume via "
                        "TransactionalTable.consume_changes for exact CDC."
                    )
                if not added:
                    continue
            elif not added:
                continue  # manifest-only commit: no new rows
            parts.extend(
                _file_partitions(
                    self.path, end_schema, added, v, op,
                    store_spec=self.store_spec,
                )
            )
        return parts

    def read(self, partition):
        if partition is None:  # empty plan, same contract as batch
            return
        yield from _read_file_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to acknowledge

    def stop(self) -> None:
        pass


def _exclusive_start_for_timestamp(t, timestamp: float) -> int:
    """Delta-compatible ``startingTimestamp`` resolution (r11 ADVICE):
    the stream must include every commit at-or-AFTER the instant —
    including one landing at exactly that timestamp — and an instant
    predating the first commit streams from the beginning instead of
    raising. The exclusive start offset is therefore the newest live
    version committed strictly BEFORE the instant, 0 when there is
    none. (``version_at``'s at-or-before rule is right for TIMESTAMP
    AS OF reads but, used as an exclusive stream start, drops a commit
    whose time equals the instant and raises on pre-history instants.)
    Same descending walk / expiry skip / mtime fallback as
    ``version_at``; a start resolved below an expired version still
    fails loudly at read time, exactly like ``startingVersion``.

    Below the newest manifest checkpoint the answer comes from its
    recorded (version, ts) pairs (r13) — O(interval + log history)
    like ``version_at``, and strictly MORE exact than the walk when
    the boundary version itself was expired: the walk could only slide
    down to the next live manifest (re-delivering a commit that
    predates the instant), while the checkpoint knows the true
    boundary — an exclusive start offset need not be live."""
    ckv = t._pointer_version()
    for v in range(t.current_version(), 0, -1):
        if ckv is not None and v <= ckv:
            cands = t._checkpoint_ts_candidates(
                ckv, v, timestamp, inclusive=False
            )
            if cands is not None:
                # no liveness probe: an exclusive start offset need
                # not be live, and the checkpoint's answer is exact
                return cands[0] if cands else 0
            ckv = None  # unreadable checkpoint: plain walk continues
        try:
            man = t._read_manifest(v)
        except FileNotFoundError:
            continue
        ts = man.get("ts")
        if ts is None:
            try:
                ts = t.store.mtime(t._manifest_rel(v))
            except FileNotFoundError:
                continue  # expired between the manifest read and the
                # mtime probe: skip, exactly like version_at's walk
        if ts < timestamp:
            return v
    return 0


class _StagedFiles(WriterCommitMessage):
    def __init__(self, rels):
        self.rels = rels


def _plan_write(path: str, incoming: StructType, overwrite: bool,
                store_spec=None):
    """Driver-side (planning) write validation shared by the batch and
    stream writers. Returns (txn id, phys map for the TASKS to write
    under, incoming schema json). Loud refusals for what a
    session-less external writer cannot honor: layout policies need
    the engine's shuffle, CHECK constraints need a SparkSession to
    evaluate — both keep working through TransactionalTable.append."""
    t = _table(path, store_spec)
    v, man = t.snapshot()
    if v > 0:
        if man.get("partition_by"):
            raise ValueError(
                "lakehouse writer: table is partitioned — hive layout "
                "needs the engine's shuffle; write via "
                "TransactionalTable.append"
            )
        cb = man.get("cluster_by") or []
        incoming_names = {f.name for f in incoming.fields}
        if cb and (
            not overwrite or any(c in incoming_names for c in cb)
        ):
            # appends must honor the clustering invariant (needs the
            # engine's shuffle); an overwrite may proceed only when it
            # DROPS the cluster column — the policy is then removed
            # from the manifest — otherwise it would persist a policy
            # its own files do not satisfy
            raise ValueError(
                "lakehouse writer: table has a cluster_by policy — "
                "range clustering needs the engine's shuffle; write "
                "via TransactionalTable.append"
            )
        if man.get("constraints"):
            raise ValueError(
                "lakehouse writer: table has CHECK constraints — "
                "enforcement needs a SparkSession; write via "
                "TransactionalTable.append"
            )
        if not overwrite:
            t._check_schema_compatible(
                StructType.fromJson(json.loads(man["schema"])), incoming
            )
    import uuid as _uuid

    txn = f"txn-{_uuid.uuid4().hex}"
    # tasks write PHYSICAL names; appends adopt the table's mapping,
    # overwrite/bootstrap writes are identity (their files never share
    # a manifest with pre-existing live files)
    phys = (
        t._physical_names(StructType.fromJson(json.loads(man["schema"])))
        if v > 0 and not overwrite
        else {}
    )
    spec = t.store.spec()
    if spec is None:
        raise ValueError(
            "lakehouse data source: the table's store is not "
            "addressable from worker processes (no picklable spec) — "
            "write to in-process stores via TransactionalTable.append"
        )
    return txn, phys, incoming.json(), spec


def _write_arrow_partition(store_spec, txn, phys, iterator):
    """Task-side: arrow batches → one staged parquet part file under
    data/<txn>/ with PHYSICAL column names, streamed through the store
    rebuilt from ``store_spec`` (r12: staged-file IO through the
    storage seam, same route as the read tasks). A unique filename per
    ATTEMPT means a retried task never collides; losing attempts'
    files are orphans until vacuum (the commit references only the
    files of messages Spark reports as committed)."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sinks.storage import store_from_spec

    store = store_from_spec(store_spec)
    name = f"part-{_uuid.uuid4().hex}.parquet"
    writer = None
    fh = None
    n = 0
    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            tbl = tbl.rename_columns(
                [phys.get(c, c) for c in tbl.column_names]
            )
            if writer is None:
                # the object is created only when the task has rows
                fh = store.open_write(f"data/{txn}/{name}")
                writer = pq.ParquetWriter(fh, tbl.schema)
            writer.write_table(tbl)
            n += tbl.num_rows
    except BaseException:
        # Failed attempt: never publish the partial object. Stores
        # with PUT-on-complete writers (MemoryStore) expose abort();
        # plain file stores just close — their stray attempt-named
        # file is unreferenced by any commit and vacuumable.
        try:
            if writer is not None:
                writer.close()
        except Exception:
            pass
        finally:
            if fh is not None:
                getattr(fh, "abort", fh.close)()
        raise
    if writer is not None:
        writer.close()
    if fh is not None:
        fh.close()
    return _StagedFiles([f"{txn}/{name}"] if n else [])


def _commit_staged(
    path: str,
    messages,
    overwrite: bool,
    incoming_schema_json: str,
    staged_phys: dict | None = None,
    txn_app: str | None = None,
    txn_version: int | None = None,
    store_spec=None,
) -> None:
    """Driver-side commit: footer stats + Bloom sidecars for the staged
    files, then the same optimistic slot-claim loop as append/merge.
    With txn markers (the stream writer passes (app, batchId)) a
    replayed epoch is a no-op — exactly-once table state.

    ``staged_phys`` is the logical→physical column mapping the TASKS
    wrote their files under (captured at write planning). Each commit
    retry revalidates it against the mapping the CURRENT manifest
    implies — names/types compatibility alone misses a drop-then-re-add
    of a column between planning and commit, which keeps the logical
    schema identical while retiring the staged files' physical name;
    committing those files would read that column back as all-NULL
    (silent data loss). The engine-side ``append`` restages on exactly
    this race (r11 finding 5); a session-less external writer cannot
    restage, so it refuses and the staged files become vacuum orphans
    (r11 ADVICE, medium)."""
    from ..sinks.lakehouse import CommitConflict

    t = _table(path, store_spec)
    rels = sorted(rel for m in messages if m is not None for rel in m.rels)
    incoming = StructType.fromJson(json.loads(incoming_schema_json))
    stats = {}
    bcol_phys = None
    if t.bloom_col is not None:
        bcol_phys = t._physical_names(incoming).get(t.bloom_col, t.bloom_col)
    for rel in rels:
        s = t._file_stats(rel)
        if s is not None:
            stats[rel] = s
            if bcol_phys is not None:
                bloom = t._build_bloom(rel, s, bcol_phys)
                if bloom is not None:
                    s["bloom"] = bloom
    for _ in range(20):
        v, man = t.snapshot()
        done = t._txn_already_applied(txn_app, txn_version, v)
        if done is not None:
            return
        if man.get("constraints"):
            # a CHECK constraint added between planning and commit:
            # this session-less writer cannot evaluate it over the
            # staged rows, and committing unchecked rows would break
            # the invariant that every live row satisfies every
            # manifest constraint — refuse; the staged files are
            # unreferenced orphans for vacuum (r11 review finding 6)
            raise ValueError(
                "lakehouse writer: table gained CHECK constraints after "
                "write planning — enforcement needs a SparkSession; "
                "rewrite via TransactionalTable.append"
            )
        if v > 0 and not overwrite:
            # revalidate against the CURRENT schema (the planning check
            # may have raced a schema change)
            cur_schema = StructType.fromJson(json.loads(man["schema"]))
            t._check_schema_compatible(cur_schema, incoming)
            cur_phys = t._physical_names(cur_schema)
            ghosts = sorted(
                c
                for c in incoming.names
                if (staged_phys or {}).get(c, c) != cur_phys.get(c, c)
            )
            if ghosts:
                raise ValueError(
                    "lakehouse writer: column mapping changed between "
                    f"write planning and commit for {ghosts} (rename or "
                    "drop-then-re-add raced this write) — the staged "
                    "files carry retired physical names and would read "
                    "back NULL; staged files are left as vacuum "
                    "orphans, re-run the write"
                )
            out_schema = man["schema"]
            files = man["files"] + rels
            merged_stats = {**(man.get("stats") or {}), **stats}
            op = "append"
        else:
            out_schema = incoming_schema_json
            files = list(rels)
            merged_stats = dict(stats)
            op = "overwrite" if v > 0 else "append"
        manifest = t._next_manifest(
            v, man, op, files, out_schema, merged_stats, txn_app, txn_version
        )
        if t._try_commit(v + 1, manifest):
            return
    raise CommitConflict(f"lakehouse writer lost 20 commit races at {path}")


class _BatchWriter(DataSourceArrowWriter):
    def __init__(self, path, incoming: StructType, overwrite: bool,
                 table_store_spec=None):
        self.path = path
        self.overwrite = overwrite
        self.table_store_spec = table_store_spec
        self.txn, self.phys, self.schema_json, self.store_spec = _plan_write(
            path, incoming, overwrite, store_spec=table_store_spec
        )

    def write(self, iterator):
        return _write_arrow_partition(
            self.store_spec, self.txn, self.phys, iterator
        )

    def commit(self, messages) -> None:
        _commit_staged(
            self.path, messages, self.overwrite, self.schema_json, self.phys,
            store_spec=self.table_store_spec,
        )

    def abort(self, messages) -> None:
        pass  # staged files are unreferenced orphans; vacuum reclaims


class _StreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming sink: each epoch appends under a
    (streamAppId, batchId) txn marker, so foreachBatch-style replays
    after a crash commit nothing the table has already seen — the
    same contract as stream_merge_into_table, with zero glue code:
    ``df.writeStream.format("lakehouse").option("checkpointLocation",
    ...).start(path)``."""

    def __init__(self, path, incoming: StructType, app_id: str,
                 table_store_spec=None):
        self.path = path
        self.app_id = app_id
        self.table_store_spec = table_store_spec
        # validation runs HERE (stream planning, driver-side); tasks
        # only stage files. phys is epoch-independent for appends
        # (commit-time revalidation catches mapping races — r12).
        _, self.phys, self.incoming_json, self.store_spec = _plan_write(
            path, incoming, overwrite=False, store_spec=table_store_spec
        )

    def write(self, iterator):
        # per-TASK txn dir (uuid): tasks of one epoch stage into their
        # own dirs; the epoch's commit references them all, and a
        # replayed epoch's freshly staged files stay orphans because
        # the txn-marker check skips the commit
        import uuid as _uuid

        return _write_arrow_partition(
            self.store_spec, f"txn-{_uuid.uuid4().hex}", self.phys, iterator
        )

    def commit(self, messages, batchId: int) -> None:
        _commit_staged(
            self.path,
            messages,
            overwrite=False,
            incoming_schema_json=self.incoming_json,
            staged_phys=self.phys,
            txn_app=self.app_id,
            txn_version=batchId,
            store_spec=self.table_store_spec,
        )

    def abort(self, messages, batchId: int) -> None:
        pass  # orphans; vacuum reclaims


class LakehouseDataSource(DataSource):
    """``spark.dataSource.register(LakehouseDataSource)`` then
    ``spark.read.format("lakehouse")`` / ``spark.readStream.format(
    "lakehouse")``. Options: ``path`` (required), ``version`` /
    ``timestampAsOf`` (batch time travel — explicit version, or UNIX
    time resolved by ``version_at``'s at-or-before rule; mutually
    exclusive), ``startingVersion`` / ``startingTimestamp`` (stream
    start — exclusive version, or UNIX time resolved via the same
    rule as TIMESTAMP AS OF; default 0 = from the beginning),
    ``ignoreChanges`` (stream past non-append commits,
    at-least-once), ``streamAppId`` (required for the stream SINK:
    txn-marker namespace), ``storeSpec`` (r13: JSON of
    ``Store.spec()`` for tables living on a non-default store — e.g.
    the network object store — letting the DSv2 surface plan and
    write against them; defaults to the path-backed LocalStore)."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("lakehouse source requires .load(<table path>)")
        return p

    def _table_store_spec(self):
        return self.options.get("storeSpec")

    def _pinned_version(self) -> int:
        """Resolve 'latest' EXACTLY ONCE per source instance: schema()
        and reader() (and every re-plan of the same DataFrame) must see
        the same snapshot, or a commit landing between load() and an
        action would crash the read on schema drift — or silently
        return rows from a newer version than the declared schema
        (r11 review finding 4).

        ``timestampAsOf`` (r17, the r16 verdict's item 3) is the
        Delta-compatible batch time travel companion to ``version``:
        a UNIX timestamp resolved through ``version_at``'s at-or-before
        rule (newest live manifest committed at or before the instant —
        checkpoint-assisted, O(interval + log history), never a full
        history walk). Resolution happens HERE so the pin covers plan
        AND read like an explicit version; passing both options is
        ambiguous and refuses."""
        if not hasattr(self, "_resolved_version"):
            version = self.options.get("version")
            ts = self.options.get("timestampAsOf")
            if version is not None and ts is not None:
                raise ValueError("pass version OR timestampAsOf, not both")
            if ts is not None:
                self._resolved_version = _table(
                    self._path(), self._table_store_spec()
                ).version_at(float(ts))
            elif version is not None:
                self._resolved_version = int(version)
            else:
                self._resolved_version = _table(
                    self._path(), self._table_store_spec()
                ).current_version()
        return self._resolved_version

    def schema(self) -> StructType:
        if self.options.get("metadata") == "history":
            return _HISTORY_SCHEMA
        base = _logical_schema(
            self._path(), self._pinned_version(), self._table_store_spec()
        )
        return StructType(list(base.fields) + list(_PROVENANCE))

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.options.get("metadata") == "history":
            return _HistoryReader(self._path(), self._table_store_spec())
        # .option("filterPushdown", "true") selects the file-skipping
        # reader; opt-in because Spark refuses any pushFilters-bearing
        # reader while spark.sql.python.filterPushdown.enabled (default
        # false) is off — see _PruningSnapshotReader
        cls = (
            _PruningSnapshotReader
            if str(self.options.get("filterPushdown", "false")).lower()
            == "true"
            else _SnapshotReader
        )
        return cls(
            self._path(), self._pinned_version(), self._table_store_spec()
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        start = int(self.options.get("startingVersion", 0))
        ts = self.options.get("startingTimestamp")
        if ts is not None:
            if "startingVersion" in self.options:
                raise ValueError(
                    "pass startingVersion OR startingTimestamp, not both"
                )
            start = _exclusive_start_for_timestamp(
                _table(self._path(), self._table_store_spec()), float(ts)
            )
        # capture the MANIFEST's schema JSON (field metadata carries the
        # physical column mapping, which may not survive the JVM round
        # trip through the ``schema`` argument); at planning time it is
        # exactly the logical schema this source declared
        return _ChangeStreamReader(
            self._path(),
            start,
            str(self.options.get("ignoreChanges", "false")).lower() == "true",
            _logical_schema(
                self._path(), self._pinned_version(), self._table_store_spec()
            ).json(),
            store_spec=self._table_store_spec(),
            ignore_deletes=str(
                self.options.get("ignoreDeletes", "false")
            ).lower()
            == "true",
        )

    def writer(self, schema: StructType, overwrite: bool):
        return _BatchWriter(
            self._path(), schema, overwrite,
            table_store_spec=self._table_store_spec(),
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "lakehouse stream sink supports append output mode only"
            )
        # the txn-marker app id is REQUIRED: batch ids restart at 0 per
        # checkpoint, so a shared default would make a SECOND query
        # writing the same table silently no-op its early epochs
        # against the first query's markers (r11 review finding 2 —
        # silent data loss; PySpark injects no query id option we
        # could scope this by)
        app_id = self.options.get("streamAppId")
        if not app_id:
            raise ValueError(
                "lakehouse stream sink requires .option('streamAppId', "
                "<stable per-pipeline id>): epoch txn markers are keyed "
                "by it, and distinct pipelines writing one table must "
                "not share a marker namespace"
            )
        return _StreamWriter(
            self._path(), schema, app_id,
            table_store_spec=self._table_store_spec(),
        )
