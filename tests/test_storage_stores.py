"""Storage-adapter seam (r10 verdict item 6): the commit/cursor/vacuum
protocol must hold on a backend with NO rename, NO hard links and NO
directories — the object-store shape. ``MemoryStore`` is that fake;
the conformance tests below run every primitive against BOTH backends,
and the table-level tests drive the full commit protocol over a
``MemoryStore`` so nothing in it secretly depends on POSIX semantics.
(Crash-injection tests that corrupt manifest files on disk stay
LocalStore-only in test_lakehouse.py — they test the local fsync/link
discipline itself.)"""

from __future__ import annotations

import json
import threading

import pytest

from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable
from data_finder_comparator_spark.sinks.storage import LocalStore, MemoryStore


@pytest.fixture(params=["local", "memory", "http"])
def store(request, tmp_path):
    if request.param == "local":
        yield LocalStore(str(tmp_path / "store"))
        return
    if request.param == "memory":
        yield MemoryStore()
        return
    # the loopback network store (r13): every conformance test below
    # also proves the PROTOCOL holds over an actual wire — ranged GET,
    # If-None-Match PUT as the slot claim, HEAD-backed size/mtime
    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    server, base = serve_store_http()
    try:
        yield HttpStore(base)
    finally:
        server.shutdown()


def test_store_put_if_absent_single_winner(store):
    """The slot claim: exactly one of N racing writers wins, and the
    slot holds the WINNER's complete payload."""
    results = {}

    def claim(i):
        results[i] = store.put_if_absent("c/v1.json", f"writer-{i}".encode())

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, won in results.items() if won]
    assert len(winners) == 1
    assert store.read_bytes("c/v1.json") == f"writer-{winners[0]}".encode()
    # a later claim on the same slot always loses
    assert store.put_if_absent("c/v1.json", b"late") is False


def test_store_put_read_list_delete_mtime(store):
    store.put("a/b/x.json", b"1")
    store.put("a/b/y.json", b"2")
    store.put("a/z.bin", b"3")
    store.put("other/w", b"4")
    assert store.list("a") == ["b/x.json", "b/y.json", "z.bin"]
    assert store.list("a/b") == ["x.json", "y.json"]
    assert store.list("missing") == []
    assert store.read_bytes("a/b/x.json") == b"1"
    m1 = store.mtime("a/b/x.json")
    store.put("a/b/x.json", b"1'")  # overwrite allowed
    assert store.read_bytes("a/b/x.json") == b"1'"
    assert store.mtime("a/b/x.json") >= m1
    store.delete("a/b/x.json")
    store.delete("a/b/x.json")  # missing-ok
    assert store.list("a/b") == ["y.json"]
    with pytest.raises(FileNotFoundError):
        store.read_bytes("a/b/x.json")
    with pytest.raises(FileNotFoundError):
        store.mtime("a/b/x.json")


def test_store_lock_serializes(store):
    """The cursor lock: read-modify-write under lock loses no update."""
    store.put("cur", b"0")

    def bump():
        for _ in range(50):
            with store.lock("cur"):
                n = int(store.read_bytes("cur"))
                store.put("cur", str(n + 1).encode())

    threads = [threading.Thread(target=bump) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert int(store.read_bytes("cur")) == 200


def test_lakehouse_commit_protocol_on_memory_store(spark, tmp_path):
    """Full table lifecycle with manifests/cursors/sidecars living in
    a MemoryStore (nothing under _commits on disk): append, merge with
    bloom+stats skipping, time travel, txn-marker idempotence, CDC
    cursors, expire — the protocol needs only the adapter primitives."""
    st = MemoryStore()
    t = TransactionalTable(spark, str(tmp_path / "tbl"), bloom_col="id", store=st)
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, k string, v double"
        )
    )
    t.merge(
        spark.createDataFrame([(2, "B", -2.0), (3, "c", 3.0)], "id long, k string, v double"),
        "id",
    )
    assert not (tmp_path / "tbl" / "_commits").exists()  # control plane off disk
    assert sorted(n for n in st.list("_commits")) == ["v00000001.json", "v00000002.json"]
    assert any(n.endswith(".bloom") for n in st.list("_index"))
    got = {(r.id, r.k) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    old = {(r.id, r.k) for r in t.read(version=1).collect()}
    assert old == {(1, "a"), (2, "b")}
    # a second handle sharing the store sees the same table
    t2 = TransactionalTable(spark, str(tmp_path / "tbl"), store=st)
    assert t2.bloom_col == "id"  # inherited from the in-store manifest
    assert t2.current_version() == 2
    # txn-marker idempotence: replaying (app, version) is a no-op
    df = spark.createDataFrame([(9, "z", 9.0)], "id long, k string, v double")
    v3 = t2.merge(df, "id", txn_app="stream", txn_version=7)
    assert t2.merge(df, "id", txn_app="stream", txn_version=7) == v3
    assert t2.current_version() == 3
    # CDC cursor protocol over the store
    poll = t2.consume_changes("job", "id")
    assert poll["to_version"] == 3 and poll["frame"] is not None
    t2.ack("job", poll["to_version"])
    t2.ack("job", 1)  # stale: must not rewind
    assert t2.consumer_cursor("job") == 3
    assert t2.consume_changes("job", "id")["frame"] is None
    # expire retires old manifests from the store; it also writes the
    # r13 manifest checkpoint (object + pointer) before deleting
    expired = t2.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    names = st.list("_commits")
    assert [n for n in names if n.startswith("v")] == ["v00000003.json"]
    assert "ckpt-v00000003.json" in names and "_last_checkpoint.json" in names
    with pytest.raises(FileNotFoundError):
        t2.read(version=1)


def test_lakehouse_concurrent_merges_on_memory_store(spark, tmp_path):
    """The OCC race on the no-rename backend: writer B sneaks a commit
    between A's data write and A's claim; A's retry re-merges against
    B's snapshot — no lost rows, same as the LocalStore test."""
    st = MemoryStore()
    t = TransactionalTable(spark, str(tmp_path / "tbl"), store=st)
    base = spark.createDataFrame(
        [(i, "base") for i in range(8)], "id long, src string"
    )
    t.merge(base, "id")
    b_df = spark.createDataFrame([(3, "B"), (50, "B")], "id long, src string")
    a_df = spark.createDataFrame([(5, "A"), (60, "A")], "id long, src string")
    fired = {"n": 0}

    def sneak_in_writer_b():
        if fired["n"] == 0:
            t.merge(b_df, "id")
        fired["n"] += 1

    v = t.merge(a_df, "id", before_commit=sneak_in_writer_b)
    assert v == 3 and fired["n"] == 2
    got = {(r.id, r.src) for r in t.read().collect()}
    assert {(3, "B"), (50, "B"), (5, "A"), (60, "A")} <= got
    assert len(got) == 10


def test_lakehouse_vacuum_protocol_on_memory_store(spark, tmp_path):
    """Vacuum's enumerate/retention/delete cycle runs entirely on the
    adapter: an orphan data object older than the window is reclaimed,
    a referenced one never is, and the retention guard keeps young
    orphans (in-flight writers) alive."""
    st = MemoryStore()
    t = TransactionalTable(spark, str(tmp_path / "tbl"), store=st)
    t.append(spark.createDataFrame([(1, "a")], "id long, k string"))
    man = json.loads(st.read_bytes("_commits/v00000001.json"))
    referenced = man["files"][0]
    # the referenced data file lives on the DATA plane (disk), but give
    # the store a shadow entry to prove vacuum skips referenced names
    st.put(f"data/{referenced}", b"shadow")
    st.put("data/txn-dead/part-0.parquet", b"orphan")
    st.put("data/txn-live/part-0.parquet", b"young-orphan")
    # age the dead orphan past the window; keep the young one fresh
    st._mtimes["data/txn-dead/part-0.parquet"] -= 3600.0
    removed = t.vacuum(retention_seconds=60.0)
    assert removed == ["txn-dead/part-0.parquet"]
    assert st.read_bytes(f"data/{referenced}") == b"shadow"
    assert st.read_bytes("data/txn-live/part-0.parquet") == b"young-orphan"
    # quiesced pass reclaims the rest
    assert t.vacuum(retention_seconds=0) == ["txn-live/part-0.parquet"]


def test_store_data_plane_primitives(store):
    """r12 (data plane through the seam): open_read returns a seekable
    binary file-like (what pyarrow needs for footer-last reads),
    open_write publishes a complete object on close (PUT-on-complete —
    partial writes must never be visible as the final object on a
    backend with object semantics), and size() reports object length
    or raises FileNotFoundError."""
    with store.open_write("data/t/part-1.bin") as f:
        f.write(b"hello ")
        f.write(b"world")
    assert store.read_bytes("data/t/part-1.bin") == b"hello world"
    assert store.size("data/t/part-1.bin") == 11
    with store.open_read("data/t/part-1.bin") as f:
        assert f.read(5) == b"hello"
        f.seek(6)
        assert f.read() == b"world"
    with pytest.raises(FileNotFoundError):
        store.size("data/t/absent.bin")
    # spec(): LocalStore round-trips through a worker rebuild;
    # MemoryStore says "not shippable" (None) rather than pickling a
    # dict snapshot that writes would silently never reach
    from data_finder_comparator_spark.sinks.storage import store_from_spec

    spec = store.spec()
    if isinstance(store, MemoryStore):
        assert spec is None
    else:
        rebuilt = store_from_spec(spec)
        assert rebuilt.read_bytes("data/t/part-1.bin") == b"hello world"


def test_store_parquet_roundtrip_via_file_likes(store):
    """pyarrow parquet write→read through the store's file-likes —
    the exact IO pattern of staged data-source files and relay data
    files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})
    with store.open_write("data/t/p.parquet") as f:
        pq.write_table(tbl, f)
    with store.open_read("data/t/p.parquet") as f:
        assert pq.read_table(f).equals(tbl)
    with store.open_read("data/t/p.parquet") as f:
        assert pq.ParquetFile(f).metadata.num_rows == 3


def test_memory_store_open_write_abort_never_publishes():
    """r12 ADVICE #4: open_write's close() used to publish the buffer
    even when the writer aborted mid-stream, so a partial/corrupt
    object became visible under its final name — weaker than the
    PUT-on-complete semantics the docstring claims. Aborts (explicit
    or via an exception inside ``with``) must publish nothing; only a
    clean close puts."""
    store = MemoryStore()
    # explicit abort
    f = store.open_write("data/t1/a.bin")
    f.write(b"partial")
    f.abort()
    with pytest.raises(FileNotFoundError):
        store.read_bytes("data/t1/a.bin")
    # exception inside the context manager
    with pytest.raises(RuntimeError, match="mid-stream"):
        with store.open_write("data/t1/b.bin") as g:
            g.write(b"also partial")
            raise RuntimeError("writer failed mid-stream")
    with pytest.raises(FileNotFoundError):
        store.read_bytes("data/t1/b.bin")
    # clean close (direct and via with) still publishes exactly once
    h = store.open_write("data/t1/c.bin")
    h.write(b"complete")
    h.close()
    assert store.read_bytes("data/t1/c.bin") == b"complete"
    with store.open_write("data/t1/d.bin") as i:
        i.write(b"managed")
    assert store.read_bytes("data/t1/d.bin") == b"managed"
    # close after abort stays a no-op (finally-blocks double-close)
    f.close()
    with pytest.raises(FileNotFoundError):
        store.read_bytes("data/t1/a.bin")


def test_http_read_range_tolerates_200_full_body():
    """RFC 7233 lets a server (or an intervening proxy) ignore Range
    and answer 200 with the whole object; read_range must slice to the
    asked window instead of handing parquet probes the wrong bytes
    (r13 review finding 2)."""
    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    server, base = serve_store_http()
    try:
        st = HttpStore(base)
        st.put("obj", b"0123456789")
        orig = st._request

        def strip_range(method, url, data=None, headers=None):
            headers = dict(headers or {})
            headers.pop("Range", None)  # a proxy that drops Range
            return orig(method, url, data=data, headers=headers)

        st._request = strip_range
        assert st.read_range("obj", 2, 3) == b"234"
        assert st.read_range("obj", 8, 5) == b"89"  # over-long tail clamps
    finally:
        server.shutdown()


def test_http_store_retries_transient_failures(monkeypatch):
    """Object stores throttle (5xx) and connections reset; the client
    must absorb a transient burst with backoff and only surface an
    error once the retry budget is exhausted."""
    import io
    import urllib.error
    import urllib.request

    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    server, base = serve_store_http()
    try:
        st = HttpStore(base)
        st._BACKOFF_S = 0.001
        st.put("obj", b"payload")
        real_build = urllib.request.build_opener
        fails = {"n": 0, "exc": ConnectionResetError("injected")}

        class Flaky:
            def __init__(self, real):
                self.real = real

            def open(self, req, timeout=None):
                if fails["n"] > 0:
                    fails["n"] -= 1
                    raise fails["exc"]
                return self.real.open(req, timeout=timeout)

        monkeypatch.setattr(
            urllib.request,
            "build_opener",
            lambda *h: Flaky(real_build(*h)),
        )
        # two connection resets, then success — absorbed
        fails["n"] = 2
        assert st.read_bytes("obj") == b"payload"
        assert fails["n"] == 0
        # a 503 burst takes the HTTP-status retry branch
        fails["n"] = 2
        fails["exc"] = urllib.error.HTTPError(
            base + "/o/obj", 503, "throttled", {}, io.BytesIO(b"")
        )
        assert st.read_bytes("obj") == b"payload"
        # budget exhausted: the failure surfaces, never an infinite loop
        fails["n"] = 99
        fails["exc"] = ConnectionResetError("injected")
        with pytest.raises(ConnectionError):
            st.read_bytes("obj")
    finally:
        server.shutdown()


def test_http_conditional_put_ambiguous_outcome_resolves_by_readback():
    """The S3 conditional-PUT ambiguity: our attempt is applied
    server-side but the response is lost, so the retry sees 412 against
    OUR OWN object. The client must read back and report the claim WON
    (a 'lost race' here would make the commit loop abandon its own
    committed version); a 412 against someone else's bytes stays a
    genuine loss."""
    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    import urllib.request

    server, base = serve_store_http()
    real_build = urllib.request.build_opener
    try:
        st = HttpStore(base)
        st._BACKOFF_S = 0.001
        # simulate the applied-but-unacknowledged first attempt
        st.put("slot", b"mine")
        # WITHOUT a retry, a 412 is an unambiguous loss — even against
        # our own bytes — and costs no payload read-back
        assert st.put_if_absent("slot", b"mine") is False

        fails = {"n": 0}

        class Flaky:
            def __init__(self, real):
                self.real = real

            def open(self, req, timeout=None):
                if fails["n"] > 0:
                    fails["n"] -= 1
                    raise ConnectionResetError("injected")
                return self.real.open(req, timeout=timeout)

        urllib.request.build_opener = lambda *h: Flaky(real_build(*h))
        fails["n"] = 1  # the retry that creates the ambiguity window
        assert st.put_if_absent("slot", b"mine") is True
        fails["n"] = 1
        assert st.put_if_absent("slot", b"other") is False
    finally:
        urllib.request.build_opener = real_build
        server.shutdown()


def test_http_multipart_writer_streams_large_objects():
    """open_write on the network store is a true multipart upload:
    memory bounded at one part, object invisible until close(),
    byte-identical readback, abort/exception discards everything, and
    small objects take the single-PUT fast path."""
    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    server, base = serve_store_http()
    try:
        st = HttpStore(base)
        st._MPU_PART_BYTES = 1024  # tiny parts so the test is real MPU
        blob = bytes(range(256)) * 17  # 4352 B -> 4 full parts + tail
        w = st.open_write("big.bin")
        w.write(blob[:3000])
        with pytest.raises(FileNotFoundError):
            st.read_bytes("big.bin")  # nothing visible mid-upload
        w.write(blob[3000:])
        assert w.tell() == len(blob)
        w.close()
        assert st.read_bytes("big.bin") == blob
        # ranged read over the composed object
        assert st.read_range("big.bin", 1024, 10) == blob[1024:1034]
        # abort discards every staged part
        w2 = st.open_write("gone.bin")
        w2.write(b"x" * 5000)
        w2.abort()
        with pytest.raises(FileNotFoundError):
            st.read_bytes("gone.bin")
        # with-exit under an exception aborts too
        with pytest.raises(RuntimeError):
            with st.open_write("also-gone.bin") as w3:
                w3.write(b"y" * 5000)
                raise RuntimeError("writer died")
        with pytest.raises(FileNotFoundError):
            st.read_bytes("also-gone.bin")
        # small object: no upload initiated, single PUT on close
        with st.open_write("small.bin") as w4:
            w4.write(b"tiny")
        assert w4._upload_id is None
        assert st.read_bytes("small.bin") == b"tiny"
        # retried complete whose first attempt was applied: idempotent
        w5 = st.open_write("idem.bin")
        w5.write(b"z" * 3000)
        w5._flush_part(w5._buf)
        st.mpu_complete("idem.bin", w5._upload_id)  # "response lost"
        st.mpu_complete("idem.bin", w5._upload_id)  # retry -> 404 -> ok
        assert st.read_bytes("idem.bin") == b"z" * 3000
    finally:
        server.shutdown()


def test_http_multipart_failed_close_aborts_upload():
    """A close() whose publish fails must ABORT the upload (staged MPU
    parts are invisible to vacuum and would accrue forever on a real
    object store) and re-raise the publish failure; nothing becomes
    visible under the name."""
    from data_finder_comparator_spark.sinks.storage import (
        HttpStore,
        serve_store_http,
    )

    server, base = serve_store_http()
    try:
        st = HttpStore(base)
        st._MPU_PART_BYTES = 512
        w = st.open_write("fail.bin")
        w.write(b"q" * 2000)  # several parts staged server-side
        aborted = []
        orig_abort = st.mpu_abort
        st.mpu_abort = lambda rel, uid: (
            aborted.append((rel, uid)),
            orig_abort(rel, uid),
        )[1]

        def boom(rel, uid):
            raise OSError("injected complete failure")

        st.mpu_complete = boom
        with pytest.raises(OSError, match="injected"):
            w.close()
        assert aborted and w.closed
        with pytest.raises(FileNotFoundError):
            st.read_bytes("fail.bin")
    finally:
        server.shutdown()
