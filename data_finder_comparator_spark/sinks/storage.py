"""Storage adapters for the transactional table's control AND (r12)
data plane.

``TransactionalTable``'s commit protocol needs exactly four primitives
from its store: atomic put-if-absent (the version-slot claim),
read-bytes, recursive list, and delete — plus an overwrite-put and a
mutual-exclusion lock for the consumer cursors, and an mtime for
retention decisions. On a POSIX filesystem those map to
``os.link``/``open``/``os.walk``/``os.remove``; on an object store the
slot claim becomes an ``If-None-Match: *`` conditional PUT (how Delta
commits on S3) and list/delete map to the native API. This module is
that seam: ``LocalStore`` is the default (and keeps the exact fsync
discipline the crash-atomicity tests pin), ``MemoryStore`` is the
in-process fake that proves the PROTOCOL holds on a backend with no
rename, no directories and no hard links — the object-store shape.

DATA plane (r12): parquet files route through the store too, under a
capability split —

* ``supports_spark_io = True`` (``LocalStore``; a real S3/GCS store
  would be the same): Spark's own engine reads and writes the data
  paths directly — executors talk to storage in parallel through the
  JVM's filesystem/connector layer, the only shape that survives
  100 TB. Footer-stat reads, Bloom builds and staged-file IO use
  ``open_read``/``open_write``/``size``, which workers reach by
  reconstructing the store from its picklable ``spec()``.
* ``supports_spark_io = False`` (``MemoryStore``): the table switches
  to a RELAY route — parquet ENCODE/DECODE stays distributed-shaped
  (``mapInArrow`` in executors / driver-side pyarrow projection), but
  the bytes pass through the driver's ``put``/``read_bytes``, because
  an in-process dict is unreachable from worker processes. This route
  exists to PROVE the commit protocol and file format need no
  filesystem at all (zero os-path IO end to end — the e2e lifecycle
  test pins it); it is test-scale by design and says so loudly in
  the table code.

Porting to a real object store is therefore: implement this protocol
with a network client, ``supports_spark_io = True``, and give
``spec()`` a scheme (workers rebuild clients from specs) — no engine
surgery.

Rel-path convention: every method takes paths RELATIVE to the store
root, always '/'-separated (never ``os.sep``).
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from contextlib import contextmanager


class LocalStore:
    """POSIX-directory store rooted at the table path.

    ``put_if_absent`` keeps the crash-atomic discipline the commit log
    depends on: payload fully written + fsynced to a temp file, then
    ``os.link``ed into the slot (exclusive-create whose content is
    already complete — ``EEXIST`` is the conflict signal), then the
    directory entry fsynced. A crash or ENOSPC mid-write can never
    leave a truncated object in a claimed slot."""

    supports_spark_io = True  # Spark engine IO may touch data paths

    def __init__(self, root: str):
        self.root = root

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, *rel.split("/"))

    def spec(self) -> dict:
        """Picklable recipe a WORKER process can rebuild this store
        from (``store_from_spec``) — how data-source tasks reach
        storage without shipping live handles."""
        return {"kind": "local", "root": self.root}

    def open_read(self, rel: str):
        """Binary file-like positioned at 0 (pyarrow-compatible)."""
        return open(self._abs(rel), "rb")

    def open_write(self, rel: str):
        """Binary file-like for a NEW object (staged data files: names
        are unique per attempt, so plain create — the crash-atomic
        put_if_absent discipline is for commit slots, not data)."""
        target = self._abs(rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        return open(target, "wb")

    def size(self, rel: str) -> int:
        return os.path.getsize(self._abs(rel))

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        target = self._abs(rel)
        d = os.path.dirname(target)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, target)
            except FileExistsError:
                return False
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            return True
        finally:
            os.unlink(tmp)

    def put(self, rel: str, data: bytes) -> None:
        """Overwrite-put (consumer cursors): fsync'd temp + atomic
        replace — readers see the old or the new bytes, never a mix."""
        target = self._abs(rel)
        d = os.path.dirname(target)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, target)

    def read_bytes(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as f:
            return f.read()

    def list(self, prefix: str) -> list[str]:
        """All object names under ``prefix``, '/'-relative to it,
        sorted. Directories are a local artifact and are not listed
        (object stores have none)."""
        base = self._abs(prefix)
        if not os.path.isdir(base):
            return []
        out = []
        for dp, _dns, fns in os.walk(base):
            for name in fns:
                out.append(
                    os.path.relpath(os.path.join(dp, name), base).replace(
                        os.sep, "/"
                    )
                )
        return sorted(out)

    def delete(self, rel: str) -> None:
        """Missing-ok delete (object-store semantics)."""
        try:
            os.remove(self._abs(rel))
        except FileNotFoundError:
            pass

    def mtime(self, rel: str) -> float:
        return os.path.getmtime(self._abs(rel))

    @contextmanager
    def lock(self, name: str):
        """Exclusive advisory lock scoped to ``name`` (flock on a
        sibling lock file — fine on the local filesystems this store
        is for; an object-store port would build this on a lease
        object or accept single-writer-per-name as the contract)."""
        import fcntl

        p = self._abs(name + ".lock")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def prune_empty_dirs(self, prefix: str, cutoff: float | None) -> None:
        """Local-only hygiene after a vacuum pass: bottom-up removal of
        emptied directories under ``prefix`` (partition leaves, txn
        dirs). ``cutoff`` guards in-flight writers' just-created
        staging dirs exactly like the file retention does; ``None``
        means writers are quiesced (zero-retention vacuum). Object
        stores have no directories — ``MemoryStore`` no-ops."""
        base = self._abs(prefix)
        if not os.path.isdir(base):
            return
        for dp, _dns, _fns in os.walk(base, topdown=False):
            if os.path.abspath(dp) == os.path.abspath(base):
                continue
            try:
                if (
                    cutoff is None or os.path.getmtime(dp) <= cutoff
                ) and not os.listdir(dp):
                    os.rmdir(dp)
            except OSError:
                pass  # raced another vacuum


class MemoryStore:
    """In-process dict-backed store — the object-store-shaped fake:
    no rename, no hard links, no directories, atomicity only through
    conditional puts. Exists so tests can prove the commit/cursor/
    vacuum PROTOCOL holds on those semantics alone (put_if_absent is
    a single atomic check-and-set under one lock, the direct analogue
    of an If-None-Match PUT)."""

    supports_spark_io = False  # data plane must use the relay route

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._mu = threading.RLock()
        self._locks: dict[str, threading.Lock] = {}

    def spec(self) -> dict | None:
        """An in-process dict has no address a worker process could
        dial — None means 'not shippable'; callers that need worker
        access must refuse loudly (the data-source planner does)."""
        return None

    def open_read(self, rel: str):
        import io

        return io.BytesIO(self.read_bytes(rel))

    def open_write(self, rel: str):
        """Buffered writer whose SUCCESSFUL close() publishes the
        object — the PUT-on-complete semantics of a real object store.
        A writer that aborts (``abort()``, or ``with``-exit under an
        exception) publishes NOTHING: before the r12 ADVICE fix,
        close() published unconditionally, so a ParquetWriter that
        raised mid-stream left a partial object visible under its
        final name — benign only because failed attempts' names are
        never referenced by a commit, which this keeps from becoming
        load-bearing."""
        import io

        store = self

        class _Buf(io.BytesIO):
            _aborted = False

            def abort(buf) -> None:  # noqa: N805 - inner self
                """Discard the buffer without publishing (the
                multipart-upload-abort analogue)."""
                buf._aborted = True
                io.BytesIO.close(buf)

            def __exit__(buf, exc_type, exc, tb):  # noqa: N805
                if exc_type is not None:
                    buf.abort()
                    return False
                return io.BytesIO.__exit__(buf, exc_type, exc, tb)

            def close(buf) -> None:  # noqa: N805 - inner self
                if not buf._aborted and not buf.closed:
                    store.put(rel, buf.getvalue())
                io.BytesIO.close(buf)

        return _Buf()

    def size(self, rel: str) -> int:
        with self._mu:
            try:
                return len(self._objects[rel])
            except KeyError:
                raise FileNotFoundError(rel) from None

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        with self._mu:
            if rel in self._objects:
                return False
            self._objects[rel] = bytes(data)
            self._mtimes[rel] = time.time()
            return True

    def put(self, rel: str, data: bytes) -> None:
        with self._mu:
            self._objects[rel] = bytes(data)
            self._mtimes[rel] = time.time()

    def read_bytes(self, rel: str) -> bytes:
        with self._mu:
            try:
                return self._objects[rel]
            except KeyError:
                raise FileNotFoundError(rel) from None

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        with self._mu:
            return sorted(
                k[len(p):] for k in self._objects if k.startswith(p)
            )

    def delete(self, rel: str) -> None:
        with self._mu:
            self._objects.pop(rel, None)
            self._mtimes.pop(rel, None)

    def mtime(self, rel: str) -> float:
        with self._mu:
            try:
                return self._mtimes[rel]
            except KeyError:
                raise FileNotFoundError(rel) from None

    @contextmanager
    def lock(self, name: str):
        with self._mu:
            lk = self._locks.setdefault(name, threading.Lock())
        with lk:
            yield

    def prune_empty_dirs(self, prefix: str, cutoff: float | None) -> None:
        pass  # no directories to prune


def store_from_spec(spec: dict):
    """Rebuild a store in a WORKER process from ``Store.spec()`` —
    the data-source read/write tasks' route to storage. New backends
    register a kind here plus a client class above; nothing else in
    the engine changes."""
    if spec["kind"] == "local":
        return LocalStore(spec["root"])
    raise ValueError(f"unknown store spec kind {spec['kind']!r}")
