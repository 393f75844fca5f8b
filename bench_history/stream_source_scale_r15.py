"""Round-15 re-run of the r14 streaming-DataSource planning rung: same measurements, on the r15 code (self-describing version_ts_capped flag + cap-soundness fallback in _checkpoint_ts_candidates) - the claim under test is that neither soundness fix regressed the flat catch-up/latestOffset curves.

Re-runs the r12 rung against the manifest-checkpointed commit log.
Same table shapes (N single-file appends at N = 32/128/512), same
probes, plus checkpoint-disabled controls so the delta is attributable:

  latest_ms      latestOffset() with the checkpoint pointer — a pointer
                 read + O(commits since last checkpoint) HEAD probes,
                 not a full commit-log listing
  latest_nock_ms latestOffset() with the pointer plane disabled (the
                 r12 behavior: one full list per trigger)
  steady_ms      partitions(N-1 -> N) — unchanged shape: the walk reads
                 manifests in (start, end] only
  catchup_ms     partitions(0 -> N) — a fresh stream's first batch,
                 served from ONE checkpoint object + the walk of the
                 tail since (bounded by the interval, 32)
  catchup_nock_ms the same catch-up forced down the r12 full-walk path

The claim under test (r12 verdict "Done =" clause): catch-up and
latestOffset are flat-ish in history length with checkpoints on, while
the controls reproduce the r12 linear growth.

Writes stream_source_scale_r15.json. Run:
  python bench_history/stream_source_scale_r15.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def timed_ms(fn, n=5):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) * 1000
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.sinks.lakehouse import (
        TransactionalTable,
    )
    from data_finder_comparator_spark.sources.lakehouse_source import (
        _ChangeStreamReader,
        _logical_schema,
    )

    def no_checkpoints():
        """Disable the checkpoint plane: readers see no pointer and no
        checkpoint objects — the r12 code path, as a same-process
        control."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            orig_lc = TransactionalTable.latest_checkpoint
            orig_pv = TransactionalTable._pointer_version
            TransactionalTable.latest_checkpoint = (
                lambda self, max_version=None: None
            )
            TransactionalTable._pointer_version = lambda self: None
            try:
                yield
            finally:
                TransactionalTable.latest_checkpoint = orig_lc
                TransactionalTable._pointer_version = orig_pv

        return ctx()

    rungs = []
    built = 0
    root = tempfile.mkdtemp(prefix="stream_rung_")
    p = os.path.join(root, "tbl")
    t = TransactionalTable(spark, p)  # default checkpoint_interval=32
    one = spark.createDataFrame([(1, "x")], "id long, v string").repartition(1)
    for n in (32, 128, 512):
        t0 = time.perf_counter()
        for _ in range(n - built):
            t.append(one)
        built = n
        build_s = round(time.perf_counter() - t0, 1)
        schema_json = _logical_schema(p).json()
        rdr = _ChangeStreamReader(p, 0, False, schema_json)
        latest = timed_ms(lambda: rdr.latestOffset())
        steady = timed_ms(
            lambda: rdr.partitions({"version": built - 1}, {"version": built})
        )
        catchup = timed_ms(
            lambda: rdr.partitions({"version": 0}, {"version": built}), n=3
        )
        n_parts = len(rdr.partitions({"version": 0}, {"version": built}))
        with no_checkpoints():
            latest_nock = timed_ms(lambda: rdr.latestOffset())
            catchup_nock = timed_ms(
                lambda: rdr.partitions({"version": 0}, {"version": built}),
                n=3,
            )
            n_parts_nock = len(
                rdr.partitions({"version": 0}, {"version": built})
            )
        assert n_parts == n_parts_nock == n, (n_parts, n_parts_nock, n)
        rungs.append(
            {
                "commits": n,
                "build_s": build_s,
                "latest_ms": latest,
                "latest_nock_ms": latest_nock,
                "steady_trigger_ms": steady,
                "catchup_ms": catchup,
                "catchup_nock_ms": catchup_nock,
                "catchup_partitions": n_parts,
            }
        )
        print(json.dumps(rungs[-1]), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    out = {"checkpoint_interval": 32, "rungs": rungs}
    path = os.path.join(
        os.path.dirname(__file__), "stream_source_scale_r15.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
