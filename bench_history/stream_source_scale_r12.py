"""Round-12 streaming-DataSource planning rung (r11 verdict item 6).

readStream.format('lakehouse') offsets ARE committed versions; each
trigger's planning walks the manifests in (start, end]. This rung
builds tables of N single-file commits and measures, per N:

  latest_ms   latestOffset() — one store list (the offset probe every
              trigger pays, even idle ones)
  steady_ms   partitions(N-1 -> N) — the steady-state trigger: one new
              commit consumed; cost = reading TWO manifests, each
              listing ~N files (manifest size, not history length)
  catchup_ms  partitions(0 -> N) — a fresh stream's first batch over
              the whole history: reads every manifest once (the r11
              carry-forward fix; the naive parent lookup was 2x)

The claim under test: steady-state per-trigger planning stays
milliseconds and is bounded by MANIFEST SIZE (current file count),
never by how long the table has lived; catch-up is the documented
one-off O(history) walk that startingVersion / expire_snapshots cut.

Writes stream_source_scale_r12.json. Run:
  python bench_history/stream_source_scale_r12.py
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
    from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable
    from data_finder_comparator_spark.sources.lakehouse_source import (
        _ChangeStreamReader,
        _logical_schema,
    )

    rungs = []
    built = 0
    root = tempfile.mkdtemp(prefix="stream_rung_")
    p = os.path.join(root, "tbl")
    t = TransactionalTable(spark, p)
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
        rungs.append(
            {
                "commits": n,
                "build_s": build_s,
                "latest_ms": latest,
                "steady_trigger_ms": steady,
                "catchup_ms": catchup,
                "catchup_partitions": n_parts,
            }
        )
        print(json.dumps(rungs[-1]), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    out = {"rungs": rungs}
    path = os.path.join(
        os.path.dirname(__file__), "stream_source_scale_r12.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
