"""Round-15 maintenance-plane scale rung (r14 verdict item 4): price
``optimize()`` and ``vacuum()`` the way the stream-source rungs priced
catch-up — as growth CURVES over the quantity each claims to be bounded
by, with a control axis that must stay flat.

Claims under test (the operators' own 100-TB docstrings):

  optimize() cost is bounded by the SMALL-FILE set (read + rewrite),
  never by table size — large files carry by reference.
    * axis A (must grow ~linearly): small-file count 8 / 32 / 128 at a
      fixed carried-data size;
    * axis B (must stay ~flat): carried big-file rows 100k / 400k /
      1.6M at a fixed 16 small files.

  vacuum() cost is bounded by the DEAD-OBJECT count (list + delete),
  never by table size — referenced files are set-membership checks.
    * axis C (must grow ~linearly): orphan count 32 / 128 / 512 over a
      fixed table;
    * axis D (must stay ~flat): table rows 100k / 400k / 1.6M at a
      fixed 64 orphans.

Each measurement is min-of-3 with the mutated state rebuilt between
repeats (optimize compacts the smalls -> re-append a fresh batch;
vacuum deletes the orphans -> re-plant them). Absolute numbers carry
the usual fixed Spark job overhead (~0.2-0.4 s per optimize commit);
the CURVE is the claim. Writes maintenance_rung_r15.json. Run:
  python bench_history/maintenance_rung_r15.py
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
from pyspark.sql import functions as F  # noqa: E402

SMALL_BYTES = 256 << 10  # files under 256 KB are "small"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.sinks.lakehouse import (
        _DATA,
        TransactionalTable,
    )

    def big_frame(rows: int):
        return spark.range(rows).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )

    def small_frame(seed: int):
        # ~60 rows -> a few-KB parquet file, one partition -> one file
        return (
            spark.range(60)
            .select(
                (F.col("id") + seed * 1_000_000).alias("k"),
                F.md5((F.col("id") + seed).cast("string")).alias("v"),
            )
            .coalesce(1)
        )

    def fresh_table(big_rows: int) -> TransactionalTable:
        d = tempfile.mkdtemp(prefix="maint-rung-")
        t = TransactionalTable(spark, os.path.join(d, "tbl"))
        # bulk bootstrap: ONE big carried file (coalesce(1))
        t.append(big_frame(big_rows).coalesce(1))
        return t

    def optimize_ms(t: TransactionalTable, n_small: int, rounds: int = 3):
        best = None
        for r in range(rounds):
            for i in range(n_small):
                t.append(small_frame(r * 10_000 + i))
            t0 = time.perf_counter()
            v = t.optimize(small_bytes=SMALL_BYTES)
            dt = (time.perf_counter() - t0) * 1000
            assert v is not None, "optimize must have compacted"
            best = dt if best is None else min(best, dt)
        return round(best, 1)

    def vacuum_ms(t: TransactionalTable, n_orphans: int, rounds: int = 3):
        best = None
        payload = b"x" * 4096
        for r in range(rounds):
            for i in range(n_orphans):
                t.store.put(
                    f"{_DATA}/orphan-{r}-{i}.parquet", payload
                )
            t0 = time.perf_counter()
            removed = t.vacuum(retention_seconds=0)
            dt = (time.perf_counter() - t0) * 1000
            assert len(removed) >= n_orphans
            best = dt if best is None else min(best, dt)
        return round(best, 1)

    out: dict = {"small_bytes": SMALL_BYTES}

    # axis A: optimize vs small-file count (fixed 100k carried rows)
    axis_a = {}
    for n_small in (8, 32, 128):
        t = fresh_table(100_000)
        axis_a[str(n_small)] = optimize_ms(t, n_small)
        shutil.rmtree(os.path.dirname(t.path.replace("file:", "")), True)
    out["optimize_ms_by_small_count@100k"] = axis_a

    # axis B: optimize vs carried table size (fixed 16 small files)
    axis_b = {}
    for rows in (100_000, 400_000, 1_600_000):
        t = fresh_table(rows)
        axis_b[str(rows)] = optimize_ms(t, 16)
        shutil.rmtree(os.path.dirname(t.path.replace("file:", "")), True)
    out["optimize_ms_by_table_rows@16smalls"] = axis_b

    # axis C: vacuum vs orphan count (fixed 100k-row table)
    axis_c = {}
    for n_orph in (32, 128, 512):
        t = fresh_table(100_000)
        axis_c[str(n_orph)] = vacuum_ms(t, n_orph)
        shutil.rmtree(os.path.dirname(t.path.replace("file:", "")), True)
    out["vacuum_ms_by_orphans@100k"] = axis_c

    # axis D: vacuum vs table size (fixed 64 orphans)
    axis_d = {}
    for rows in (100_000, 400_000, 1_600_000):
        t = fresh_table(rows)
        axis_d[str(rows)] = vacuum_ms(t, 64)
        shutil.rmtree(os.path.dirname(t.path.replace("file:", "")), True)
    out["vacuum_ms_by_table_rows@64orphans"] = axis_d

    path = os.path.join(os.path.dirname(__file__), "maintenance_rung_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
