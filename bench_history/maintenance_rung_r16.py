"""Round-16 maintenance-rung extension (r15 verdict item 3): price
CLUSTERED compaction — ``optimize(sort_by=...)`` — against the plain
size-only bin-pack, and prove the skipping effectiveness it buys, as
curves over the small-file count.

Claims under test (the r16 driver row's 100-TB docstring):

  the sorted rewrite costs one extra range shuffle over exactly the
  rows being compacted — so its wall tracks the plain optimize's at
  every width (same data in, same files out, + a shuffle);

  what it buys: a key-band operation (here a banded DELETE — the same
  footer-overlap planner merge hit detection and DSv2 pushdown use)
  plans O(band) files on the clustered table vs O(all files) on the
  size-only twin, at the SAME live-file count. The planned-file
  numbers are deterministic; the delete walls are illustrative.

Each twin pair holds n modulus-striped small files over one 100k-key
domain (every stripe spans the full key range — the unclustered-ingest
worst case), compacted to n output files (target_bytes pins the
width), then hit with a DELETE of a 1%% key band.

Reading note: ``files_plain`` caps at the compaction read's partition
count (the plain path COALESCES — it can only shrink the width, which
is correct for bin-packing: fewer files than asked means bigger files,
never lost data), so past n=8 the twins differ in live-file count. The
claim is unaffected: ``band_planned_plain`` equals ALL the plain
twin's files at every width (full-range footers skip nothing), while
``band_planned_clustered`` stays at 1-2 regardless of width. Writes
maintenance_rung_r16.json. Run:
  python bench_history/maintenance_rung_r16.py
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

DOMAIN = 100_000
BAND = (40_000, 41_000)  # 1% of the key domain


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable

    def striped_table(n_files: int) -> TransactionalTable:
        d = tempfile.mkdtemp(prefix="clust-rung-")
        t = TransactionalTable(spark, os.path.join(d, "tbl"))
        base = spark.range(DOMAIN).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
        for i in range(n_files):
            t.append(base.filter(F.col("k") % n_files == i).coalesce(1))
        return t

    def planned(t: TransactionalTable, lo: int, hi: int) -> int:
        _, man = t.snapshot()
        stats = man.get("stats") or {}
        return sum(
            1
            for rel in man["files"]
            if t._range_overlap(stats.get(rel), "k", lo, hi)
        )

    def compact(t: TransactionalTable, n_files: int, sort: bool) -> float:
        total = sum(
            s["bytes"] for s in (t.snapshot()[1].get("stats") or {}).values()
        )
        t0 = time.perf_counter()
        v = t.optimize(
            small_bytes=1 << 30,
            target_bytes=max(1, -(-total // n_files)),
            sort_by="k" if sort else None,
        )
        dt = (time.perf_counter() - t0) * 1000
        assert v is not None
        return round(dt, 1)

    def band_delete_ms(t: TransactionalTable) -> float:
        lo, hi = BAND
        t0 = time.perf_counter()
        t.delete(
            t.read().filter(F.col("k").between(lo, hi)).select("k"), "k"
        )
        return round((time.perf_counter() - t0) * 1000, 1)

    out: dict = {"domain": DOMAIN, "band": list(BAND)}
    for n_files in (8, 32, 128):
        row: dict = {}
        for sort, tag in ((False, "plain"), (True, "clustered")):
            t = striped_table(n_files)
            row[f"optimize_ms_{tag}"] = compact(t, n_files, sort)
            row[f"files_{tag}"] = len(t.snapshot()[1]["files"])
            row[f"band_planned_{tag}"] = planned(t, *BAND)
            row[f"band_delete_ms_{tag}"] = band_delete_ms(t)
            shutil.rmtree(os.path.dirname(t.path.replace("file:", "")), True)
        out[f"n_files={n_files}"] = row
    path = os.path.join(os.path.dirname(__file__), "maintenance_rung_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
