"""Round-11 scale evidence (r10 verdict item 7): manifest-walk cost at
512 vs 2048 data files.

The r10 partition probe stopped at 512 files; the lakehouse module's
own stated bound is that manifest maintenance stays driver-cheap "past
512 files". This probe builds partitioned tables at 512 and 2048 files
(same TOTAL rows — only the file count quadruples) and measures, per
rung:

* ``manifest_bytes`` / ``manifest_parse_ms`` — the commit-log read a
  reader pays before any data IO (min-of-N ``snapshot()``).
* ``walk_ms`` — the driver-side hit-detection walk in isolation:
  conjunctive range skip over every file's stats plus the Bloom-layer
  probe decision, no Spark job (min-of-N over ``_hit_files_on``'s
  candidate filter replicated through the public ``read(prune=)``
  path... measured via ``read(prune=)`` plan construction).
* ``scan_bytes`` — bytes the partition-local point merge must open
  (candidate files x footer size), expected ~constant (1/P shrink
  already shown in partition_scale_r10.json; here P doubles twice at
  fixed total rows so per-file bytes shrink 4x while counts grow 4x).
* ``merge_s`` — end-to-end wall of a partition-local point
  ``merge_into`` (min-of-3), the number that must NOT grow with the
  manifest.

Usage: python bench_history/manifest_scale_r11.py
Writes bench_history/manifest_scale_r11.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable

TOTAL_ROWS_PER_COMMIT = 32_000
TRIALS = 3
# (days P, commits C) -> P*C data files, same P*C-invariant total rows
RUNGS = [(64, 8), (128, 16)]  # 512 and 2048 files


def build(spark, path: str, days: int, commits: int) -> TransactionalTable:
    t = TransactionalTable(spark, path, partition_by=["day"])
    base = spark.range(TOTAL_ROWS_PER_COMMIT)
    for c in range(commits):
        df = base.select(
            (F.col("id") % days).cast("int").alias("day"),
            F.md5(F.concat(F.lit(f"c{c}:"), F.col("id").cast("string"))).alias("k"),
            F.lit(c).alias("src"),
        )
        t.append(df)
    return t


def absent_key(tag: str) -> str:
    return hashlib.md5(f"absent:{tag}".encode()).hexdigest()


def min_ms(fn, n=5) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 2)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"rows_per_commit": TOTAL_ROWS_PER_COMMIT, "trials": TRIALS, "rungs": []}
    work = tempfile.mkdtemp(prefix="manifest-scale-")
    kmin, kmax = "0" * 32, "f" * 32
    try:
        for days, commits in RUNGS:
            t = build(spark, os.path.join(work, f"p{days}c{commits}"), days, commits)
            v, man = t.snapshot()
            n_files = len(man["files"])
            target_day = days - 1
            manifest_bytes = os.path.getsize(
                t._strip_scheme(t._manifest_path(v))
            )
            parse_ms = min_ms(lambda: t.snapshot())
            # driver-side candidate walk in isolation: conjunctive
            # range skip over all files' stats (same code path merge
            # hit detection runs before any Spark job)
            stats = man.get("stats") or {}

            def walk():
                return [
                    rel
                    for rel in man["files"]
                    if t._may_contain(stats.get(rel), "day", target_day, target_day)
                    and t._may_contain(stats.get(rel), "k", kmin, kmax)
                ]

            walk_ms = min_ms(walk)
            cand = walk()
            scan_bytes = sum((stats.get(rel) or {}).get("bytes", 0) for rel in cand)
            best = float("inf")
            for trial in range(TRIALS):
                df = spark.createDataFrame(
                    [(target_day, absent_key(f"{days}-{trial}"), -1)],
                    "day int, k string, src int",
                ).coalesce(1)
                t0 = time.time()
                t.merge_into(
                    df,
                    on=["day", "k"],
                    when_matched_update="all",
                    when_not_matched_insert=True,
                )
                best = min(best, time.time() - t0)
            rung = {
                "days": days,
                "commits": commits,
                "n_files": n_files,
                "manifest_bytes": manifest_bytes,
                "manifest_parse_ms": parse_ms,
                "walk_ms": walk_ms,
                "candidate_files": len(cand),
                "scan_bytes": scan_bytes,
                "merge_s": round(best, 3),
            }
            out["rungs"].append(rung)
            print(json.dumps(rung), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "manifest_scale_r11.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
