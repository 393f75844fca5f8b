"""Round-10 scale evidence: partitioned vs flat transactional table
under a partition-local point workload.

Setup defeats everything EXCEPT partitioning on purpose: ids are md5
hex strings (no id range signal) and every commit carries rows for
every day, so a flat table's files all span the whole (day, id) space
— range skipping prunes nothing and every hit scan opens every byte.
The partitioned table holds the SAME rows under day=<d> directories;
the injected min==max day stats turn the same conjunctive range skip
into exact partition pruning.

Per rung (P days, same total rows): a composite-key merge_into whose
source sits in ONE day, min-of-3 wall seconds per mode, plus the BYTES
the hit scan must open (candidate files x footer size — file counts
alone mislead here: both modes open ~C candidate files, but the
partitioned ones are P-times smaller). Expect bytes_partitioned ~=
bytes_flat / P and the partitioned merge time to stay ~flat as P grows
while the flat merge pays the full scan regardless.

Usage: python bench_history/partition_scale_r10.py
Writes bench_history/partition_scale_r10.json.
"""

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

ROWS_PER_COMMIT = 64_000
COMMITS = 8
RUNGS = [4, 16, 64]  # partition count P; total rows identical per rung
TRIALS = 3


def build(spark, path: str, days: int, partitioned: bool) -> TransactionalTable:
    t = TransactionalTable(
        spark, path, partition_by=["day"] if partitioned else None
    )
    base = spark.range(ROWS_PER_COMMIT)
    for c in range(COMMITS):
        df = base.select(
            (F.col("id") % days).cast("int").alias("day"),
            F.md5(F.concat(F.lit(f"c{c}:"), F.col("id").cast("string"))).alias(
                "k"
            ),
            F.lit(c).alias("src"),
        )
        t.append(df.coalesce(1) if not partitioned else df)
    return t


def scan_bytes(t: TransactionalTable, day: int, kmin: str, kmax: str) -> int:
    """Bytes of the files the composite hit scan must open for a
    source confined to ``day`` — the range-skip candidate set costed
    by footer size."""
    _, man = t.snapshot()
    stats = man.get("stats") or {}
    total = 0
    for rel in man["files"]:
        s = stats.get(rel)
        if t._may_contain(s, "day", day, day) and t._may_contain(
            s, "k", kmin, kmax
        ):
            total += (s or {}).get("bytes", 0)
    return total


def absent_key(tag: str) -> str:
    import hashlib

    return hashlib.md5(f"absent:{tag}".encode()).hexdigest()


def time_merge(spark, t: TransactionalTable, day: int, tag: str) -> float:
    best = float("inf")
    for trial in range(TRIALS):
        key = absent_key(f"{tag}-{trial}")
        df = spark.createDataFrame(
            [(day, key, -1)], "day int, k string, src int"
        ).coalesce(1)
        t0 = time.time()
        t.merge_into(
            df,
            on=["day", "k"],
            when_matched_update="all",
            when_not_matched_insert=True,
        )
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "rows_per_commit": ROWS_PER_COMMIT,
        "commits": COMMITS,
        "trials": TRIALS,
        "rungs": [],
    }
    work = tempfile.mkdtemp(prefix="part-scale-")
    kmin, kmax = "0" * 32, "f" * 32  # md5 probe range: prunes nothing
    try:
        for days in RUNGS:
            target_day = days - 1
            flat = build(spark, os.path.join(work, f"flat-{days}"), days, False)
            part = build(spark, os.path.join(work, f"part-{days}"), days, True)
            rung = {
                "days": days,
                "files_flat": len(flat.snapshot()[1]["files"]),
                "files_partitioned": len(part.snapshot()[1]["files"]),
                "scan_bytes_flat": scan_bytes(flat, target_day, kmin, kmax),
                "scan_bytes_partitioned": scan_bytes(
                    part, target_day, kmin, kmax
                ),
                # interleaved so host drift hits both modes equally
                "merge_s_flat": time_merge(spark, flat, target_day, "fl"),
                "merge_s_partitioned": time_merge(spark, part, target_day, "pt"),
            }
            out["rungs"].append(rung)
            print(json.dumps(rung))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "partition_scale_r10.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
