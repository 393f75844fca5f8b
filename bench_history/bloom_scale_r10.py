"""Round-10 scale evidence: lakehouse point-merge cost vs table file
count, Bloom sidecar index ON vs OFF.

Setup defeats min/max skipping on purpose: keys are md5 hex strings,
so every data file's footer [min, max] spans ~the whole key space and
range skipping prunes nothing — the regime where only the Bloom layer
can save the exact input_file_name scan. One table per rung is built
WITH sidecars; the OFF handle is the same on-disk table opened without
bloom_col (the index is advisory metadata, so this is a pure
reader-side A/B on identical bytes).

Per rung: merge a fresh ABSENT key (the pure point-upsert case),
min-of-3 wall seconds per mode, plus the candidate-file count each
mode's hit scan must open. Expect: candidates_nobloom == n_files
(range prunes nothing), candidates_bloom ~= 0, and the bloom-mode
merge time ~flat across rungs while no-bloom grows with file count.

Usage: python bench_history/bloom_scale_r10.py
Writes bench_history/bloom_scale_r10.json.
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

ROWS_PER_FILE = 2000
RUNGS = [8, 32, 128, 512]
TRIALS = 3


def build_table(spark, path: str, n_files: int) -> None:
    t = TransactionalTable(spark, path, bloom_col="k")
    base = spark.range(ROWS_PER_FILE)
    for i in range(n_files):
        df = base.select(
            F.md5(F.concat(F.lit(f"f{i}:"), F.col("id").cast("string"))).alias("k"),
            F.lit(i).alias("src"),
        ).coalesce(1)
        t.append(df)


def candidate_count(t: TransactionalTable, probe_key: str) -> int:
    """Files the hit scan would OPEN for this key under t's config
    (range skip, then Bloom when the handle has one)."""
    _, man = t.snapshot()
    stats = man.get("stats") or {}
    cands = [
        rel
        for rel in man["files"]
        if t._may_contain(stats.get(rel), "k", probe_key, probe_key)
    ]
    if t.bloom_col == "k":
        # r11: _bloom_excludes grew a required probed-column argument
        # (descriptor col identity, ADVICE finding 1) — call updated so
        # this archived evidence script stays re-runnable
        cands = [
            rel
            for rel in cands
            if not t._bloom_excludes(stats.get(rel), [probe_key], "k")
        ]
    return len(cands)


def absent_key(tag: str) -> str:
    """An md5-hex key NOT in any file but INSIDE every file's
    [min, max] hex range — absent keys that range skipping cannot
    prune, which is the whole point of the experiment (table keys are
    md5("f<i>:<id>"), so this spelling can never collide)."""
    import hashlib

    return hashlib.md5(f"absent:{tag}".encode()).hexdigest()


def time_merge(spark, t: TransactionalTable, tag: str) -> float:
    best = float("inf")
    for trial in range(TRIALS):
        key = absent_key(f"{tag}-{trial}")  # fresh absent key each time
        df = spark.createDataFrame([(key, -1)], "k string, src int").coalesce(1)
        t0 = time.time()
        t.merge(df, "k")
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
    out = {"rows_per_file": ROWS_PER_FILE, "trials": TRIALS, "rungs": []}
    work = tempfile.mkdtemp(prefix="bloom-scale-")
    try:
        for n in RUNGS:
            path = os.path.join(work, f"tbl-{n}")
            t_build = time.time()
            build_table(spark, path, n)
            build_s = round(time.time() - t_build, 1)
            with_bloom = TransactionalTable(spark, path, bloom_col="k")
            no_bloom = TransactionalTable(spark, path)  # same bytes, no probing
            probe = absent_key("candidate-probe")
            rung = {
                "n_files": n,
                "build_s": build_s,
                "candidates_nobloom": candidate_count(no_bloom, probe),
                "candidates_bloom": candidate_count(with_bloom, probe),
                # a 1-key probe false-positives each file independently
                # at ~fpp, so surviving candidates should sit near this
                # (read the fpp actually in force, not a copy of the
                # class default — they drift silently otherwise)
                "expected_fp": round(n * with_bloom.bloom_fpp, 2),
                # interleaved so host drift hits both modes equally
                "merge_s_nobloom": time_merge(spark, no_bloom, "nb"),
                "merge_s_bloom": time_merge(spark, with_bloom, "wb"),
            }
            out["rungs"].append(rung)
            print(json.dumps(rung))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bloom_scale_r10.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
