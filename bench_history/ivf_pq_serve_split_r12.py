"""Round-12 IVF-PQ build/serve split measurement (r11 verdict item 3).

The registered ivf_pq_topk query runs its index BUILD (coarse
assignment + all-candidate PQ encode) inside every execution — correct
for the pristine-directory oracle harness, but the wrong cost shape to
copy as a serving path. This script measures, at sf0.1 on one warm
Spark session (min-of-3 per leg, sequential, the SCALE.md §6 timing
protocol):

  full   = ivf_pq_topk(probes, cands)            # build-in-query
  build  = build_ivf_pq_index(...)               # the one-off cost
  serve  = ivf_pq_search(index, probes, cands)   # the per-query cost

Writes ivf_pq_serve_split_r12.json. Run:
  python bench_history/ivf_pq_serve_split_r12.py [sf_dir]
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


def timed(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_search,
        ivf_pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"),
        F.col("embedding").alias("vec_p"),
    )
    cands = emb.select(
        F.col("vec_id").cast("long").alias("cand_id"),
        F.col("embedding").alias("vec_c"),
    )
    n_cands = cands.count()  # warm the scan

    full = timed(lambda: ivf_pq_topk(probes, cands, k=5).count())

    roots = []

    def build_once():
        root = tempfile.mkdtemp(prefix="ivfpq_idx_")
        roots.append(root)
        build_ivf_pq_index(spark, os.path.join(root, "idx"), cands)

    build = timed(build_once)
    index_root = os.path.join(roots[-1], "idx")
    from data_finder_comparator_spark.operators.similarity import IvfPqIndex

    index = IvfPqIndex(spark, index_root)
    serve = timed(lambda: ivf_pq_search(index, probes, cands, k=5).count())
    # sanity: identical answers
    a = sorted(map(tuple, ivf_pq_search(index, probes, cands, k=5).collect()))
    b = sorted(map(tuple, ivf_pq_topk(probes, cands, k=5).collect()))
    assert a == b, "prebuilt serve diverged from build-in-query"
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)
    out = {
        "sf_dir": sf_dir,
        "n_cands": n_cands,
        "full_build_in_query_s": full,
        "index_build_once_s": build,
        "serve_only_s": serve,
        "serve_vs_full": round(serve / full, 3),
        "answers_identical": True,
    }
    path = os.path.join(os.path.dirname(__file__), "ivf_pq_serve_split_r12.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
