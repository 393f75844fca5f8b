"""Round-14 audit-cadence rung: what does the prescribed per-epoch
recall audit actually COST?

The r13 freshness rung prescribed (and r14's `index_health_audit`
implements) re-auditing served recall after every append epoch and
rebuilding only on a >2-point drop with a gated swap. That prescription
is only operational if the audit is cheap relative to the append it
follows — the audit runs one served search plus one exact brute top-k
over the PROBE SAMPLE (the brute side is |probes| x |corpus| cheap dot
products, bounded by the sample, never corpus x corpus).

This rung grows the corpus by 250-row appends from a 1000-row bootstrap
(same shapes as ivf_pq_append_rung_r13) and records, per epoch:

  append_s   ivf_pq_index_append wall (the work the audit rides on)
  audit_s    index_health_audit wall at the default k/nprobe
  recall     the audit's measured served recall (sanity: flat in-dist)

Claim under test: audit_s is the same order as append_s and flat-ish in
corpus growth at a fixed probe sample — so the per-epoch cadence is an
operational default, not a luxury. Writes audit_cadence_r14.json. Run:
  python bench_history/audit_cadence_r14.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BOOTSTRAP = 1000
BATCH = 250


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.operators.similarity import (
        build_ivf_pq_index,
        index_health_audit,
        ivf_pq_index_append,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cands = emb.select(
        F.col("vec_id").cast("long").alias("cand_id"),
        F.col("embedding").alias("vec_c"),
    )
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"),
        F.col("embedding").alias("vec_p"),
    ).cache()
    probes.count()

    corpus = cands.filter(F.col("cand_id") < BOOTSTRAP).cache()
    corpus.count()
    root = os.path.join(tempfile.mkdtemp(prefix="audit_cadence_"), "idx")
    index = build_ivf_pq_index(spark, root, corpus, pin_probes=probes)
    pin = index.params()["pin_recall"]
    rungs = []
    lo = BOOTSTRAP
    for _ in range(3):
        batch = cands.filter(
            (F.col("cand_id") >= lo) & (F.col("cand_id") < lo + BATCH)
        )
        t0 = time.perf_counter()
        ivf_pq_index_append(index, batch)
        append_s = round(time.perf_counter() - t0, 3)
        corpus = corpus.unionByName(batch).cache()
        n = corpus.count()
        t0 = time.perf_counter()
        audit = index_health_audit(index, probes, corpus)
        audit_s = round(time.perf_counter() - t0, 3)
        rungs.append(
            {
                "corpus": n,
                "append_s": append_s,
                "audit_s": audit_s,
                "recall": audit["recall"],
                "drop": audit["drop"],
                "rebuild_recommended": audit["rebuild_recommended"],
            }
        )
        print(json.dumps(rungs[-1]), flush=True)
        lo += BATCH
    payload = {"pin_recall": pin, "rungs": rungs}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "audit_cadence_r14.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
