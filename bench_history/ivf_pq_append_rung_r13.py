"""Round-13 incremental-index freshness rung (r12 verdict item 5).

`ivf_pq_index_append` encodes only the new batch under the index's
FROZEN quantizers (the FAISS contract) — proven incremental==one-shot
at a single size in r12. This rung measures how that contract ages as
a live corpus grows, at sf0.1 on one warm session:

* bootstrap: build the index on the first half of the embeddings
  corpus (1000 vectors, centroids/codebooks sampled from it);
* rungs: append batches of 250, after each one measuring
    append_s          wall of ivf_pq_index_append (linear in batch,
                      never in corpus — the claim under test)
    serve_s           ivf_pq_search over the grown corpus (drift as
                      inverted lists grow)
    recall_incr       recall@5 of the incremental index vs exact
                      brute-force ground truth on the SAME corpus
    recall_rebuild    recall@5 of a FRESH build over the same corpus
                      (quantizers resampled) — the retrain ceiling
* the final batch is deliberately OUT-OF-DISTRIBUTION (each embedding
  reversed: norms preserved, directions rotated away from every
  bootstrap centroid/codeword) to expose the staleness failure mode
  the in-distribution synthetic corpus cannot show: recall_incr falls
  away from recall_rebuild, and the gap IS the retraining trigger.

The SCALE.md §"ANN index freshness" table names the resulting rebuild
threshold. Writes ivf_pq_append_rung_r13.json. Run:
  python bench_history/ivf_pq_append_rung_r13.py [sf_dir]
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
from pyspark.sql.window import Window  # noqa: E402

BOOTSTRAP = 1000
BATCH = 250
K = 5


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
        IvfPqIndex,
        build_ivf_pq_index,
        dot,
        ivf_pq_index_append,
        ivf_pq_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    all_cands = emb.select(
        F.col("vec_id").cast("long").alias("cand_id"),
        F.col("embedding").alias("vec_c"),
    )
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"),
        F.col("embedding").alias("vec_p"),
    ).cache()
    n_total = all_cands.count()
    assert n_total >= BOOTSTRAP + 3 * BATCH, n_total

    def batch_df(lo: int, hi: int, shifted: bool = False):
        b = all_cands.filter(
            (F.col("cand_id") >= lo) & (F.col("cand_id") < hi)
        )
        if shifted:
            # distribution shift, synthesized from the same corpus:
            # reverse each vector — norm-preserving, so only the
            # DIRECTIONS the frozen quantizers were trained on change
            b = b.withColumn("vec_c", F.reverse("vec_c"))
        return b

    def ground_truth(corpus):
        scored = (
            probes.crossJoin(F.broadcast(corpus))
            .filter(F.col("probe_id") != F.col("cand_id"))
            .withColumn("_np", dot("vec_p", "vec_p"))
            .withColumn("_nc", dot("vec_c", "vec_c"))
            .withColumn(
                "cos_sim",
                F.round(
                    dot("vec_p", "vec_c")
                    / F.sqrt(F.col("_np") * F.col("_nc")),
                    6,
                ),
            )
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cos_sim").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= K)
            .select("probe_id", "cand_id")
        )

    def recall_at_k(ann_df, corpus) -> float:
        gt = ground_truth(corpus)
        hit = ann_df.select("probe_id", "cand_id").join(
            gt, ["probe_id", "cand_id"]
        )
        n_gt = gt.count()
        return round(hit.count() / n_gt, 4) if n_gt else 1.0

    roots = []

    def fresh_root() -> str:
        r = tempfile.mkdtemp(prefix="ivfpq_rung_")
        roots.append(r)
        return os.path.join(r, "idx")

    # bootstrap ---------------------------------------------------------
    corpus = batch_df(0, BOOTSTRAP).cache()
    t0 = time.perf_counter()
    index = build_ivf_pq_index(spark, fresh_root(), corpus)
    build_s = round(time.perf_counter() - t0, 3)
    rungs = []

    def measure(tag: str, lo: int, hi: int, shifted: bool):
        nonlocal corpus
        batch = batch_df(lo, hi, shifted)
        t0 = time.perf_counter()
        ivf_pq_index_append(index, batch)
        append_s = round(time.perf_counter() - t0, 3)
        corpus = corpus.unionByName(batch).cache()
        n = corpus.count()
        t0 = time.perf_counter()
        ann = ivf_pq_search(index, probes, corpus, k=K)
        ann.count()
        serve_s = round(time.perf_counter() - t0, 3)
        r_incr = recall_at_k(ann, corpus)
        rebuilt = build_ivf_pq_index(spark, fresh_root(), corpus)
        r_reb = recall_at_k(
            ivf_pq_search(rebuilt, probes, corpus, k=K), corpus
        )
        rungs.append(
            {
                "rung": tag,
                "corpus": n,
                "append_s": append_s,
                "serve_s": serve_s,
                "recall_incr": r_incr,
                "recall_rebuild": r_reb,
                "recall_gap": round(r_reb - r_incr, 4),
            }
        )
        print(json.dumps(rungs[-1]), flush=True)

    measure("in-dist +250", BOOTSTRAP, BOOTSTRAP + BATCH, False)
    measure("in-dist +500", BOOTSTRAP + BATCH, BOOTSTRAP + 2 * BATCH, False)
    measure("in-dist +750", BOOTSTRAP + 2 * BATCH, BOOTSTRAP + 3 * BATCH, False)
    measure(
        "SHIFTED +1000",
        BOOTSTRAP + 3 * BATCH,
        min(BOOTSTRAP + 4 * BATCH, n_total),
        True,
    )

    # scenario B — majority drift: the same bootstrap quantizers serve
    # a corpus whose APPENDED HALF is out-of-distribution (every vector
    # reversed). This is the aging failure mode at full strength; the
    # incr-vs-rebuild recall gap here calibrates the rebuild threshold.
    index_b = build_ivf_pq_index(spark, fresh_root(), batch_df(0, BOOTSTRAP))
    shifted = batch_df(BOOTSTRAP, n_total, shifted=True)
    ivf_pq_index_append(index_b, shifted)
    corpus_b = batch_df(0, BOOTSTRAP).unionByName(shifted).cache()
    corpus_b.count()
    r_incr_b = recall_at_k(
        ivf_pq_search(index_b, probes, corpus_b, k=K), corpus_b
    )
    rebuilt_b = build_ivf_pq_index(spark, fresh_root(), corpus_b)
    r_reb_b = recall_at_k(
        ivf_pq_search(rebuilt_b, probes, corpus_b, k=K), corpus_b
    )
    scenario_b = {
        "ood_fraction": round((n_total - BOOTSTRAP) / n_total, 3),
        "recall_incr": r_incr_b,
        "recall_rebuild": r_reb_b,
        "recall_gap": round(r_reb_b - r_incr_b, 4),
    }
    print(json.dumps(scenario_b), flush=True)

    for r in roots:
        shutil.rmtree(r, ignore_errors=True)
    out = {
        "sf_dir": sf_dir,
        "bootstrap": BOOTSTRAP,
        "batch": BATCH,
        "bootstrap_build_s": build_s,
        "rungs": rungs,
        "majority_drift": scenario_b,
    }
    path = os.path.join(
        os.path.dirname(__file__), "ivf_pq_append_rung_r13.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
