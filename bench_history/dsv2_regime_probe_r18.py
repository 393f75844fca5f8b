"""Why do the two Python-DataSource rows (lakehouse_stream_roundtrip,
lakehouse_datasource_snapshot) read 2.7x inside full benches on this
boot while staying at-archive isolated? This probe reproduces both
contexts in one controlled process and splits the stream row into its
phases so the inflation can be ATTRIBUTED, not guessed at:

  build  - base persist + 5 commits + expiry (JVM writes + py commits)
  probe  - the dirty-history refusal stream (1 Python source runner)
  drain  - the main availableNow catch-up stream (1 runner + workers)
  read   - the final parquet read-back + count (pure JVM)

Between timed runs it also measures two host probes: a fixed CPU spin
(detects CPU-steal/interference windows) and a subprocess spawn
(python -c pass; detects fork/exec latency stalls — the Python
DataSource path forks runner/worker processes far more than any other
row, so a fork stall would hit exactly these rows hardest).

Usage:
  python bench_history/dsv2_regime_probe_r18.py            # isolated
  python bench_history/dsv2_regime_probe_r18.py --churn    # bench-like

--churn runs a 12-query mixed slice of the registry (Python workers,
shuffles, a stream, folder scans) before each timed pass, imitating the
full bench's in-process state churn at ~1/8 the wall cost. 3 passes
either way; one JSON line per pass on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHURN = [
    "multimodal_wav_decode",
    "alignment_dist",
    "doc_token_chunks",
    "dedup_exact",
    "orders_grouping_sets",
    "vocab_top_tokens",
    "streaming_session_counts",
    "ann_cosine_topk",
    "csv_folder_roundtrip",
    "cms_heavy_hitters",
    "fuzzy_join_tiers",
    "media_folder_decode",
]


def host_probes() -> dict:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i
    cpu = time.perf_counter() - t0
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", "pass"], check=True)
    spawn = time.perf_counter() - t0
    return {"cpu_spin_s": round(cpu, 3), "py_spawn_s": round(spawn, 3)}


def timed_stream_row(spark, sf_dir: str) -> dict:
    """lakehouse_stream_roundtrip's body, phase-timed (kept in lockstep
    with plans/queries_lakehouse.py — this is a measurement replica,
    not the registered query)."""
    from pyspark.sql import functions as F

    from data_finder_comparator_spark.plans.catalog import track
    from data_finder_comparator_spark.plans.queries_lakehouse import (
        _register_datasource,
    )
    from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable
    from data_finder_comparator_spark.sources.parquet import load_table
    from data_finder_comparator_spark.streaming.pipeline import (
        _drain_to_parquet_sink,
    )
    from data_finder_comparator_spark.util import fresh_run_dir

    ph: dict[str, float] = {}
    t0 = time.perf_counter()
    base = track(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )
    d = fresh_run_dir("lakehouse_stream_probe", sf_dir)
    path = os.path.join(d, "tbl")
    t = TransactionalTable(spark, path, checkpoint_interval=2)
    t.append(base.filter(F.col("o_orderkey") % 4 == 0))
    t.append(base.filter(F.col("o_orderkey") % 4 == 1))
    delta = (
        base.filter((F.col("o_orderkey") % 4 == 0) & (F.col("o_orderkey") % 20 == 0))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    t.merge(delta, "o_orderkey")
    t.append(base.filter(F.col("o_orderkey") % 4 == 2))
    t.append(base.filter(F.col("o_orderkey") % 4 == 3))
    t.expire_snapshots(keep_last=1)
    _register_datasource(spark)
    ph["build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    refused = False
    try:
        pq = (
            spark.readStream.format("lakehouse")
            .load(path)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(d, "ckpt_probe"))
            .trigger(availableNow=True)
            .start()
        )
        pq.awaitTermination()
    except Exception:
        refused = True
    if not refused:
        raise RuntimeError("refusal probe must refuse")
    ph["probe"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = (
        spark.readStream.format("lakehouse")
        .option("startingVersion", 3)
        .load(path)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("_version").alias("v_commit"),
        )
    )
    sink = os.path.join(d, "out")
    _drain_to_parquet_sink(spark, out, sink, os.path.join(d, "ckpt"))
    ph["drain"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, v_commit long"
        )
        .parquet(sink)
        .count()
    )
    ph["read"] = time.perf_counter() - t0
    ph["rows"] = n
    return {k: (round(v, 3) if isinstance(v, float) else v) for k, v in ph.items()}


def main() -> None:
    churn = "--churn" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_finder_comparator_spark.plans.catalog import QUERIES
    from data_finder_comparator_spark.session import get_spark

    spark = get_spark(app_name="dsv2-regime-probe")
    # warmup, like bench.py
    QUERIES["lakehouse_datasource_snapshot"](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    for p in range(3):
        rec: dict = {"pass": p, "churn": churn, "host_pre": host_probes()}
        if churn:
            t0 = time.perf_counter()
            for name in CHURN:
                QUERIES[name](spark, sf_dir).count()
                spark.catalog.clearCache()
            rec["churn_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rec["snapshot_s"] = None
        QUERIES["lakehouse_datasource_snapshot"](spark, sf_dir).count()
        rec["snapshot_s"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rec["stream_phases"] = timed_stream_row(spark, sf_dir)
        rec["stream_total_s"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        rec["host_post"] = host_probes()
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
