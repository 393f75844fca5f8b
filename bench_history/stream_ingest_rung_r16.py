"""Round-16 streaming-ingest scale rung: price the exactly-once
foreachBatch sink (``stream_merge_into_table``) the way the other
rungs price their planes — as curves over the quantity each cost
claims to be bounded by.

Claims under test (the r16 driver row's 100-TB docstring):

  per-epoch cost is bounded by the FILES THE EPOCH'S KEYS HIT
  (footer/Bloom hit detection + rewrite of those files) plus a fixed
  streaming-machinery constant — never by table size. On a
  range-clustered table a banded epoch therefore costs the same at
  100k and 1.6M carried rows;

  the txn-marker replay check is one manifest read — a replayed epoch
  costs ~nothing regardless of epoch size.

Axes:
  * axis A (must stay ~flat): per-epoch wall at carried table rows
    100k / 400k / 1.6M, fixed 4 banded epochs of 2k keys each;
  * axis B (must stay ~flat and tiny): replay-merge wall at the same
    table sizes (the marker no-op path).

Design note: the bootstrap pins FILE SIZE (6,250 rows/file), not file
count — the production shape (a growing table adds files at a
~constant target size; compaction maintains it). With a fixed file
COUNT instead, files grow with the table and a banded epoch's one-file
rewrite grows with them — a first cut of this rung measured exactly
that (1.3 s -> 4.2 s per merge across 16x rows at n_out=16), which is
the correct cost model for a table nobody compacts, not a refutation
of the flat claim. A throwaway 1-epoch stream runs first so the
~7 s streaming-machinery cold start (state store, sink classes) is not
billed to the smallest table. Writes stream_ingest_rung_r16.json. Run:
  python bench_history/stream_ingest_rung_r16.py
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

EPOCHS = 4
EPOCH_KEYS = 2_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_finder_comparator_spark.sinks.lakehouse import TransactionalTable
    from data_finder_comparator_spark.streaming.pipeline import (
        stream_merge_into_table,
    )

    def frame(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )

    def run_stream(rows: int, d: str) -> dict:
        tbl = os.path.join(d, "tbl")
        # range-clustered bootstrap at PINNED file size (6,250 rows per
        # file — see the design note): a banded epoch hits 1-2 files of
        # the same size at every table size
        t = TransactionalTable(spark, tbl, cluster_by=["k"], bloom_col="k")
        t.append(frame(0, rows), n_out=max(4, rows // 6_250))

        src = os.path.join(d, "src")
        now = time.time()
        for e in range(EPOCHS):
            sub = os.path.join(src, f"e{e}")
            # each epoch updates a distinct 2k-key band
            frame(e * EPOCH_KEYS, EPOCH_KEYS).withColumn(
                "v", F.lit(f"epoch-{e}")
            ).coalesce(1).write.parquet(sub)
            ts = now - 600 + e * 60
            for name in os.listdir(sub):
                if name.endswith(".parquet"):
                    os.utime(os.path.join(sub, name), (ts, ts))
        stream = (
            spark.readStream.schema("k long, v string")
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        t0 = time.perf_counter()
        t = stream_merge_into_table(
            stream, tbl, "k", txn_app="rung", checkpoint=os.path.join(d, "ckpt")
        )
        stream_ms = (time.perf_counter() - t0) * 1000
        assert t.current_version() == 1 + EPOCHS

        # replay path: re-merge epoch 0's delta with its marker
        t0 = time.perf_counter()
        t.merge(
            frame(0, EPOCH_KEYS).withColumn("v", F.lit("epoch-0")),
            "k",
            txn_app="rung",
            txn_version=0,
        )
        replay_ms = (time.perf_counter() - t0) * 1000
        assert t.current_version() == 1 + EPOCHS

        return {
            "stream_total_ms": round(stream_ms, 1),
            "per_epoch_ms": round(stream_ms / EPOCHS, 1),
            "replay_merge_ms": round(replay_ms, 1),
            "live_files": len(t.snapshot()[1]["files"]),
        }

    out: dict = {"epochs": EPOCHS, "epoch_keys": EPOCH_KEYS}
    # throwaway warmup: pay the streaming cold start before measuring
    warm = tempfile.mkdtemp(prefix="ingest-rung-warm-")
    run_stream(20_000, warm)
    shutil.rmtree(warm, True)
    for rows in (100_000, 400_000, 1_600_000):
        d = tempfile.mkdtemp(prefix="ingest-rung-")
        out[f"rows={rows}"] = run_stream(rows, d)
        shutil.rmtree(d, True)
    path = os.path.join(os.path.dirname(__file__), "stream_ingest_rung_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
