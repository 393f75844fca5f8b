#!/usr/bin/env python
"""r18 rung: the STREAMING media connector at growing drop-folder
sizes — the scale claims behind the new `media_stream_decode` driver
row, measured rather than asserted:

1. CATCH-UP: first run over a folder of N files (N = 64, 256, 1024)
   with `maxFilesPerTrigger=64`. Claim: wall time grows ~linearly in N
   (flat per-file cost) and the run splits into ceil(N/64)
   micro-batches — bounded planning, never one enormous batch.
2. INCREMENTAL: after full catch-up, drop 16 NEW files and re-run on
   the same checkpoint. Claim: only the 16 new files decode
   (exactly-once), and the incremental wall time is dominated by the
   fixed stream-start constant + the O(N) re-LISTING — the decode work
   does not scale with the historical corpus. (Listing is the honest
   O(N) term; on an object store it becomes the prefix listing.)

Run from the repo root: python bench_history/stream_media_rung_r18.py
Writes bench_history/stream_media_rung_r18.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTS = (64, 256, 1024)
TRIGGER_CAP = 64
INCREMENT = 16


def run_stream(spark, src: str, out: str, ckpt: str) -> float:
    from data_finder_comparator_spark.sources.media import (
        media_decode,
        stream_media_folder,
    )

    dec = media_decode(
        stream_media_folder(spark, src, glob="*.wav", max_files_per_trigger=TRIGGER_CAP)
    )
    t0 = time.perf_counter()
    q = (
        dec.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = q.lastProgress["batchId"] + 1 if q.lastProgress else 0
    dt = time.perf_counter() - t0
    return dt, batches


def main() -> None:
    from data_finder_comparator_spark.operators.multimodal import synth_wav_payload
    from data_finder_comparator_spark.session import get_spark

    spark = get_spark(app_name="stream_media_rung")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in COUNTS:
        base = tempfile.mkdtemp(prefix=f"smr_{n}_")
        src = os.path.join(base, "drop")
        os.makedirs(src)
        for i in range(n):
            with open(os.path.join(src, f"f_{i}.wav"), "wb") as f:
                f.write(synth_wav_payload(f"payload {i} ".encode() * 8))
        # decoys the glob must prune at listing time
        with open(os.path.join(src, "README.txt"), "w") as f:
            f.write("decoy\n")
        out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")

        catchup_s, catchup_batches = run_stream(spark, src, out, ckpt)
        rows = spark.read.parquet(out).count()
        assert rows == n, (rows, n)

        for i in range(INCREMENT):
            with open(os.path.join(src, f"new_{i}.wav"), "wb") as f:
                f.write(synth_wav_payload(f"new {i} ".encode() * 8))
        incr_s, incr_batches = run_stream(spark, src, out, ckpt)
        rows2 = spark.read.parquet(out).count()
        assert rows2 == n + INCREMENT, (rows2, n + INCREMENT)

        results.append(
            {
                "files": n,
                "catchup_s": round(catchup_s, 3),
                "catchup_batches": catchup_batches,
                "per_file_ms": round(catchup_s / n * 1000, 2),
                "incremental_s": round(incr_s, 3),
                "incremental_decoded": INCREMENT,
            }
        )
        print(json.dumps(results[-1]), flush=True)
        shutil.rmtree(base)
    payload = {
        "rung": "streaming media connector catch-up + incremental",
        "trigger_cap": TRIGGER_CAP,
        "results": results,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_media_rung_r18.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
