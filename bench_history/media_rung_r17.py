"""Media binaryFile connector scale rung (r17): measure the two claims
the connector's 100-TB design rests on, at growing file counts.

1. ONE distributed scan, file-parallel by construction — scan + decode
   wall time should grow ~linearly in file count (per-file cost flat),
   with NO repartition stage anywhere (the r16 review dropped the
   fan-out shuffle; this rung pins the consequence in numbers).
2. ``pathGlobFilter`` prunes at LISTING time — a folder carrying N
   matching files plus N decoys must scan in ~the matching-only time,
   because excluded files are never opened (their bytes never move).
   On a local FS the listing itself is cheap; on an object store the
   same option is pushed to the store's prefix listing, which is
   exactly why the pruning must happen there and not as a post-scan
   filter.

Writes bench_history/media_rung_r17.json. Usage:
  python bench_history/media_rung_r17.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_finder_comparator_spark.operators.multimodal import (
        synth_ppm_payload,
        synth_wav_payload,
    )
    from data_finder_comparator_spark.session import get_spark
    from data_finder_comparator_spark.sources.media import (
        media_decode,
        read_media_folder,
    )

    spark = get_spark(app_name="media_rung")
    payload = bytes(range(256)) * 8  # 2 KiB of sample data per wav
    out: dict[str, dict] = {}
    base = tempfile.mkdtemp(prefix="media_rung_")
    try:
        for n in (64, 256, 1024):
            d = os.path.join(base, f"n{n}")
            os.makedirs(d)
            for i in range(n // 2):
                with open(os.path.join(d, f"doc_{i}.wav"), "wb") as f:
                    f.write(synth_wav_payload(payload))
                with open(os.path.join(d, f"img_{i}.ppm"), "wb") as f:
                    f.write(synth_ppm_payload(i, 16, 12))
            # decoys: same count again, excluded by the glob
            for i in range(n):
                with open(os.path.join(d, f"decoy_{i}.bin"), "wb") as f:
                    f.write(b"\0" * 2048)

            def best(fn, runs=3):
                b = None
                for _ in range(runs):
                    t0 = time.perf_counter()
                    fn()
                    dt = time.perf_counter() - t0
                    b = dt if b is None else min(b, dt)
                return round(b, 3)

            glob = "*.{wav,ppm}"
            scan = best(lambda: read_media_folder(spark, d, glob=glob).count())
            dec = best(
                lambda: media_decode(read_media_folder(spark, d, glob=glob)).count()
            )
            # scan WITHOUT decoys present: copy the matching files only
            d2 = os.path.join(base, f"clean{n}")
            os.makedirs(d2)
            for f in os.listdir(d):
                if f.endswith((".wav", ".ppm")):
                    shutil.copy(os.path.join(d, f), os.path.join(d2, f))
            dec_clean = best(
                lambda: media_decode(read_media_folder(spark, d2)).count()
            )
            out[str(n)] = {
                "files": n,
                "decoys": n,
                "scan_glob_s": scan,
                "decode_glob_s": dec,
                "decode_no_decoys_s": dec_clean,
                "per_file_decode_ms": round(dec / n * 1000, 2),
            }
            print(json.dumps(out[str(n)]), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "media_rung_r17.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
