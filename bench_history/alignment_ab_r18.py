#!/usr/bin/env python
"""r18 interleaved A/B: alignment_dist + alignment_pairs, r16 end tree
(11be937, source of the 0.192 s / 0.265 s builder anchors) vs HEAD —
the standing adjudication protocol from SCALE.md r17 (ngram), applied
to the r17 verdict's one open perf flag: both r17 windows read the
alignment pair 2.5-3.0x over anchor on byte-untouched
functions/alignment.py.

Protocol: fresh process per (tree, iteration-block); trees alternate
A,B,A,B,... in one host window; each process warms the stack on
sf0.001 then times each query bench.py-style (full plan per run,
clearCache between runs) for N iterations; the per-process MIN is the
steady-state estimate. Run from the repo root:

    python bench_history/alignment_ab_r18.py

Writes bench_history/alignment_ab_r18.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANCHOR_COMMIT = "11be937"  # r16 end-of-round snapshot
QUERIES = ("alignment_dist", "alignment_pairs")
PAIRS = 5
ITERS = 4

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from data_finder_comparator_spark.session import get_spark
from data_finder_comparator_spark.plans.catalog import QUERIES

spark = get_spark(app_name="alignment_ab")
spark.sparkContext.setLogLevel("ERROR")
names = ("alignment_dist", "alignment_pairs")
iters = int(sys.argv[2])
# warm the stack (JIT, python workers, Arrow) on the smoke SF
for n in names:
    QUERIES[n](spark, "/root/testdata/sf0.001").count()
spark.catalog.clearCache()
mins = {}
for n in names:
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        QUERIES[n](spark, "/root/testdata/sf0.1").count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    mins[n] = round(best, 3)
print("RESULT " + json.dumps(mins))
spark.stop()
"""


def run_child(tree: str, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, str(iters)],
        capture_output=True,
        text=True,
        cwd=tree,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child produced no RESULT: {out.stdout[-800:]} {out.stderr[-800:]}")


def main() -> None:
    wt = os.path.join(tempfile.gettempdir(), f"align_ab_{ANCHOR_COMMIT}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ANCHOR_COMMIT],
            cwd=REPO,
            check=True,
        )
    results = {"anchor_tree": {q: [] for q in QUERIES}, "head": {q: [] for q in QUERIES}}
    try:
        for i in range(PAIRS):
            a = run_child(wt, ITERS)
            b = run_child(REPO, ITERS)
            for q in QUERIES:
                results["anchor_tree"][q].append(a[q])
                results["head"][q].append(b[q])
            print(f"pair {i + 1}/{PAIRS}: anchor={a} head={b}", flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)
    summary = {}
    for q in QUERIES:
        av, hv = results["anchor_tree"][q], results["head"][q]
        med = lambda xs: sorted(xs)[len(xs) // 2]
        summary[q] = {
            "anchor_mins": av,
            "head_mins": hv,
            "anchor_best": min(av),
            "head_best": min(hv),
            "best_ratio": round(min(hv) / min(av), 3),
            "median_ratio": round(med(hv) / med(av), 3),
        }
    payload = {
        "protocol": "interleaved fresh-process A/B, r16 tree vs HEAD, "
        f"{PAIRS} pairs x min-of-{ITERS} at sf0.1",
        "anchor_commit": ANCHOR_COMMIT,
        "summary": summary,
    }
    print(json.dumps(payload, indent=2))
    with open(os.path.join(REPO, "bench_history", "alignment_ab_r18.json"), "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
