"""Round-9 ANN parameter sweep (offline, numpy replica).

Replicates the EXACT bucket/routing arithmetic of
operators/similarity.py (md5-derived hyperplanes, stride centroids,
6-dp rounded cosine, cand_id tiebreaks) in numpy so dozens of
configurations can be measured in seconds instead of Spark-minutes.
The chosen winner is then re-verified through the real Spark operators
(test_ann_recall_audit_oracle_ready) — this script only picks, the
pinned numbers come from Spark.

Cost metric = distinct (probe, cand) scored pairs, the thing that
actually grows at 100 TB. Recall metric = recall@5 vs exact brute
force ground truth.
"""

from __future__ import annotations

import hashlib
import json
import sys

import numpy as np
import pyarrow.parquet as pq


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], vecs[order]


def cosine_matrix(P, C):
    np_ = (P * P).sum(axis=1)
    nc = (C * C).sum(axis=1)
    return np.round(P @ C.T / np.sqrt(np.outer(np_, nc)), 6)


def truth_topk(pids, cids, sims, k=5):
    """Top-k per probe by (sim desc, cand_id asc), self excluded."""
    out = set()
    for i, pid in enumerate(pids):
        row = sims[i].copy()
        mask = cids == pid
        row[mask] = -np.inf
        idx = np.lexsort((cids, -row))[:k]
        for j in idx:
            out.add((pid, cids[j]))
    return out


def hyperplanes(n_tables, n_planes, dim):
    """h[t][p][i] = (int(md5(f'hp{t}:{p}:{i}')[:5],16)/2^20) - 0.5 —
    byte-identical to operators/similarity.py::hyperplane_bucket."""
    H = np.empty((n_tables, n_planes, dim))
    for t in range(n_tables):
        for p in range(n_planes):
            for i in range(dim):
                h = hashlib.md5(f"hp{t}:{p}:{i}".encode()).hexdigest()[:5]
                H[t, p, i] = int(h, 16) / 1048576.0 - 0.5
    return H


def lsh_pairs(ids, V, probe_mask, n_planes, n_tables, multiprobe=0):
    """Distinct candidate pairs from OR-construction over n_tables,
    optionally probing all Hamming<=1 buckets on the probe side."""
    H = hyperplanes(n_tables, n_planes, V.shape[1])
    pairs = set()
    pids = ids[probe_mask]
    for t in range(n_tables):
        proj = V @ H[t].T  # (n, planes)
        bits = proj >= 0
        codes = np.packbits(bits, axis=1, bitorder="little")[:, 0].astype(np.int64)
        by_bucket: dict[int, list[int]] = {}
        for i, c in enumerate(codes):
            by_bucket.setdefault(int(c), []).append(i)
        for i in np.nonzero(probe_mask)[0]:
            pid = ids[i]
            probe_codes = [int(codes[i])]
            if multiprobe:
                for b in range(n_planes):
                    probe_codes.append(int(codes[i]) ^ (1 << b))
            for pc in probe_codes:
                for j in by_bucket.get(pc, ()):
                    if ids[j] != pid:
                        pairs.add((pid, ids[j]))
    return pairs


def ivf_pairs(ids, V, probe_mask, stride, nprobe):
    cent_mask = ids % stride == 0
    cent_ids, C = ids[cent_mask], V[cent_mask]
    sims = cosine_matrix(V, C)  # every vector x centroid
    # candidate cell: rank 1 by (sim desc, cent_id)
    order = np.lexsort((np.broadcast_to(cent_ids, sims.shape), -sims), axis=1)
    cell_of = cent_ids[order[:, 0]]
    by_cell: dict[int, list[int]] = {}
    for i, c in enumerate(cell_of):
        by_cell.setdefault(int(c), []).append(i)
    pairs = set()
    for i in np.nonzero(probe_mask)[0]:
        pid = ids[i]
        for c in cent_ids[order[i, :nprobe]]:
            for j in by_cell.get(int(c), ()):
                if ids[j] != pid:
                    pairs.add((pid, ids[j]))
    return pairs


def recall_of(pairs, ids, V, probe_mask, truth, k=5):
    """Recall@k: of the true top-k pairs, how many appear in the
    approximate top-k (per-probe rank over the candidate pairs)."""
    pids = ids[probe_mask]
    sim_lookup = {}
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    by_probe: dict[int, list[int]] = {}
    for pid, cid in pairs:
        by_probe.setdefault(int(pid), []).append(int(cid))
    approx = set()
    for pid, cands in by_probe.items():
        pv = V[id_to_row[pid]]
        cv = V[[id_to_row[c] for c in cands]]
        s = np.round(
            cv @ pv / np.sqrt((cv * cv).sum(axis=1) * (pv @ pv)), 6
        )
        idx = np.lexsort((np.asarray(cands), -s))[:k]
        for j in idx:
            approx.add((pid, cands[j]))
    hits = len(truth & approx)
    return hits / len(truth), len(pairs)


def main(sf_dir):
    ids, V = load(sf_dir)
    probe_mask = ids % 25 == 0
    pids = ids[probe_mask]
    sims = cosine_matrix(V[probe_mask], V)
    truth = truth_topk(pids, ids, sims, k=5)
    n = len(ids)
    results = {}

    base_lsh = lsh_pairs(ids, V, probe_mask, 4, 4, 0)
    base_cost = len(base_lsh)
    print(f"n={n} probes={len(pids)} truth={len(truth)} base_lsh_pairs={base_cost}")

    for planes in (3, 4, 5, 6, 8):
        for tables in (4, 6, 8, 12, 16):
            for mp in (0, 1):
                pairs = lsh_pairs(ids, V, probe_mask, planes, tables, mp)
                r, c = recall_of(pairs, ids, V, probe_mask, truth)
                key = f"lsh_p{planes}_t{tables}_mp{mp}"
                results[key] = {"recall": round(r, 4), "pairs": c,
                                "cost_x": round(c / base_cost, 2)}
                print(key, results[key])

    base_ivf = ivf_pairs(ids, V, probe_mask, 50, 3)
    print(f"base_ivf_pairs={len(base_ivf)}")
    for stride in (50, 25, 12):
        for nprobe in (3, 5, 8, 12, 16):
            pairs = ivf_pairs(ids, V, probe_mask, stride, nprobe)
            r, c = recall_of(pairs, ids, V, probe_mask, truth)
            key = f"ivf_s{stride}_np{nprobe}"
            results[key] = {"recall": round(r, 4), "pairs": c,
                            "cost_x": round(c / len(base_ivf), 2)}
            print(key, results[key])

    with open("bench_history/ann_sweep_r9.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "n": n, "probes": len(pids),
                   "base_lsh_pairs": base_cost,
                   "base_ivf_pairs": len(base_ivf),
                   "results": results}, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
