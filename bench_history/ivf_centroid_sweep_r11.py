"""Round-11 IVF quantizer sweep: trained k-means vs stride-sampled
centroids (r10 verdict item 4).

Numpy replica of the EXACT routing arithmetic of
operators/similarity.py (6-dp rounded cosine, cand_id/cent_id
tiebreaks) and of operators/clustering.kmeans_lloyd's semantics
(seeds = k smallest vec_ids, argmin by (L2^2, lower centroid id),
mean update, empty centroids drop out), so dozens of configurations
measure in seconds. Decimal-exact sums are replaced by float64 —
adequate for recall measurement; any adopted winner is re-verified
through the real Spark operators before the default changes
(the r9 sweep protocol).

Probe discipline (the r9 confound lesson): probes are vec_id % 25 == 0
and stride centroids are vec_id % stride == 0 — at stride 50 every
centroid IS a probe, which inflated an apparent stride-25 win in r8.
This sweep therefore ALSO measures disjoint-offset stride centroids
(vec_id % stride == 1) so sampled-vs-trained is compared on both the
coincident and the clean footing.

Cost metric = distinct scored (probe, cand) pairs — the quantity that
grows at 100 TB. Recall metric = recall@5 vs exact brute force.
"""

from __future__ import annotations

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


def rounded_cos(P, C):
    np_ = (P * P).sum(axis=1)
    nc = (C * C).sum(axis=1)
    return np.round(P @ C.T / np.sqrt(np.outer(np_, nc)), 6)


def truth_topk(pids, cids, sims, k=5):
    out = set()
    for i, pid in enumerate(pids):
        row = sims[i].copy()
        row[cids == pid] = -np.inf
        idx = np.lexsort((cids, -row))[:k]
        out.update((pid, cids[j]) for j in idx)
    return out


def kmeans_lloyd_np(vecs, ids, k, iterations, spherical=False):
    """kmeans_lloyd semantics in numpy: seeds = k smallest vec_ids'
    vectors, assign by (L2^2 asc, centroid id asc), mean update,
    empty centroids drop. Returns (cent_ids, cent_vecs)."""
    X = vecs / np.linalg.norm(vecs, axis=1, keepdims=True) if spherical else vecs
    seed_order = np.argsort(ids)[:k]
    cent_ids = ids[seed_order].copy()
    C = X[seed_order].copy()
    for _ in range(iterations):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # argmin keeps the FIRST minimum; cent_ids stay ascending, so
        # that is exactly "ties to the lower centroid id"
        assign = d2.argmin(axis=1)
        keep, newC, new_ids = [], [], []
        for j in range(C.shape[0]):
            members = X[assign == j]
            if len(members) == 0:
                continue
            keep.append(j)
            newC.append(members.mean(axis=0))
            new_ids.append(cent_ids[j])
        C = np.asarray(newC)
        cent_ids = np.asarray(new_ids)
    return cent_ids, C


def route(P, pids, C_cands, cids, cents, cent_ids, nprobe, n_assign, k=5):
    """Replicates nearest_centroid_cells + the IVF pair join; returns
    (recall@5 vs the provided truth set is computed by caller,
    scored-pair set)."""
    cand_cell = rounded_cos(C_cands, cents)
    probe_cell = rounded_cos(P, cents)

    def top_cells(sim_matrix, n):
        # rank by (sim desc, cent_id asc)
        idx = np.lexsort(
            (np.broadcast_to(cent_ids, sim_matrix.shape), -sim_matrix), axis=1
        )[:, :n]
        return idx

    cand_top = top_cells(cand_cell, n_assign)
    probe_top = top_cells(probe_cell, nprobe)
    cell_to_cands: dict[int, list[int]] = {}
    for i, cells in enumerate(cand_top):
        for c in cells:
            cell_to_cands.setdefault(c, []).append(i)
    pairs = set()
    for i, cells in enumerate(probe_top):
        pid = pids[i]
        for c in cells:
            for j in cell_to_cands.get(c, ()):
                if cids[j] != pid:
                    pairs.add((pid, cids[j]))
    return pairs


def topk_from_pairs(P, pids, C_cands, cids, pairs, k=5):
    sims = rounded_cos(P, C_cands)
    cid_pos = {c: j for j, c in enumerate(cids)}
    pid_pos = {p: i for i, p in enumerate(pids)}
    per: dict[int, list] = {}
    for pid, cid in pairs:
        per.setdefault(pid, []).append(
            (-sims[pid_pos[pid], cid_pos[cid]], cid)
        )
    out = set()
    for pid, lst in per.items():
        lst.sort()
        out.update((pid, cid) for _, cid in lst[:k])
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ids, vecs = load(sf_dir)
    pmask = ids % 25 == 0
    P, pids = vecs[pmask], ids[pmask]
    truth = truth_topk(pids, ids, rounded_cos(P, vecs), k=5)

    def stride_cents(stride, offset=0):
        m = ids % stride == offset
        return ids[m], vecs[m]

    configs = []
    quantizers = {
        "stride50": stride_cents(50, 0),
        "stride50_disjoint": stride_cents(50, 1),
        "kmeans_k100_it2": kmeans_lloyd_np(vecs, ids, 100, 2),
        "kmeans_k100_it5": kmeans_lloyd_np(vecs, ids, 100, 5),
        "kmeans_k100_it2_spherical": kmeans_lloyd_np(vecs, ids, 100, 2, spherical=True),
        "kmeans_k200_it2": kmeans_lloyd_np(vecs, ids, 200, 2),
    }
    for qname, (cent_ids, cents) in quantizers.items():
        for nprobe, n_assign in ((5, 2), (8, 2), (5, 3)):
            pairs = route(P, pids, vecs, ids, cents, cent_ids, nprobe, n_assign)
            got = topk_from_pairs(P, pids, vecs, ids, pairs)
            configs.append(
                {
                    "quantizer": qname,
                    "n_centroids": int(len(cent_ids)),
                    "nprobe": nprobe,
                    "n_assign": n_assign,
                    "scored_pairs": len(pairs),
                    "recall@5": round(len(got & truth) / len(truth), 4),
                }
            )
            print(json.dumps(configs[-1]), flush=True)
    base = next(
        c
        for c in configs
        if c["quantizer"] == "stride50" and c["nprobe"] == 5 and c["n_assign"] == 2
    )
    out = {
        "sf_dir": sf_dir,
        "n_vectors": int(len(ids)),
        "n_probes": int(len(pids)),
        "baseline": base,
        "configs": configs,
    }
    with open("bench_history/ivf_centroid_sweep_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote bench_history/ivf_centroid_sweep_r11.json")


if __name__ == "__main__":
    main()
