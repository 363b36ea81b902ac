"""Measure SemDeDup's pair recall honestly: within-cell pairing finds
only duplicates that land in the same k-means cell, so its recall vs the
exhaustive threshold-pair set is < 1 by design (the cost/recall trade
the SemDeDup paper makes; arXiv:2303.09540 reports the same effect).

For each requested sf dir: ground truth = ALL pairs with cosine >=
threshold over the slice (numpy gram matrix — exact), engine = the
driver query's exact configuration (sqrt(N) lowest-id centroids,
quantized assignment). Reports pair recall, plus survivor-set size for
both rules (cell-bounded CC vs full-graph CC) — the end-to-end effect
of missed pairs.

Usage: python tools/semdedup_recall.py [sf_dir ...] [--slice N] [--thr T]
defaults: the three driver sf dirs, slice 2000, thr 0.3.
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np


def _union_find_survivors(n_ids, pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    # survivors: nodes that are their own root, plus untouched ids
    touched = set()
    for a, b in pairs:
        touched.add(a)
        touched.add(b)
    survivors = [i for i in n_ids if i not in touched or find(i) == i]
    return survivors


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=")[0]: a.split("=")[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    slice_n = int(opts.get("--slice", 2000))
    thr = float(opts.get("--thr", 0.3))
    con = duckdb.connect()
    print(
        f"# slice vec_id < {slice_n}, threshold {thr} "
        "(the emb_semdedup driver configuration)"
    )
    print(
        "sf_dir n cells gt_pairs cell_pairs pair_recall "
        "gt_survivors cell_survivors"
    )
    for sf in sf_dirs:
        rows = con.execute(
            "SELECT vec_id, embedding FROM "
            f"read_parquet('{sf}/embeddings.parquet') "
            f"WHERE vec_id < {slice_n} ORDER BY vec_id"
        ).fetchall()
        ids = np.array([r[0] for r in rows])
        X = np.array([np.asarray(r[1], dtype="float64") for r in rows])
        n = len(ids)
        ncells = max(1, math.ceil(math.sqrt(n)))
        # quantized assignment — same rule as assign_cells("quantized")
        C = X[:ncells]
        Cu = C / np.maximum(
            np.linalg.norm(C, axis=1, keepdims=True), 1e-300
        )
        Q = 1e6
        sc = np.floor(X * Q) @ np.floor(Cu * Q).T
        rev = sc[:, ::-1].argmax(axis=1)
        cell = sc.shape[1] - 1 - rev
        Xn = X / np.maximum(
            np.linalg.norm(X, axis=1, keepdims=True), 1e-300
        )
        G = np.round(Xn @ Xn.T, 6)
        iu = np.triu_indices(n, 1)
        hit = G[iu] >= thr
        gt_pairs = [
            (ids[a], ids[b])
            for a, b in zip(iu[0][hit], iu[1][hit])
        ]
        same = cell[iu[0]] == cell[iu[1]]
        cp = hit & same
        cell_pairs = [
            (ids[a], ids[b]) for a, b in zip(iu[0][cp], iu[1][cp])
        ]
        recall = (len(cell_pairs) / len(gt_pairs)) if gt_pairs else 1.0
        gt_surv = _union_find_survivors(list(ids), gt_pairs)
        cl_surv = _union_find_survivors(list(ids), cell_pairs)
        print(
            f"{sf} {n} {ncells} {len(gt_pairs)} {len(cell_pairs)} "
            f"{recall:.3f} {len(gt_surv)} {len(cl_surv)}"
        )

        # planted mode: the population SemDeDup actually targets — TRUE
        # near-duplicates (cosine 0.90-0.99 to an existing row). A real
        # near-dup is nearly collinear with its source, so both land in
        # the same max-cosine cell with high probability; the low
        # threshold-0.3 recall above is the random tail of a synthetic
        # corpus with NO planted dups (pairs at cosine ~0.3 are not
        # collinear and straddle cell boundaries — they are also not
        # duplicates by any usable definition).
        def _top_cells(vecs, k):
            s = np.floor(vecs * Q) @ np.floor(Cu * Q).T
            # stable argsort of -scores: ties keep ascending cell order
            return np.argsort(-s, axis=1, kind="stable")[:, :k]

        rng = np.random.default_rng(13)
        n_plant = 200
        srcs = rng.integers(0, n, n_plant)
        ws = []
        for src in srcs:
            c = 0.90 + 0.09 * rng.random()
            v = Xn[src]
            u = rng.standard_normal(X.shape[1])
            u -= (u @ v) * v
            u /= max(np.linalg.norm(u), 1e-300)
            ws.append(c * v + math.sqrt(1.0 - c * c) * u)
        ws = np.asarray(ws)
        for probes in (1, 2, 3):
            pc_w = _top_cells(ws, probes)
            pc_s = _top_cells(X[srcs], probes)
            hits = sum(
                bool(set(a) & set(b)) for a, b in zip(pc_w, pc_s)
            )
            # threshold-pair recall at this probe count
            pcell = _top_cells(X, probes)
            shared = np.zeros(len(iu[0]), dtype=bool)
            for j in range(probes):
                for jj in range(probes):
                    shared |= pcell[iu[0], j] == pcell[iu[1], jj]
            cp_p = hit & shared
            rec_p = cp_p.sum() / hit.sum() if hit.sum() else 1.0
            print(
                f"  probes={probes}: planted same-cell recall "
                f"{hits / n_plant:.3f}, thr-pair recall {rec_p:.3f}, "
                f"pair evals x{probes * probes}"
            )


if __name__ == "__main__":
    main()
