"""Independent connected-components oracle for the scales where the
DuckDB recursive-CTE closure is intractable (SCALE.md: the sf1.0 dup
graph has 12.4M edges and the naive closure DNFs).

Runs the engine's doc_dup_clusters / doc_near_dedup queries, then
re-derives the expected answer with a DRIVER-SIDE union-find (path
compression + union by size, plain numpy int64 — a completely different
algorithm and runtime from both the Spark pointer-jumping CC and the
DuckDB closure) over the same simhash pair set, and compares:

  * doc_dup_clusters: (node -> min-id cluster label) must match exactly.
  * doc_near_dedup: survivor set + n_members must match exactly.

The pair set itself is value-hash-verified against DuckDB separately
(doc_simhash_near_dup stays green at every sf), so this closes the only
unchecked link in the chain at large sf.

Usage: python tools/verify_cc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def union_find_min_labels(pairs: np.ndarray) -> dict:
    """node -> min node id in its component, for nodes in `pairs`."""
    ids = np.unique(pairs)
    index = {int(v): i for i, v in enumerate(ids)}
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(index[int(a)]), find(index[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root => min label
    # after unioning with min-id roots, the root IS the min index, and
    # ids are sorted so min index <=> min id
    return {int(ids[i]): int(ids[find(i)]) for i in range(len(ids))}


def min_label_propagation(pairs: np.ndarray) -> dict:
    """node -> min node id in its component — vectorized numpy
    min-label propagation with pointer jumping, O(E) per round and
    O(log n) rounds. Same answer as ``union_find_min_labels`` (pinned
    in tests/test_round9_fixes.py) but viable at the sf10 graph size
    (~124M edges), where the per-edge Python union-find loop is not."""
    ids, inv = np.unique(pairs, return_inverse=True)
    inv = inv.reshape(-1, 2)
    ia, ib = inv[:, 0], inv[:, 1]
    labels = np.arange(len(ids), dtype=np.int64)
    while True:
        before = labels.copy()
        m = np.minimum(labels[ia], labels[ib])
        np.minimum.at(labels, ia, m)
        np.minimum.at(labels, ib, m)
        while True:  # pointer jumping: labels hold indices
            nl = labels[labels]
            if np.array_equal(nl, labels):
                break
            labels = nl
        if np.array_equal(labels, before):
            break
    return {int(ids[i]): int(ids[labels[i]]) for i in range(len(ids))}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    import __spark_entry__ as entry
    from ncagg_spark.session import get_spark

    spark = get_spark(app_name="verify-cc")
    spark.sparkContext.setLogLevel("ERROR")

    # the engine's own pair query (value-hash-verified vs DuckDB at the
    # gate sf); collected once and reused by both checks
    pairs_df = entry.queries()["doc_simhash_near_dup"](spark, sf)
    pdf = pairs_df.select("id_a", "id_b").toPandas()  # Arrow transfer
    pairs = pdf.to_numpy(dtype=np.int64).reshape(-1, 2)
    print(f"pairs: {len(pairs):,}")

    labels = (
        min_label_propagation(pairs)
        if len(pairs) > 2_000_000
        else union_find_min_labels(pairs)
    )

    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in entry.queries()["doc_dup_clusters"](spark, sf).collect()
    }
    assert got == labels, (
        f"doc_dup_clusters mismatch: {len(got)} vs {len(labels)} nodes, "
        f"first diffs: "
        f"{[(k, got.get(k), labels.get(k)) for k in list(labels)[:5]]}"
    )
    print(f"doc_dup_clusters: {len(got):,} node labels MATCH union-find")

    # expected near-dedup: survivors = docs not in graph, plus each
    # component's min id with the component size
    from collections import Counter

    sizes = Counter(labels.values())
    import duckdb

    all_ids = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        .fetchall()
    ]
    expect = {}
    for d in all_ids:
        if d not in labels:
            expect[d] = 1
        elif labels[d] == d:
            expect[d] = sizes[d]
    got_nd = {
        int(r["doc_id"]): int(r["n_members"])
        for r in entry.queries()["doc_near_dedup"](spark, sf).collect()
    }
    assert got_nd == expect, (
        f"doc_near_dedup mismatch: {len(got_nd)} vs {len(expect)} "
        "survivors"
    )
    print(
        f"doc_near_dedup: {len(got_nd):,} survivors of {len(all_ids):,} "
        "docs MATCH union-find"
    )
    print("OK")


if __name__ == "__main__":
    main()
