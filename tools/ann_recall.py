"""ANN recall harness: measured recall@k of every approximate top-k
operator against the exact brute-force baseline, across parameter
sweeps.

Approximate operators are only trustworthy with a measured recall
curve — this prints one per method (SRP-LSH planes sweep, IVF cells x
probes, IVF with trained k-means centroids, PQ codebook/rerank sweep)
and emits a markdown table for SCALE.md plus one JSON line for
machine diffing.

Usage:
    python tools/ann_recall.py [sf_dir] [k] [--sqrtn] [--planted]
defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, k=10.

--sqrtn (VERDICT r8 #7): skip the parameter sweeps and measure ONLY the
production sqrt(N)-rule IVF (n_cells=ceil(sqrt(N)), n_probe=
ceil(n_cells/4), quantized assignment — exactly q_emb_ivf_topk's
config) against the exact matmul baseline — the form that is feasible
at sf1.0/sf10, where the full sweep is not.

--planted (VERDICT r9 #3): un-flatter the recall evidence. The corpus's
own replica structure inflates recall (replicas of a query vector are
its true neighbors AND quantize into the query's own cell), so this
mode draws queries INDEPENDENT of it: 50 random unit vectors (seeded),
each with k planted neighbors at controlled cosines 0.90..0.98
(v = cos*q + sqrt(1-cos^2)*u, u a random unit orthogonal to q — exact
cosine by construction). Background cosines in dim 64 concentrate at
|cos| <~ 0.4, so the planted rows are the unambiguous true top-k; the
exact baseline is still computed (never assumed). Measures the
production sqrt(N)-IVF, multi-probe SRP, and the IVFADC composition
against that baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ncagg_spark.session import get_spark
from ncagg_spark.sources.tables import load_table
from ncagg_spark.pipeline.pq import pq_encode, pq_topk, pq_train
from ncagg_spark.pipeline.similarity import (
    brute_force_topk_matmul,
    ivf_topk,
    kmeans_centroids,
    srp_lsh_topk,
)

N_QUERIES = 50


def recall_at_k(approx, exact) -> float:
    hits = approx.join(
        exact, on=["query_id", "neighbor_id"], how="semi"
    ).count()
    return hits / exact.count()


def planted_corpus(spark, corpus, dim: int, k: int, *, seed: int = 7,
                   n_queries: int = N_QUERIES):
    """Augment the corpus with k planted neighbors per query at exact,
    controlled cosines; queries get fresh ids (never in the corpus).
    Returns (augmented_corpus, queries, planted_ids_by_query)."""
    import math

    import numpy as np

    rng = np.random.default_rng(seed)
    max_id = int(corpus.agg(F.max("vec_id")).first()[0])
    Q = rng.standard_normal((n_queries, dim))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    rows, planted_by_q = [], {}
    for qi in range(n_queries):
        q = Q[qi]
        ids = []
        for j in range(k):
            cos = 0.90 + 0.08 * (j / max(k - 1, 1))  # 0.90 .. 0.98
            u = rng.standard_normal(dim)
            u -= (u @ q) * q
            u /= np.linalg.norm(u)
            v = cos * q + math.sqrt(1.0 - cos * cos) * u
            vid = max_id + 1 + qi * k + j
            ids.append(vid)
            rows.append((vid, [float(x) for x in v], -1))
        planted_by_q[max_id + 10_000_000 + qi] = ids
    schema = "vec_id long, embedding array<float>, label int"
    aug = corpus.select("vec_id", "embedding", "label").unionByName(
        spark.createDataFrame(rows, schema)
    )
    queries = spark.createDataFrame(
        [
            (max_id + 10_000_000 + qi, [float(x) for x in Q[qi]], -2)
            for qi in range(n_queries)
        ],
        schema,
    )
    return aug, queries, planted_by_q


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = (args[0] if args else None) or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sqrtn_only = "--sqrtn" in sys.argv[1:]
    planted = "--planted" in sys.argv[1:]
    k = int(args[1]) if len(args) > 1 else 10
    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = load_table(spark, f"{sf_dir}/embeddings.parquet")
    dim = len(corpus.select("embedding").first()[0])
    if planted:
        corpus, queries, _ = planted_corpus(spark, corpus, dim, k)
    corpus = corpus.persist()
    n = corpus.count()
    if not planted:
        stride = max(n // N_QUERIES, 1)
        queries = corpus.filter(F.col("vec_id") % stride == 0)
    queries = queries.persist()
    nq = queries.count()
    print(
        f"sf_dir={sf_dir} corpus={n} queries={nq} dim={dim} k={k}"
        f"{' PLANTED (replica-independent)' if planted else ''}"
    )

    t0 = time.time()
    exact = brute_force_topk_matmul(corpus, queries, k=k).persist()
    exact.count()
    print(f"exact baseline (matmul): {time.time() - t0:.1f}s")

    rows: list[dict] = []

    def run(method: str, params: str, df) -> None:
        t = time.time()
        r = recall_at_k(df, exact)
        rows.append(
            {
                "method": method,
                "params": params,
                "recall": round(r, 4),
                "sec": round(time.time() - t, 2),
            }
        )
        print(f"  {method:12s} {params:28s} recall@{k}={r:.4f}")

    if sqrtn_only or planted:
        import math

        n_cells = max(1, math.ceil(math.sqrt(n)))
        n_probe = max(1, math.ceil(n_cells / 4))
        print(
            f"sqrt(N) IVF (production q_emb_ivf_topk rule): "
            f"n_cells={n_cells} n_probe={n_probe}"
        )
        run(
            "ivf_sqrtn",
            f"n_cells={n_cells} n_probe={n_probe} quantized",
            ivf_topk(
                corpus,
                queries,
                k=k,
                n_cells=n_cells,
                n_probe=n_probe,
                assign_method="quantized",
            ),
        )
        if planted:
            # the two other production approximations, on the same
            # replica-independent baseline
            for probes in (2, 4, 8):
                run(
                    "srp_lsh",
                    f"n_planes=8 probes={probes}",
                    srp_lsh_topk(
                        corpus, queries, k=k, n_planes=8, dim=dim,
                        probes=probes,
                    ),
                )
            from ncagg_spark.pipeline.pq import (
                build_ivf_pq_index,
                ivf_pq_topk,
            )
            from ncagg_spark.pipeline.similarity import sample_centroids

            cents = sample_centroids(corpus, n_cells)
            books = pq_train(corpus, dim=dim, m=8, n_codes=64)
            index = build_ivf_pq_index(corpus, cents, books).persist()
            index.count()
            run(
                "ivfpq",
                f"n_cells={n_cells} n_probe={n_probe} m=8x64 expand=4",
                ivf_pq_topk(
                    index, cents, books, corpus, queries,
                    k=k, expand=4, n_probe=n_probe,
                ),
            )
            index.unpersist()
        print()
        print(f"| sf_dir | N | method | params | recall@{k} |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {sf_dir} | {n} | {r['method']} | {r['params']} "
                f"| {r['recall']:.4f} |"
            )
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "k": k,
                    "n_queries": nq,
                    "planted": planted,
                    "rows": rows,
                }
            )
        )
        return

    print("SRP-LSH (bucket = sign pattern; multi-probe flips closest planes):")
    for n_planes in (2, 4, 6, 8):
        for probes in (1, 2, 4, 8):
            if probes > n_planes + 1:
                continue
            run(
                "srp_lsh",
                f"n_planes={n_planes} probes={probes}",
                srp_lsh_topk(
                    corpus,
                    queries,
                    k=k,
                    n_planes=n_planes,
                    dim=dim,
                    probes=probes,
                ),
            )

    print("IVF-Flat (sampled centroids):")
    for n_cells in (8, 16, 32):
        for n_probe in (1, 2, 4, 8):
            if n_probe > n_cells:
                continue
            run(
                "ivf",
                f"n_cells={n_cells} n_probe={n_probe}",
                ivf_topk(
                    corpus, queries, k=k, n_cells=n_cells, n_probe=n_probe
                ),
            )

    print("IVF-Flat (trained k-means centroids, 4 Lloyd iters):")
    for n_cells in (8, 16):
        cents = kmeans_centroids(corpus, n_cells, max_iter=4)
        for n_probe in (1, 2, 4):
            run(
                "ivf_kmeans",
                f"n_cells={n_cells} n_probe={n_probe}",
                ivf_topk(
                    corpus,
                    queries,
                    k=k,
                    n_cells=n_cells,
                    n_probe=n_probe,
                    centroids=cents,
                ),
            )

    print("PQ (trained codebooks, ADC + exact rerank of expand*k):")
    for m, n_codes in ((4, 16), (8, 16), (8, 64)):
        books = pq_train(corpus, dim=dim, m=m, n_codes=n_codes)
        codes = pq_encode(corpus, books).persist()
        codes.count()
        for expand in (1, 2, 4):
            # ADC candidates -> exact per-query rerank of expand*k
            # (standard PQ): candidate pairs are nq*expand*k rows, so
            # the rerank is a tiny equi-join + window
            from pyspark.sql import Window

            from ncagg_spark.functions.vectors import (
                dot,
                l2_norm,
                norm_guard,
            )

            cand = pq_topk(codes, books, queries, k=expand * k).select(
                "query_id", "neighbor_id"
            )
            qv = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_vec"),
                norm_guard(l2_norm("embedding")).alias("q_norm"),
            )
            cv = corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_vec"),
                norm_guard(l2_norm("embedding")).alias("c_norm"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("neighbor_id").asc()
            )
            scored = (
                cand.join(F.broadcast(qv), on="query_id")
                .join(cv, on="neighbor_id")
                .withColumn(
                    "cosine",
                    dot("q_vec", "c_vec")
                    / (F.col("q_norm") * F.col("c_norm")),
                )
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank", "cosine")
            )
            run("pq", f"m={m} codes={n_codes} expand={expand}", scored)
        codes.unpersist()

    print()
    print("| method | params | recall@{} | eval s |".format(k))
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['method']} | {r['params']} | {r['recall']:.4f} "
            f"| {r['sec']} |"
        )
    print(
        json.dumps(
            {"sf_dir": sf_dir, "k": k, "n_queries": nq, "rows": rows}
        )
    )


if __name__ == "__main__":
    main()
