"""ANN scaling measurement (feeds SCALE.md): generates a clustered
synthetic embedding corpus far above the driver's sf0.1 (2,000 vectors),
then measures brute-force / SRP-LSH / IVF top-k latency and the
approximate methods' recall against the exact result.

Everything is generated INSIDE Spark (spark.range + hash-based
pseudo-random expressions — no driver-side data, no numpy broadcast), so
the same script is a valid shape at any scale.

Usage: python tools/scale_ann.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ncagg_spark.pipeline.pq import pq_train
from ncagg_spark.pipeline.similarity import (
    assign_cells,
    brute_force_topk_matmul,
    brute_force_topk_relational,
    ivf_topk,
    sample_centroids,
    srp_lsh_topk,
)
from ncagg_spark.session import get_spark

DIM = 64
N_CLUSTERS = 256
K = 5


def synth_corpus(spark, n: int):
    """n clustered vectors: vec = cluster_center + small per-vector noise.

    Components are murmur3-hash-derived uniforms in [-1, 1] (center) and
    [-0.15, 0.15] (noise) — deterministic, partition-layout independent.
    """
    def u(seed_cols, lo, hi):
        h = F.hash(*seed_cols)
        return (h % 10000 + 10000) % 10000 / F.lit(10000.0) * (hi - lo) + lo

    base = spark.range(n).select(
        F.col("id").alias("vec_id"), (F.col("id") % N_CLUSTERS).alias("cl")
    )
    comps = [
        (
            u([F.col("cl"), F.lit(i), F.lit("c")], -1.0, 1.0)
            + u([F.col("vec_id"), F.lit(i), F.lit("n")], -0.15, 0.15)
        ).alias(f"x{i}")
        for i in range(DIM)
    ]
    return base.select(
        "vec_id", F.array(*comps).cast("array<double>").alias("embedding")
    )


def recall(approx, exact) -> float:
    hits = approx.join(
        exact, on=["query_id", "neighbor_id"], how="semi"
    ).count()
    return hits / exact.count()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark(app_name="scale-ann")
    spark.sparkContext.setLogLevel("ERROR")

    if n_q > n:
        sys.exit(f"n_q ({n_q}) cannot exceed n ({n})")
    corpus = synth_corpus(spark, n)
    corpus = corpus.repartition(32, "vec_id").persist()
    corpus.write.format("noop").mode("overwrite").save()
    stride = max(n // n_q, 1)
    queries = corpus.filter(F.col("vec_id") % stride == 0).persist()
    n_q = queries.count()  # actual count (stride rounding)
    print(f"corpus={corpus.count()} queries={n_q} dim={DIM}")

    t0 = time.time()
    exact = brute_force_topk_relational(corpus, queries, k=K).persist()
    exact.write.format("noop").mode("overwrite").save()
    t_brute = time.time() - t0
    print(f"brute_relational: {t_brute:.2f}s "
          f"({n * n_q / t_brute / 1e6:.1f}M pair-scores/s)")

    t0 = time.time()
    srp = srp_lsh_topk(corpus, queries, k=K, n_planes=8, dim=DIM).persist()
    srp.write.format("noop").mode("overwrite").save()
    t_srp = time.time() - t0
    print(f"srp_lsh_topk:     {t_srp:.2f}s  recall@{K}={recall(srp, exact):.3f}")

    t0 = time.time()
    cents = sample_centroids(corpus, N_CLUSTERS)
    ivf = ivf_topk(
        corpus, queries, k=K, n_cells=N_CLUSTERS, n_probe=8, centroids=cents
    ).persist()
    ivf.write.format("noop").mode("overwrite").save()
    t_ivf = time.time() - t0
    print(f"ivf_topk(sql):    {t_ivf:.2f}s  recall@{K}={recall(ivf, exact):.3f}")

    # index-build vs search split: at scale the corpus->cell assignment
    # is computed once and amortized over every query batch
    t0 = time.time()
    cells = assign_cells(
        corpus, cents, vec_col="embedding", method="arrow"
    ).persist()
    cells.write.format("noop").mode("overwrite").save()
    t_build = time.time() - t0
    t0 = time.time()
    ivf_p = ivf_topk(
        corpus,
        queries,
        k=K,
        n_cells=N_CLUSTERS,
        n_probe=8,
        centroids=cents,
        corpus_cells=cells,
    ).persist()
    ivf_p.write.format("noop").mode("overwrite").save()
    t_search = time.time() - t0
    print(
        f"ivf index build (arrow assign): {t_build:.2f}s; "
        f"search w/ prebuilt index: {t_search:.2f}s  "
        f"recall@{K}={recall(ivf_p, exact):.3f}"
    )

    t0 = time.time()
    bm = brute_force_topk_matmul(corpus, queries, k=K).persist()
    bm.write.format("noop").mode("overwrite").save()
    t_bm = time.time() - t0
    print(
        f"brute_matmul:     {t_bm:.2f}s "
        f"({n * n_q / t_bm / 1e6:.1f}M pair-scores/s)  "
        f"recall@{K}={recall(bm, exact):.3f}"
    )

    from ncagg_spark.pipeline.pq import pq_encode, pq_topk, pq_topk_rerank  # noqa: E501

    t0 = time.time()
    books = pq_train(corpus, dim=DIM, m=8, n_codes=64)
    t_train = time.time() - t0
    t0 = time.time()
    codes = pq_encode(corpus, books).persist()
    codes.write.format("noop").mode("overwrite").save()
    t_enc = time.time() - t0
    t0 = time.time()
    adc = pq_topk(codes, books, queries, k=K).persist()
    adc.write.format("noop").mode("overwrite").save()
    t_adc = time.time() - t0
    # this corpus is adversarial for ANY quantizer: each query's true
    # top-5 are 5 of ~780 near-identical same-cluster members, so ADC
    # distances tie across the whole cluster and top-5-of-ties is
    # arbitrary. The production answer is an ambiguity-wide rerank:
    # fetch ~1000 candidates (still 0.5% of the corpus) and let exact
    # math order them.
    t0 = time.time()
    rer = pq_topk_rerank(
        codes, books, corpus, queries, k=K, expand=200
    ).persist()
    rer.write.format("noop").mode("overwrite").save()
    t_rer = time.time() - t0
    print(
        f"pq: train {t_train:.2f}s, encode {t_enc:.2f}s "
        f"(32x compressed index); adc search {t_adc:.2f}s "
        f"recall@{K}={recall(adc, exact):.3f} (tie-collapsed); "
        f"+exact rerank of 1000 cands {t_rer:.2f}s "
        f"recall@{K}={recall(rer, exact):.3f}"
    )


if __name__ == "__main__":
    main()
