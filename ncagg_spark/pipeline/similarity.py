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

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.vectors import dot, dot_const_sql, l2_norm


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
    # norms computed ONCE per row on each join side (join inputs are
    # materialization points — per-pair work is then a single dot+divide,
    # not three array reductions)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
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


def srp_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit i = sign(vec . plane_i).

    Rendered as ONE SQL expression (dot_const_sql): the n_planes constant
    dots would otherwise cost ~20ms of py4j lambda plumbing each at
    plan-build time, per call site.
    """
    terms = [
        f"(CASE WHEN {dot_const_sql(vec_col, plane)} > 0.0D"
        f" THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, plane in enumerate(planes)
    ]
    return F.expr("CAST(0 AS BIGINT) + " + " + ".join(terms))


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
        l2_norm(vec_col).alias("c_norm"),
        srp_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
        srp_bucket(vec_col, planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
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

    Two norm eliminations: centroids are unit-scaled DRIVER-SIDE (their
    norms are constants), and the row's own norm divides every candidate
    equally so it cannot change the argmax — assignment reduces to argmax
    over plain dot products, no norms evaluated at all.

    argmax via array_max over (score, cell) structs — linear expression
    size; a nested when-chain would duplicate subtrees exponentially.
    Rendered as one SQL expression (see dot_const_sql).
    """
    entries = ",".join(
        f"named_struct('s', {dot_const_sql(vec_col, _unit_scale(vec))},"
        f" 'c', CAST({int(cell_id)} AS INT))"
        for cell_id, vec in centroids
    )
    return df.withColumn(out_col, F.expr(f"array_max(array({entries})).c"))


def _unit_scale(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0
    return [float(x) / n for x in vec]


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
    init: str = "xxhash",
    update_quantization: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd's) for IVF centroid training
    — the "real centroids at 100 TB" path SCALE.md calls for.

    Each iteration is fully distributed: assignment reuses
    ``assign_cells`` (broadcast unit centroids, argmax of constant-folded
    dots — no Python in the hot path), and the update step is a
    posexplode → groupBy(cell, pos) partial-aggregated sum, collecting
    only n_cells × dim numbers to the driver. Init picks the n_cells
    vectors with the smallest hash of their id — deterministic and
    uniformly spread without a data-dependent pass. ``init="xxhash"``
    uses Spark's seeded xxhash64; ``init="mult"`` uses a Knuth
    multiplicative hash ``(id * 2654435761) % 2^32`` that any SQL engine
    can replicate bit-exactly (ids must stay < ~3.5e9 or the ANSI-mode
    product overflows — fine for cell TRAINING, which runs on a sample
    at 100 TB anyway).

    ``update_quantization=q`` makes the update step sum
    ``floor(component * q)`` as integers instead of raw doubles. Integer
    addition is associative, so the trained centroids become bit-exact
    regardless of partitioning, cluster size, or engine — run-to-run
    deterministic training (and oracle-checkable) at a quantization error
    of 1/q, far below any clustering-quality threshold for q >= 1e6.

    Stops when every centroid moves less than ``tol`` in cosine distance
    (or after ``max_iter``; set ``tol=0.0`` to always run exactly
    ``max_iter`` iterations — required for cross-engine replication).
    Empty cells keep their previous centroid. Returns unit-scaled
    (cell_id, vector) pairs ready for ``ivf_topk``.
    """
    if init == "xxhash":
        init_key = F.abs(F.xxhash64(F.col(id_col), F.lit(seed)))
    elif init == "mult":
        init_key = (F.col(id_col) * F.lit(2654435761)) % F.lit(4294967296)
    else:
        raise ValueError(f"unknown init: {init!r}")
    init_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(init_key.asc(), F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    cents = [
        (i, _unit_scale([float(x) for x in r[vec_col]]))
        for i, r in enumerate(init_rows)
    ]
    for _ in range(max_iter):
        assigned = assign_cells(
            corpus.select(F.col(vec_col).alias("v")), cents, vec_col="v"
        )
        # component sums only — spherical update unit-scales the mean, so
        # the member count cancels and never needs to be aggregated
        comp = (
            F.floor(F.col("x").cast("double") * F.lit(update_quantization))
            if update_quantization
            else F.col("x")
        )
        stats = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum(comp).alias("s"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in stats:
            acc.setdefault(r["cell"], {})[r["pos"]] = float(r["s"])
        new_cents: list[tuple[int, list[float]]] = []
        moved = 0.0
        for cell_id, old in cents:
            comp = acc.get(cell_id)
            if not comp:
                new_cents.append((cell_id, old))  # empty cell: keep
                continue
            vec = _unit_scale([comp[p] for p in sorted(comp)])
            moved = max(
                moved, 1.0 - sum(a * b for a, b in zip(old, vec))
            )
            new_cents.append((cell_id, vec))
        cents = new_cents
        if moved < tol:
            break
    return cents


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
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            l2_norm(vec_col).alias("c_norm"),
        ),
        cents,
        vec_col="c_vec",
        out_col="cell",
    )
    # query probes: rank centroids per query, keep n_probe. Same norm
    # eliminations as assign_cells — ranking by dot against unit centroids.
    # One SQL expression end-to-end (sort comparator: score desc, ties
    # keep centroid order — array_sort is stable).
    entries = ",".join(
        f"named_struct('s', {dot_const_sql(vec_col, _unit_scale(vec))},"
        f" 'c', CAST({int(cell_id)} AS INT))"
        for cell_id, vec in cents
    )
    probe_cells = (
        f"slice(array_sort(array({entries}), (a, b) -> "
        "CASE WHEN a.s > b.s THEN -1 WHEN a.s < b.s THEN 1 ELSE 0 END), "
        f"1, {int(n_probe)})"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
        F.explode(F.expr(f"transform({probe_cells}, p -> p.c)")).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
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
