"""Product quantization: codebook training determinism, encode
compression shape, and ADC search recall against the exact result."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ncagg_spark.pipeline.pq import (
    pq_encode,
    pq_topk,
    pq_topk_relational,
    pq_topk_rerank,
    pq_train,
)
from ncagg_spark.pipeline.similarity import brute_force_topk

DIM = 16
N = 400
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def clustered(spark):
    rng = random.Random(3)
    centers = [
        [rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_CLUSTERS)
    ]
    rows = [
        (
            i,
            [
                c + rng.gauss(0.0, 0.08)
                for c in centers[i % N_CLUSTERS]
            ],
        )
        for i in range(N)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pq_train_deterministic(clustered):
    _, df = clustered
    a = pq_train(df, dim=DIM, m=4, n_codes=8)
    b = pq_train(df.repartition(16, "vec_id"), dim=DIM, m=4, n_codes=8)
    assert a == b  # exact float equality across partitionings


def test_pq_encode_shape_and_determinism(clustered):
    _, df = clustered
    books = pq_train(df, dim=DIM, m=4, n_codes=8)
    codes = pq_encode(df, books)
    got = codes.orderBy("vec_id").collect()
    assert len(got) == N
    assert all(len(r["codes"]) == 4 for r in got)
    assert all(0 <= c < 8 for r in got for c in r["codes"])
    again = pq_encode(df.repartition(8), books).orderBy("vec_id").collect()
    assert [r["codes"] for r in got] == [r["codes"] for r in again]


def test_pq_topk_recall_on_clustered_data(clustered):
    rows, df = clustered
    books = pq_train(df, dim=DIM, m=8, n_codes=64)
    codes = pq_encode(df, books)
    queries = df.filter("vec_id < 10")
    exact = brute_force_topk(df, queries, k=5).collect()
    approx = pq_topk(codes, books, queries, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for r in approx:
        tot += 1
        if r["neighbor_id"] in exact_sets[r["query_id"]]:
            hit += 1
    assert tot == 50
    # ADC-only recall: modest by design on near-identical cluster
    # members (quantized distances tie); re-rank is the recovery path
    assert hit / tot >= 0.5, f"recall {hit/tot:.2f}"
    # approx cosine within quantization error of the truth for hits
    approx_map = {
        (r["query_id"], r["neighbor_id"]): r["approx_cosine"]
        for r in approx
    }
    for r in exact:
        key = (r["query_id"], r["neighbor_id"])
        if key in approx_map:
            assert abs(approx_map[key] - r["cosine"]) < 0.2


def test_pq_rerank_recovers_exact_ranking(clustered):
    """ADC candidates + exact re-rank: the production design must reach
    near-exact recall even where quantized distances tie."""
    rows, df = clustered
    books = pq_train(df, dim=DIM, m=8, n_codes=64)
    codes = pq_encode(df, books)
    queries = df.filter("vec_id < 10")
    exact = brute_force_topk(df, queries, k=5).collect()
    rer = pq_topk_rerank(codes, books, df, queries, k=5, expand=6).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(1 for r in rer if r["neighbor_id"] in es[r["query_id"]])
    assert len(rer) == 50
    assert hit / len(rer) >= 0.9, f"recall {hit/len(rer):.2f}"
    # re-ranked cosines are EXACT (same rounding as brute force)
    exact_map = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in rer:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_map:
            assert r["cosine"] == exact_map[key]


def test_pq_relational_matches_production_semantics(clustered):
    """The oracle-parity relational PQ (anchor codebooks, expression-only
    encode/ADC/rerank) returns exactly k rows per query with exact
    reranked cosines, is deterministic under repartitioning, and reaches
    the same recall bar as the production rerank path."""
    rows, df = clustered
    queries = df.filter("vec_id < 10")
    got = pq_topk_relational(
        df, queries, dim=DIM, m=4, n_codes=16, k=5, expand=10
    ).collect()
    assert len(got) == 50
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 5 for v in per_q.values())
    assert all(
        sorted(r["rank"] for r in v) == [1, 2, 3, 4, 5]
        for v in per_q.values()
    )

    exact = brute_force_topk(df, queries, k=5).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(1 for r in got if r["neighbor_id"] in es[r["query_id"]])
    assert hit / len(got) >= 0.9, f"recall {hit/len(got):.2f}"
    exact_map = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_map:
            assert r["cosine"] == exact_map[key]

    again = pq_topk_relational(
        df.repartition(16, "vec_id"), queries, dim=DIM, m=4, n_codes=16,
        k=5, expand=10,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_ivf_pq_relational_recall_and_determinism(clustered):
    """IVFADC oracle-parity form: exactly k rows per query, exact
    reranked cosines, recall >= the flat-PQ bar on clustered data, and
    bit-identical results under repartitioning."""
    rows, df = clustered
    queries = df.filter("vec_id < 10")
    from ncagg_spark.pipeline.pq import ivf_pq_topk_relational

    got = ivf_pq_topk_relational(
        df, queries, dim=DIM, m=4, n_codes=16, n_cells=16, n_probe=6,
        k=5, expand=10,
    ).collect()
    assert len(got) == 50
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 5 for v in per_q.values())

    exact = brute_force_topk(df, queries, k=5).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(1 for r in got if r["neighbor_id"] in es[r["query_id"]])
    # clustered corpus + 6/16 cells probed: the query's own cluster is
    # always probed, so recall should be near-exact after the re-rank
    assert hit / len(got) >= 0.8, f"recall {hit/len(got):.2f}"
    exact_map = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_map:
            assert r["cosine"] == exact_map[key]

    again = ivf_pq_topk_relational(
        df.repartition(16, "vec_id"), queries, dim=DIM, m=4, n_codes=16,
        n_cells=16, n_probe=6, k=5, expand=10,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_ivf_pq_production_index_and_search(clustered):
    """The Arrow production path: one-pass index build (cell + codes),
    probe-masked ADC, exact re-rank. Deterministic under repartitioning;
    recall floor vs brute force; scan provably restricted to probed
    cells."""
    rows, df = clustered
    queries = df.filter("vec_id < 10")
    from ncagg_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk
    from ncagg_spark.pipeline.similarity import kmeans_centroids

    cents = kmeans_centroids(df, 16, vec_col="embedding", max_iter=3)
    books = pq_train(df, dim=DIM, m=8, n_codes=64)
    index = build_ivf_pq_index(df, cents, books)
    got_idx = index.orderBy("vec_id").collect()
    assert len(got_idx) == N
    assert all(len(r["codes"]) == 8 for r in got_idx)
    again_idx = (
        build_ivf_pq_index(df.repartition(8), cents, books)
        .orderBy("vec_id")
        .collect()
    )
    assert [tuple(r) for r in got_idx] == [tuple(r) for r in again_idx]

    res = ivf_pq_topk(
        index, cents, books, df, queries, k=5, expand=6, n_probe=6
    ).collect()
    assert len(res) == 50
    exact = brute_force_topk(df, queries, k=5).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(1 for r in res if r["neighbor_id"] in es[r["query_id"]])
    assert hit / len(res) >= 0.8, f"recall {hit/len(res):.2f}"
    # re-ranked cosines are EXACT for true neighbors
    exact_map = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in res:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_map:
            assert r["cosine"] == exact_map[key]

    # the ADC scan is restricted to probed cells: with n_probe = all
    # cells the result must dominate, with n_probe=1 it may not — but
    # every returned neighbor must live in a cell probed by its query
    cell_of = {r["vec_id"]: r["cell"] for r in got_idx}
    import numpy as np

    from ncagg_spark.pipeline.similarity import _unit_scale

    Cu = np.array(
        [_unit_scale(v) for _, v in sorted(cents, key=lambda c: c[0])]
    ).T
    cids = np.array([c for c, _ in sorted(cents, key=lambda c: c[0])])
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in queries.collect()}
    for r in res:
        qv = np.asarray(qvecs[r["query_id"]], dtype="float64")
        order = np.argsort(-(qv @ Cu), kind="stable")[:6]
        assert cell_of[r["neighbor_id"]] in set(cids[order])


def test_ivf_pq_adc_modes_agree(clustered):
    """masked vs grouped ADC are two compute shapes of the SAME search:
    identical results bit-for-bit (same LUT sums, same tiebreaks)."""
    rows, df = clustered
    queries = df.filter("vec_id < 10")
    from ncagg_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk
    from ncagg_spark.pipeline.similarity import sample_centroids

    cents = sample_centroids(df, 16)
    books = pq_train(df, dim=DIM, m=8, n_codes=64)
    index = build_ivf_pq_index(df, cents, books)
    a = ivf_pq_topk(
        index, cents, books, df, queries, k=5, expand=6, n_probe=6,
        adc_mode="masked",
    ).collect()
    b = ivf_pq_topk(
        index, cents, books, df, queries, k=5, expand=6, n_probe=6,
        adc_mode="grouped",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_pq_truncation_deterministic_under_ties(spark):
    """Round-10 review fix: ADC candidate truncation breaks distance
    ties by neighbor id, so results cannot depend on row order or
    partitioning. Adversarial fixture: many EXACT duplicate vectors
    (identical PQ codes -> bit-equal ADC distances) far exceeding the
    k*expand take boundary."""
    import random

    from ncagg_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk
    from ncagg_spark.pipeline.similarity import sample_centroids

    rng = random.Random(11)
    base = [[rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(4)]
    # 50 exact replicas of each of 4 base vectors -> any top-k*expand
    # cut must choose among bit-identical distances
    rows = [
        (i, [x for x in base[i % 4]]) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = df.filter("vec_id < 4")
    cents = sample_centroids(df, 4)
    books = pq_train(df, dim=DIM, m=4, n_codes=8)
    index = build_ivf_pq_index(df, cents, books)
    got = {}
    for parts in (1, 7, 32):
        idx_p = index.repartition(parts)
        for mode in ("masked", "grouped"):
            res = ivf_pq_topk(
                idx_p, cents, books, df, queries,
                k=5, expand=2, n_probe=2, adc_mode=mode,
            ).collect()
            got[(parts, mode)] = sorted(map(tuple, res))
    first = next(iter(got.values()))
    assert all(v == first for v in got.values()), {
        k: len(v) for k, v in got.items()
    }
    # ties resolved toward smaller neighbor ids: each query's ADC
    # candidates are id-minimal among its duplicates, so the final
    # top-5 for query 0 are the 5 smallest ids of its replica class
    per_q0 = [r for r in first if r[0] == 0]
    assert [r[1] for r in sorted(per_q0, key=lambda r: r[2])] == [
        4, 8, 12, 16, 20
    ]


def test_topk_ties_by_id_fast_path_matches_spec():
    """Round-11 ADVICE: the threshold-subset fast path (O(n) partition
    + tiny tie-break sorts) must equal the naive two-full-stable-sort
    spec on every shape — real boundary ties, inf-masked rows, string
    ids, take edge cases, and the optional hoisted pre-sort."""
    import numpy as np

    from ncagg_spark.pipeline.pq import _topk_ties_by_id

    def spec(key, nids, take):
        pre = np.argsort(nids, kind="stable")
        return pre[np.argsort(key[pre], kind="stable")][:take]

    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 500))
        # coarse quantization -> plenty of REAL key ties
        key = np.floor(rng.random(n) * 10)
        key[rng.integers(0, n, size=n // 4)] = np.inf  # masked rows
        nids = rng.permutation(n).astype("int64")
        for take in (0, 1, 3, n // 2, n, n + 5):
            want = spec(key, nids, min(take, n))
            got = _topk_ties_by_id(key, nids, take)
            assert np.array_equal(got, want), (trial, take)
            pre = np.argsort(nids, kind="stable")
            got_pre = _topk_ties_by_id(key, nids, take, pre=pre)
            assert np.array_equal(got_pre, want), (trial, take, "pre")
    # string neighbor ids (documents table) sort lexically
    key = np.array([1.0, 1.0, 0.5, 1.0, 2.0])
    nids = np.array(["d9", "d1", "d5", "d10", "d0"])
    got = _topk_ties_by_id(key, nids, 3)
    assert nids[got].tolist() == ["d5", "d1", "d10"]
