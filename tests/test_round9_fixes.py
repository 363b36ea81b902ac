"""Round-9 fixes: ADVICE r8 items (symlink-cycle guard in
_local_input_bytes, oracle-watchdog race, export-drain coalesce bound)
and the aggregate-canon machinery (VERDICT r8 #1) — the order-independent
in-engine fingerprint that replaces driver collect for huge result sets.
"""

from __future__ import annotations

import os
import struct
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import (  # noqa: E402
    _double_bits,
    duck_canon_agg,
    spark_canon_agg,
)

from ncagg_spark.api import _local_input_bytes  # noqa: E402


def test_local_input_bytes_symlink_cycle(tmp_path):
    # a directory containing a symlink to its own parent previously made
    # the walk loop forever (ADVICE r8); now it bails to the parallel
    # path (None) on the first directory revisit
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.nc").write_bytes(b"x" * 10)
    (d / "loop").symlink_to(tmp_path)
    assert _local_input_bytes([str(tmp_path)]) is None


def test_local_input_bytes_plain_dir(tmp_path):
    (tmp_path / "a.nc").write_bytes(b"x" * 10)
    (tmp_path / "b.nc").write_bytes(b"y" * 5)
    assert _local_input_bytes([str(tmp_path)]) == 15


def test_double_bits_matches_java_doubleToLongBits():
    # signed int64 view, canonical NaN, -0.0 distinct from 0.0
    assert _double_bits(None) is None
    assert _double_bits(0.0) == 0
    assert _double_bits(-0.0) == -(1 << 63)
    assert _double_bits(float("nan")) == 0x7FF8000000000000
    assert _double_bits(0.1) == 4591870180066957722
    assert _double_bits(5e-324) == 1
    assert _double_bits(float("inf")) == struct.unpack(
        "<q", struct.pack("<d", float("inf"))
    )[0]


def test_double_bits_matches_spark_reflect(spark):
    import random

    random.seed(99)
    vals = [0.0, -0.0, 0.1, 5e-324, 1e300, 1 / 3, float("inf"),
            float("-inf")]
    for _ in range(500):
        b = random.getrandbits(64)
        x = struct.unpack("<d", struct.pack("<Q", b))[0]
        vals.append(x)
    sdf = spark.createDataFrame(
        [(repr(v),) for v in vals], "r string"
    ).selectExpr(
        "cast(r as double) as x"  # round-trips exactly (shortest repr)
    )
    got = [
        r["s"]
        for r in sdf.selectExpr(
            "reflect('java.lang.Double', 'doubleToLongBits', x) as s"
        ).collect()
    ]
    for v, g in zip(vals, got):
        # Spark parses 'nan'/'inf' spellings; reflect canonicalizes NaN
        assert _double_bits(float(v)) == int(g), v


def test_aggregate_canon_cross_engine_all_types(spark):
    """End-to-end pin on a crafted frame covering every supported type,
    incl. the adversarial cases: NaN, -0.0, nulls, null-vs-empty string,
    sub-second timestamps, negative decimals. Spark and DuckDB must
    produce the IDENTICAL (count, hash-sum, hash-xor) fingerprint."""
    rows = [
        (1, 0.1, "alpha", True, "2021-01-02", "2021-01-02 03:04:05.123456",
         "12.50"),
        (2, float("nan"), "", False, "1999-12-31", "2021-01-02 03:04:05",
         "-0.01"),
        (3, -0.0, None, None, None, None, None),
        (None, None, "x\x1fy", True, "2021-01-02", "2021-01-02 03:04:05",
         "0.00"),
    ]
    sdf = spark.createDataFrame(
        rows,
        "k long, v double, s string, b boolean, d string, t string, "
        "m string",
    ).selectExpr(
        "k",
        "v",
        "s",
        "b",
        "cast(d as date) as d",
        "cast(t as timestamp) as t",
        "cast(m as decimal(12,2)) as m",
    )
    con = duckdb.connect()
    # literal SQL (a pandas round-trip would corrupt types: a None in a
    # long column becomes float64)
    oracle = """
      SELECT 1::BIGINT k, 0.1::DOUBLE v, 'alpha' s, true b,
             DATE '2021-01-02' d,
             TIMESTAMP '2021-01-02 03:04:05.123456' t,
             12.50::DECIMAL(12,2) m
      UNION ALL SELECT 2, 'nan'::DOUBLE, '', false, DATE '1999-12-31',
             TIMESTAMP '2021-01-02 03:04:05', -0.01::DECIMAL(12,2)
      UNION ALL SELECT 3, -0.0::DOUBLE, NULL, NULL, NULL, NULL, NULL
      UNION ALL SELECT NULL, NULL, 'x' || chr(31) || 'y', true,
             DATE '2021-01-02', TIMESTAMP '2021-01-02 03:04:05',
             0.00::DECIMAL(12,2)
    """
    s_fp = spark_canon_agg(sdf)
    d_fp, d_names = duck_canon_agg(con, oracle)
    assert d_names == sorted(sdf.columns)
    assert s_fp == d_fp
    assert s_fp[0] == 4


def test_aggregate_canon_detects_value_divergence(spark):
    sdf = spark.createDataFrame([(1, 2.5), (2, 3.5)], "k long, v double")
    con = duckdb.connect()
    # explicit casts: a bare DuckDB 2.5 literal is DECIMAL, not DOUBLE
    oracle_same = (
        "SELECT k::BIGINT k, v::DOUBLE v "
        "FROM (VALUES (1, 2.5), (2, 3.5)) t(k, v)"
    )
    oracle_diff = (
        "SELECT k::BIGINT k, v::DOUBLE v "
        "FROM (VALUES (1, 2.5), (2, 3.5000000001)) t(k, v)"
    )
    s_fp = spark_canon_agg(sdf)
    same_fp, _ = duck_canon_agg(con, oracle_same)
    diff_fp, _ = duck_canon_agg(con, oracle_diff)
    assert s_fp == same_fp
    assert s_fp != diff_fp


def test_aggregate_canon_order_independent(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, s string")
    b = a.orderBy("s", ascending=False).repartition(3)
    assert spark_canon_agg(a) == spark_canon_agg(b)


def test_aggregate_canon_empty_result(spark):
    sdf = spark.createDataFrame([], "k long, v double")
    con = duckdb.connect()
    s_fp = spark_canon_agg(sdf)
    d_fp, _ = duck_canon_agg(
        con, "SELECT 1::BIGINT k, 2.5::DOUBLE v WHERE false"
    )
    assert s_fp == d_fp == (0, None, None)


def test_oracle_watchdog_does_not_interrupt_next_query():
    """ADVICE r8: after a budgeted oracle finishes, the still-pending
    timer must NOT interrupt the shared connection (it used to kill the
    NEXT oracle). Run a fast query under a tiny-but-sufficient budget,
    then immediately a slow-ish one unbudgeted — it must complete."""
    from check_oracle import _run_oracle_budgeted

    con = duckdb.connect()
    out = _run_oracle_budgeted(con, "SELECT 1 AS x", 0.5)
    assert out["x"][0] == 1
    import time

    time.sleep(0.6)  # let the stale timer fire (pre-fix it interrupts)
    out2 = con.execute(
        "SELECT count(*) c FROM range(2000000)"
    ).df()
    assert out2["c"][0] == 2000000


def test_min_label_propagation_matches_union_find():
    """The vectorized CC verifier (used at sf10 graph sizes) must agree
    with the per-edge union-find on random graphs of varying density."""
    import random

    import numpy as np

    from tools.verify_cc import min_label_propagation, union_find_min_labels

    rng = random.Random(7)
    for trial in range(6):
        n = rng.choice([10, 100, 1000])
        m = rng.choice([n // 2, n, 3 * n])
        # sparse ids (not 0..n-1) to exercise the id<->index mapping
        nodes = rng.sample(range(10 * n), n)
        pairs = np.array(
            [
                sorted((rng.choice(nodes), rng.choice(nodes)))
                for _ in range(m)
            ],
            dtype=np.int64,
        )
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        if not len(pairs):
            continue
        assert min_label_propagation(pairs) == union_find_min_labels(pairs)


def test_min_label_propagation_chain_and_star():
    import numpy as np

    from tools.verify_cc import min_label_propagation

    # long chain: worst case for naive propagation (needs pointer jumps)
    chain = np.array([[i, i + 1] for i in range(100, 200)], dtype=np.int64)
    labels = min_label_propagation(chain)
    assert set(labels.values()) == {100}
    star = np.array([[500, k] for k in range(501, 520)], dtype=np.int64)
    labels = min_label_propagation(star)
    assert set(labels.values()) == {500}
