"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet views, and compares
row count + column names + a **driver-faithful canonical hash**.

The driver's gate (reconstructed from its recorded tracebacks in
CORRECTNESS_r0*.json) materializes both result sets as pandas frames,
reorders columns by sorted name, `sort_values` over ALL columns, then
hashes the *rendered* values. Two consequences this checker now
replicates exactly — both bit us in rounds 1-2 while the old tolerant
comparison stayed green:

1. list/array cells make `sort_values` raise `TypeError: unhashable
   type: 'list'` (r1 `doc_minhash_sig`, r2 `mm_features`) — so ANY query
   whose Spark output schema contains an array/map column is a hard FAIL
   here, oracle or not.
2. the hash is dtype-RENDERING sensitive: DuckDB `sum(BIGINT)` returns
   HUGEINT which pandas renders as float64 (`100000.0`) while Spark's
   bigint renders `100000` — equal values, different hash (r2
   `agg_manifest_attrs`). Canon-hashing the pandas-rendered CSV of both
   sides surfaces every representation divergence.

A secondary tolerant value-diff (float rel_tol 1e-9) still runs when the
hash differs, so the report says whether a hash mismatch is real values
or representation only.

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--vanilla]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization, reconstructed: sorted column order,
    full-row sort_values (raises on unhashable cells — intentionally
    replicated), positional index."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def canon_hash(pdf: pd.DataFrame) -> str:
    """Hash of the pandas-RENDERED values — any dtype-representation
    divergence (HUGEINT->float64, decimal->object, float32 vs float64
    repr) changes the hash even when values are numerically equal."""
    return hashlib.sha256(
        pdf.to_csv(index=False, float_format=None).encode()
    ).hexdigest()


def _has_nested(sdf) -> list[str]:
    from pyspark.sql import types as T

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def value_diff(spark_rows, spark_cols, duck_rows, duck_cols):
    """Tolerant secondary diff: separates 'values genuinely differ' from
    'representation-only hash divergence'."""
    problems = []
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = sorted(
        [tuple(norm_cell(r[i]) for i in s_idx) for r in spark_rows], key=sort_key
    )
    d = sorted(
        [tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows], key=sort_key
    )
    n_close = n_diff = 0
    for sr, dr in zip(s, d):
        if sr == dr:
            continue
        close = True
        for a, b in zip(sr, dr):
            if a == b:
                continue
            try:
                fa, fb = float(a), float(b)
            except (TypeError, ValueError):
                close = False
                break
            if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
                close = False
                break
        if close:
            n_close += 1
        else:
            n_diff += 1
            if n_diff <= 3:
                problems.append(f"  row diff:\n    spark={sr}\n    duck ={dr}")
    if n_close:
        problems.append(f"{n_close} rows numerically close but rendered differently")
    if n_diff:
        problems.append(f"{n_diff} rows materially differ")
    return problems


def _run_oracle_budgeted(con, oracle, budget_sec):
    """Execute the oracle with a wall-clock budget: a watchdog thread
    calls con.interrupt() at the deadline, so a DuckDB oracle that
    cannot finish at this scale surfaces as a measured BUDGET exclusion
    (with its cost), not a hang. budget_sec=None runs unbudgeted."""
    if budget_sec is None:
        return oracle(con) if callable(oracle) else con.execute(oracle).df()
    import threading

    fired = threading.Event()

    def _kill():
        fired.set()
        try:
            con.interrupt()
        except Exception:
            pass

    timer = threading.Timer(budget_sec, _kill)
    timer.start()
    try:
        return oracle(con) if callable(oracle) else con.execute(oracle).df()
    except Exception:
        if fired.is_set():
            raise TimeoutError(
                f"oracle exceeded the {budget_sec:.0f}s budget"
            )
        raise
    finally:
        timer.cancel()


def check_one(name, sdf, con, oracle, budget_sec=None):
    """Returns (status, messages).
    status in PASS | ROWS_ONLY | BUDGET | FAIL."""
    msgs = []
    nested = _has_nested(sdf)
    if nested:
        return "FAIL", [
            f"output schema has nested column(s) {nested}: the driver's "
            "pandas canonicalizer cannot sort/hash list cells "
            "(TypeError: unhashable type) — explode to scalar rows"
        ]
    try:
        spdf = sdf.toPandas()
    except Exception as e:
        return "FAIL", [f"spark collect error: {e}"]
    try:
        s_canon = _canon(spdf)
    except Exception as e:
        return "FAIL", [f"driver canon would die on spark result: {e!r}"]
    if oracle is None:
        return "ROWS_ONLY", [f"{len(spdf)} rows; canon ok"]
    try:
        # oracle is either an SQL string or a callable(con) -> pandas
        # frame (the iterative temp-table oracles under --iter-cc)
        dpdf = _run_oracle_budgeted(con, oracle, budget_sec)
    except TimeoutError as e:
        return "BUDGET", [f"{e}; engine result: {len(spdf)} rows, canon ok"]
    except Exception as e:
        return "FAIL", [f"duckdb error: {e}"]
    if sorted(spdf.columns) != sorted(dpdf.columns):
        return "FAIL", [
            f"columns differ: spark={list(spdf.columns)} duck={list(dpdf.columns)}"
        ]
    if len(spdf) != len(dpdf):
        msgs.append(f"row count differs: spark={len(spdf)} duck={len(dpdf)}")
    try:
        d_canon = _canon(dpdf)
    except Exception as e:
        return "FAIL", [f"driver canon would die on oracle result: {e!r}"]
    sh, dh = canon_hash(s_canon), canon_hash(d_canon)
    if sh != dh:
        msgs.append("canon hash MISMATCH (driver would record hash_match=false)")
        for col in s_canon.columns:
            if str(s_canon[col].dtype) != str(d_canon[col].dtype):
                msgs.append(
                    f"  dtype diverges on '{col}': spark={s_canon[col].dtype} "
                    f"duck={d_canon[col].dtype}"
                )
        s_rows = [tuple(r) for r in spdf.itertuples(index=False)]
        d_rows = [tuple(r) for r in dpdf.itertuples(index=False)]
        msgs.extend(
            value_diff(s_rows, list(spdf.columns), d_rows, list(dpdf.columns))
        )
        return "FAIL", msgs
    if msgs:
        return "FAIL", msgs
    return "PASS", [f"{len(spdf)} rows"]


def main():
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    vanilla = "--vanilla" in flags
    iter_cc = "--iter-cc" in flags
    budget = None
    for a in flags:
        if a.startswith("--oracle-budget="):
            budget = float(a.split("=", 1)[1])
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod

    if vanilla:
        # reproduce the driver's environment: a bare session with NONE of
        # the engine's conf (round-1 failure mode: queries that only ran
        # under get_spark()'s settings)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        from ncagg_spark.session import get_spark

        # scale-mode runs (an --oracle-budget is set) collect multi-GiB
        # result sets for the comparison itself — that is gate-harness
        # cost, not engine cost; lift the driver collect cap so a
        # legitimately large sf10 result doesn't read as a FAIL
        extra = (
            {"spark.driver.maxResultSize": "8g"}
            if budget is not None
            else None
        )
        spark = get_spark(app_name="oracle-check", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if iter_cc:
        # substitute the recursive-CTE CC oracles (DNF at sf1.0's
        # 12.4M-edge graph) with the iterative temp-table label
        # propagation — still computed entirely by DuckDB
        from tools.cc_oracle_duckdb import ITER_CC_ORACLES

        oracles.update(ITER_CC_ORACLES)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: spark build error: {e}")
            n_fail += 1
            continue
        status, msgs = check_one(
            name, sdf, con, oracles.get(name), budget_sec=budget
        )
        dt = time.time() - t0
        if status == "FAIL":
            print(f"FAIL {name} [{dt:.1f}s]")
            for m in msgs:
                print("   ", m)
            n_fail += 1
        elif status == "BUDGET":
            print(f"BDGT {name}: {'; '.join(msgs)} [{dt:.1f}s]")
        elif status == "ROWS_ONLY":
            print(f"----  {name}: rows-only: {'; '.join(msgs)} [{dt:.1f}s]")
        else:
            print(f"PASS {name} ({'; '.join(msgs)}) [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
