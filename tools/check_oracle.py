"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet views, and compares
row count + column names + sorted values. Floats compare exactly first,
then with 1e-9 relative tolerance (reported separately so hash-risk is
visible).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

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


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
        )
    # reorder both to sorted column order, then sort rows
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = sorted(
        [tuple(norm_cell(r[i]) for i in s_idx) for r in spark_rows], key=sort_key
    )
    d = sorted(
        [tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows], key=sort_key
    )
    n_exact = n_close = n_diff = 0
    for sr, dr in zip(s, d):
        if sr == dr:
            n_exact += 1
            continue
        close = True
        for a, b in zip(sr, dr):
            if a == b:
                continue
            if (
                isinstance(a, float)
                and isinstance(b, float)
                and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
            ):
                continue
            close = False
            break
        if close:
            n_close += 1
        else:
            n_diff += 1
            if n_diff <= 3:
                problems.append(f"  row diff:\n    spark={sr}\n    duck ={dr}")
    if n_close:
        problems.append(f"{n_close} rows only float-close (HASH RISK)")
    if n_diff:
        problems.append(f"{n_diff} rows materially differ")
    return problems


def main():
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
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

        spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"----  {name}: no oracle (rows-only): {len(spark_rows)} rows "
                f"[{time.time()-t0:.1f}s]"
            )
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({len(spark_rows)} rows) [{dt:.1f}s]")
            for p in problems:
                print("   ", p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows) [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
