"""Derive a larger scale factor from the driver's sf0.1 tables by
deterministic k-fold replication — the sf1.0 scale-ramp input
(VERDICT r5 #2). NOT a new synthetic generator: every replica is the
driver's own data with keys shifted (FK-consistent), so per-row
distributions are exactly preserved while volume scales by k.

Per-table treatment (replica r in 0..k-1):
  * region / nation: fixed dimensions, copied once (as in TPC-H, where
    they are constant across SF).
  * customer/supplier/part/orders/lineitem: every key column shifted by
    r * (max_key + 1) of its table, consistently across FK pairs — joins
    produce exactly k x the rows, never cross-replica matches.
  * events: event_id/user_id shifted; ts jittered +r*73 us (well under
    the 1 s cadence) — the same day becomes k x denser, which is how a
    fixed-window regularization actually scales (more input per slot,
    same output grid).
  * documents: doc_id shifted; replica > 0 texts get a deterministic
    TOKEN-LEVEL perturbation (VERDICT r8 #2): each token whose
    hash(token, r) lands in a per-replica ~50% vocabulary subset is
    tagged with a '~<r>' suffix. Content-based (not position-based)
    tagging means two near-dup docs transform identically token-for-
    token regardless of insert/delete alignment shifts — every replica
    keeps the driver's full dup/near-dup structure EXACTLY — while a
    cross-replica 20-token shared span survives only with probability
    (1/4)^20 ~= 1e-12 between two TAGGED replicas (both must leave all
    20 tokens untagged) and (1/2)^20 ~= 1e-6 against the untagged
    replica 0 — at sf10 a residual O(100) replica-0 span matches
    survive out of ~10^8 windows, i.e. a ~1e-4 fraction of docs; the
    corpus no longer drains. Cross-replica shingle Jaccard collapses
    to ~0 in both cases (a 5-token shingle survives with p 0.03-0.17). The old ' rep<r>' tail suffix left replicas near-duplicates
    of each other, so at k=100 the span gate legitimately drained the
    whole corpus and doc_clean_corpus's sf10 pass was vacuous (0 rows).
  * embeddings: vec_id shifted; coordinate 0 perturbed by r * 1e-4 so
    replicas aren't bitwise-identical vectors (which would make every
    query's top-k a tie pile-up) but geometry is preserved.

Usage: python tools/gen_scale.py [k] [src] [out] [--tables=a,b]
defaults: k=10, src=/root/testdata/sf0.1, out=<repo>/.scale/sf1.0
--tables limits generation to a comma list (r15: the sf30/sf100 third
scale decade for the heavy pipeline family needs documents only).
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only: set[str] | None = None
    for fl in flags:
        if fl.startswith("--tables="):
            only = set(fl.split("=", 1)[1].split(","))
    k = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = (
        args[2]
        if len(args) > 2
        else os.path.join(REPO, ".scale", "sf1.0")
    )

    def want(t: str) -> bool:
        return only is None or t in only

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in ["region", "nation"]:
        if not want(t):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    rep = f"(SELECT unnest(generate_series(0, {k - 1})) AS r)"

    # strides: max key + 1 per base table, so shifted ranges are disjoint
    strides = {}
    if any(want(t) for t in KEYED):
        for base, keycol in [
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("part", "p_partkey"),
            ("orders", "o_orderkey"),
        ]:
            strides[base] = (
                con.execute(
                    f"SELECT max({keycol}) + 1 FROM "
                    f"read_parquet('{src}/{base}.parquet')"
                ).fetchone()[0]
            )

    for t, keymap in KEYED.items():
        if not want(t):
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r * {strides[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"{rep}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)

    if want("events"):
        _gen_events(con, src, out, k, rep)
    if want("documents"):
        _gen_documents(con, src, out, k, rep)
    if want("embeddings"):
        _gen_embeddings(con, src, out, k, rep)
    print("wrote", out)


def _gen_events(con, src, out, k, rep):
    ev_stride = con.execute(
        f"SELECT max(event_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    u_stride = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""COPY (SELECT event_id + r * {ev_stride} AS event_id,
                 ts + r * INTERVAL 73 MICROSECOND AS ts,
                 user_id + r * {u_stride} AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet'), {rep})
          TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    print("events", k * 100000)


def _gen_documents(con, src, out, k, rep):
    d_stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
          WITH perturbed AS (
            SELECT doc_id + r * {d_stride} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE list_aggregate(
                          list_transform(
                            string_split(text, ' '),
                            t -> CASE WHEN hash(t || chr(31)
                                             || CAST(r AS VARCHAR)) % 2 = 0
                                 THEN t || '~' || CAST(r AS VARCHAR)
                                 ELSE t END),
                          'string_agg', ' ')
                   END AS text,
                   lang, source
            FROM read_parquet('{src}/documents.parquet'), {rep})
          SELECT doc_id, text, lang, source,
                 length(text) AS n_chars
          FROM perturbed)
          TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    print("documents done")


def _gen_embeddings(con, src, out, k, rep):
    v_stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM "
        f"read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""COPY (SELECT vec_id + r * {v_stride} AS vec_id,
                 list_prepend(CAST(embedding[1] + r * 0.0001 AS FLOAT),
                              embedding[2:]) AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet'), {rep})
          TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    print("embeddings done")


if __name__ == "__main__":
    main()
