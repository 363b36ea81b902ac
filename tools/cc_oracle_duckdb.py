"""DuckDB-feasible connected-components oracle (VERDICT r6 #4).

The driver-facing oracle for ``doc_dup_clusters`` / ``doc_near_dedup``
is a recursive-CTE transitive closure — fine at the sf0.01 gate, but it
DNFs on sf1.0's 12.4M-edge pair graph (15+ min). This module provides a
TRUE cross-engine SQL oracle at that scale: iterative min-label
propagation over DuckDB TEMP TABLES — every step is a plain SQL
statement executed BY DuckDB (the Python loop only re-issues the same
statement until the converged-row count reaches zero), so the answer is
still computed by an independent engine, not by numpy on the driver
(that third check already exists in tools/verify_cc.py).

Pair generation mirrors the well-known SimHash pigeonhole bound rather
than the O(n^2) brute-force join (132 s at sf1.0 for the pair scan
alone): split the 64-bit signature into 4 16-bit blocks — any pair at
hamming distance <= 3 shares at least one intact block — equi-join per
block, dedup, then verify the true hamming distance. Identical pair set
to the brute-force join (asserted at the gate sf by check_oracle's
hash compare, and cheap enough to re-assert here via --brute).

Usage:
    python tools/cc_oracle_duckdb.py [sf_dir]          # run + report
    from tools.cc_oracle_duckdb import cc_label_prop   # as a library
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from ncagg_spark.functions.hashing import sql_hash64
from ncagg_spark.pipeline.text import sql_tokenize

MAX_HAMMING = 3
# multi-index Hamming search (HmSearch/multi-probe): 2 disjoint 16-bit
# halves of the 32-bit signature; a pair at hamming <= 3 differs <= 1
# bit in SOME half, so probing each doc's exact half-key + its 16
# single-bit flips against the exact-key table is candidate-complete.
# r15 fix: the old form shifted 16*i for i in 0..3 over a 32-BIT
# signature, so "blocks" 2/3 were constant 0 and their equi-joins were
# all-pairs cross products (correct via the final hamming verify, but
# O(N^2) — the thing the banding exists to avoid). 16-bit keys also
# resist the bucket skew of natural-text signatures that made an
# 8-bit-class rewrite 8.6x slower at sf1. Deliberately a different
# construction from the engine's contiguous 8-bit block equi-join
# (pipeline/dedup.py), so an extraction bug cannot cancel across
# engine and oracle.
_FLIPS = ", ".join(f"xor(hk, {1 << m})" for m in range(16))


def build_edges(con, *, brute: bool = False) -> int:
    """TEMP TABLE cc_edges(src, dst): the symmetric SimHash near-dup
    pair graph over ``documents`` (registered as a view/table in
    ``con``). Returns the edge count.

    Signatures use the relational unnest-and-group form (hash each
    token once) rather than the sql_simhash64 expression form (which
    re-renders the token-hash list once per bit vote) — value-identical
    (pinned by tests/test_round15_fixes.py), ~4x faster."""
    votes = ", ".join(
        f"SUM((((h >> {j}) & 1) * 2 - 1)) AS v{j}" for j in range(32)
    )
    acc = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(32)
    )
    toks = sql_tokenize("text")
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE cc_sigs AS
        WITH __tok AS (
            SELECT doc_id, {sql_hash64('tok')} AS h
            FROM (SELECT doc_id, unnest({toks}) AS tok FROM documents)
        ),
        __votes AS (SELECT doc_id, {votes} FROM __tok GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(({acc}), 0::BIGINT) AS simhash
        FROM documents d LEFT JOIN __votes v ON d.doc_id = v.doc_id
        """
    )
    if brute:
        pair_src = """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM cc_sigs a JOIN cc_sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {mh}
        """.format(mh=MAX_HAMMING)
    else:
        pair_src = f"""
            WITH halves AS (
                SELECT doc_id, simhash,
                       (h.h * 65536 + ((simhash >> (16 * h.h)) & 65535))
                           AS hk
                FROM cc_sigs, (VALUES (0), (1)) h(h)
            ),
            probes AS (
                SELECT doc_id, simhash,
                       unnest([hk, {_FLIPS}]) AS pk
                FROM halves
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM probes a JOIN halves b
              ON a.pk = b.hk AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
        """
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE cc_edges AS
        WITH pairs AS ({pair_src})
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
        """
    )
    return con.execute("SELECT count(*) FROM cc_edges").fetchone()[0]


def cc_label_prop(con, *, max_iter: int = 64, log=None) -> None:
    """TEMP TABLE cc_labels(node, label): min-label propagation over
    cc_edges until fixpoint. Each iteration is ONE SQL statement
    (neighbor-min join) plus one scalar convergence count — O(diameter)
    iterations; near-dup clusters are dense, so a handful in practice."""
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE cc_labels AS
        SELECT DISTINCT src AS node, src AS label FROM cc_edges
        """
    )
    for it in range(max_iter):
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE cc_labels_next AS
            SELECT l.node,
                   least(l.label, coalesce(m.minlab, l.label)) AS label
            FROM cc_labels l
            LEFT JOIN (
                SELECT e.dst AS node, min(l2.label) AS minlab
                FROM cc_edges e JOIN cc_labels l2 ON l2.node = e.src
                GROUP BY e.dst
            ) m ON m.node = l.node
            """
        )
        changed = con.execute(
            """
            SELECT count(*) FROM cc_labels_next n
            JOIN cc_labels o USING (node)
            WHERE n.label <> o.label
            """
        ).fetchone()[0]
        con.execute("DROP TABLE cc_labels")
        con.execute("ALTER TABLE cc_labels_next RENAME TO cc_labels")
        if log:
            log(f"  iter {it}: {changed} labels changed")
        if changed == 0:
            return
    raise RuntimeError(f"label propagation did not converge in {max_iter}")


def dup_clusters_df(con, *, brute: bool = False, log=None):
    """The ``doc_dup_clusters`` result (doc_id, cluster_id) as a pandas
    frame, computed entirely in DuckDB."""
    n = build_edges(con, brute=brute)
    if log:
        log(f"  {n} directed edges")
    cc_label_prop(con, log=log)
    return con.execute(
        "SELECT node AS doc_id, label AS cluster_id FROM cc_labels"
    ).df()


def near_dedup_df(con, *, brute: bool = False, log=None):
    """The ``doc_near_dedup`` result (doc_id, n_members): cluster
    representatives (min doc_id) with member counts, singletons kept."""
    n = build_edges(con, brute=brute)
    if log:
        log(f"  {n} directed edges")
    cc_label_prop(con, log=log)
    return con.execute(
        """
        WITH sizes AS (
            SELECT label AS cluster_id, count(*) AS n_members
            FROM cc_labels GROUP BY label
        )
        SELECT d.doc_id,
               coalesce(s.n_members, 1::BIGINT) AS n_members
        FROM documents d
        LEFT JOIN cc_labels l ON d.doc_id = l.node
        LEFT JOIN sizes s ON l.label = s.cluster_id
        WHERE l.node IS NULL OR l.node = l.label
        """
    ).df()


ITER_CC_ORACLES = {
    "doc_dup_clusters": dup_clusters_df,
    "doc_near_dedup": near_dedup_df,
}


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    brute = "--brute" in sys.argv
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for name, fn in ITER_CC_ORACLES.items():
        t0 = time.time()
        df = fn(con, brute=brute, log=lambda m: print(m, flush=True))
        print(f"{name}: {len(df)} rows in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
