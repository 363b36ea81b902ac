"""Round-15 pins (VERDICT r14 #1 — sf10 oracle-gate cost cut IN CODE):

1. the banded doc_simhash_near_dup oracle (pigeonhole equi-join over 4
   interleaved bit-classes) returns EXACTLY the all-pairs join's rows;
2. the relational SimHash signature subquery equals the sql_simhash64
   expression form on every doc;
3. the oracle-cache substitution (tools/oracle_cache.py) yields
   byte-for-byte the same result rows as the inline IVF/IVFPQ oracles;
4. cc_oracle_duckdb's banded edge builder equals its brute edge set
   (r15 also fixed classes 2/3 degenerating to all-pairs: the old form
   shifted 16*i over a 32-bit signature).

These are pure-DuckDB pins (no Spark session) at sf0.001/sf0.01 — the
cross-engine value check stays with the full gate.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_banded_simhash_oracle_equals_all_pairs(con):
    from ncagg_spark.functions.hashing import sql_simhash64

    brute = f"""
        WITH sigs AS (
            SELECT doc_id, {sql_simhash64('toks')} AS simhash
            FROM (SELECT doc_id, {entry._TOKENS} AS toks FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """
    banded = entry.oracle_sql()["doc_simhash_near_dup"]
    diff = con.execute(
        f"SELECT count(*) FROM (({banded}) EXCEPT ({brute})) "
        f"UNION ALL SELECT count(*) FROM (({brute}) EXCEPT ({banded}))"
    ).fetchall()
    assert diff == [(0,), (0,)]
    n = con.execute(f"SELECT count(*) FROM ({banded})").fetchone()[0]
    assert n > 0  # non-vacuous: the corpus has near-dups


def test_relational_sigs_equal_expression_sigs(con):
    from ncagg_spark.functions.hashing import sql_simhash64

    rel = entry._sql_simhash_sigs("documents")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_match = con.execute(
        f"""
        SELECT count(*)
        FROM {rel} r
        JOIN (SELECT doc_id, {sql_simhash64('toks')} AS simhash
              FROM (SELECT doc_id, {entry._TOKENS} AS toks
                    FROM documents)) x
          ON r.doc_id = x.doc_id AND r.simhash = x.simhash
        """
    ).fetchone()[0]
    assert n_match == n_docs


def test_cached_ivf_oracles_equal_inline(con, tmp_path):
    from tools.oracle_cache import cached_oracle_sql

    inline = entry.oracle_sql()
    cached = cached_oracle_sql(
        con, SF, entry, cache_root=str(tmp_path), log=lambda *a: None
    )
    assert set(cached) == set(inline)
    changed = {q for q in inline if cached[q] != inline[q]}
    assert changed == {"emb_ivf_topk", "emb_ivfpq_topk"}
    for q in sorted(changed):
        diff = con.execute(
            f"SELECT count(*) FROM (({cached[q]}) EXCEPT ({inline[q]})) "
            f"UNION ALL "
            f"SELECT count(*) FROM (({inline[q]}) EXCEPT ({cached[q]}))"
        ).fetchall()
        assert diff == [(0,), (0,)], q
    # second call reuses the fingerprinted files (no rebuild): same refs
    again = cached_oracle_sql(
        con, SF, entry, cache_root=str(tmp_path), log=lambda *a: None
    )
    assert again["emb_ivf_topk"] == cached["emb_ivf_topk"]


def test_cc_banded_edges_equal_brute(con):
    from tools.cc_oracle_duckdb import build_edges

    res = {}
    for brute in (False, True):
        build_edges(con, brute=brute)
        res[brute] = con.execute(
            "SELECT count(*), bit_xor(hash(src * 1000003 + dst)) "
            "FROM cc_edges"
        ).fetchall()
    assert res[False] == res[True]
    assert res[False][0][0] > 0
