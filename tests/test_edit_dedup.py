"""q_edit_dedup blocking completeness: the two-offset-grid length blocking
must lose NO qualifying pair — verified against an unblocked all-pairs
Levenshtein sweep (feasible only at fixture scale; the blocked query is the
one that scales)."""

from __future__ import annotations

import duckdb

from kitkat_spark.operators.dedup import EDIT_MAX_DIST, q_edit_dedup

SF = "/root/testdata/sf0.01"


def test_blocking_finds_every_pair_within_threshold(spark):
    got = {
        (r.doc_a, r.doc_b): r.lev for r in q_edit_dedup(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    # unblocked O(N^2) ground truth, same-lang pairs only (cross-lang pairs
    # are out of scope for the detector by design: blocking keys on lang)
    truth = dict(
        con.execute(
            f"""
            SELECT (a.doc_id, b.doc_id), levenshtein(a.text, b.text)
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE abs(a.n_chars - b.n_chars) <= {EDIT_MAX_DIST}
              AND levenshtein(a.text, b.text) <= {EDIT_MAX_DIST}
            """
        ).fetchall()
    )
    truth = {tuple(k): v for k, v in truth.items()}
    assert got == truth  # recall 1.0 (the offset-grid guarantee) AND
    # precision 1.0 (every candidate is exact-verified)
    assert len(truth) > 0  # fixture must contain real near-dup pairs
