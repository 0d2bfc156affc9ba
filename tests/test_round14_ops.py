"""Semantic-invariant tests for the round-14 operators (the
test_round10..13_ops.py discipline): each new operator gets at least one
property the oracle-parity hash can't state on its own — identities the
implementation relies on, dominance relations, cross-operator consistency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ ANN index delete/compact
def test_index_delete_tombstones_are_semdedup_drops(spark):
    """The tombstone wave must be EXACTLY q_semdedup's drop set: total
    tombstoned == count of is_kept = false, and the audit must balance
    bucket-by-bucket (before = tombstoned + live) with the independent
    survivor rebuild agreeing everywhere (compacted)."""
    from kitkat_spark.operators.similarity import (
        q_ann_index_delete,
        q_semdedup,
    )

    rows = q_ann_index_delete(spark, SF).collect()
    assert rows, "empty delete audit"
    for r in rows:
        assert r.n_before == r.n_tombstoned + r.n_live, r
        assert r.compacted and r.n_live == r.n_rebuilt, r
        assert r.reclaimed_bucket == (r.n_tombstoned > 0 and r.n_live == 0), r
    n_drops = q_semdedup(spark, SF).filter(~F.col("is_kept")).count()
    assert n_drops > 0, "fixture must flag at least one semantic duplicate"
    assert sum(r.n_tombstoned for r in rows) == n_drops


def test_index_delete_preserves_survivor_index(spark):
    """Compaction must not disturb survivors: the live occupancy summed
    over buckets equals the index size minus the drop count, and equals
    the from-scratch occupancy of the survivor set."""
    from kitkat_spark.operators.similarity import (
        _bucketed_index,
        q_ann_index_delete,
    )

    rows = q_ann_index_delete(spark, SF).collect()
    emb, _ = _bucketed_index(spark, SF)
    total = emb.count()
    tomb = sum(r.n_tombstoned for r in rows)
    assert sum(r.n_live for r in rows) == total - tomb
    assert sum(r.n_rebuilt for r in rows) == total - tomb


# --------------------------------------------- streaming boilerplate twin
def test_stream_boilerplate_matches_batch_on_sealed_horizon(spark):
    """The streaming dictionary classification must equal the BATCH
    q_boilerplate_coverage computed over only the sealed docs — the
    defining byte-equivalence of the twin (here checked semantically;
    the driver hash checks it against DuckDB)."""
    from kitkat_spark.operators.corpus import q_boilerplate_coverage
    from kitkat_spark.operators.streamparity import (
        DOC_WM_MINUTES,
        q_stream_boilerplate,
    )
    from kitkat_spark.functions.text import tokens
    from kitkat_spark.sources import load_table

    got = {r.doc_id: r for r in q_stream_boilerplate(spark, SF).collect()}
    assert got, "no sealed docs"
    # sealed horizon in doc_id space over token-bearing docs
    d = (
        load_table(spark, SF, "documents")
        .select("doc_id", tokens(F.col("text")).alias("w"))
        .filter(F.size("w") >= 3)
    )
    mx = d.agg(F.max("doc_id")).first()[0]
    sealed = {
        r.doc_id
        for r in d.select("doc_id").collect()
        if (r.doc_id // 60 + 1) * 60 <= mx - DOC_WM_MINUTES
    }
    assert set(got) == sealed
    # batch twin over the full corpus has MORE docs; restricting its df
    # threshold universe changes values, so recompute the invariant
    # only on structure: every sealed doc's gram count matches the batch
    # query's n_grams (grams are per-doc, horizon-independent)
    batch = {
        r.doc_id: r for r in q_boilerplate_coverage(spark, SF).collect()
    }
    for doc_id, r in got.items():
        assert r.n_grams == batch[doc_id].n_grams
        assert 0 <= r.n_boiler <= r.n_grams
        # HALF_UP micro-units (Spark F.round), not Python banker's round
        micro = int(r.n_boiler * 10000 / r.n_grams + 0.5)
        assert abs(r.boiler_frac - micro / 10000.0) < 1e-9


def test_stream_boilerplate_flags_commodity(spark):
    """The sealed corpus must actually contain commodity grams (df above
    the threshold) — otherwise the audit is vacuous."""
    from kitkat_spark.operators.streamparity import q_stream_boilerplate

    agg = (
        q_stream_boilerplate(spark, SF)
        .agg(F.sum("n_boiler").alias("b"), F.sum("n_grams").alias("g"))
        .first()
    )
    assert agg.g > 0 and 0 < agg.b <= agg.g


# ------------------------------------------- incremental PassJoin at ingest
def test_stream_passjoin_equals_batch_restricted(spark):
    """Byte-equivalence with the from-scratch batch PassJoin restricted to
    pairs whose LATER member is ingested (the round-13 verdict's done
    criterion), plus the complement: corpus-internal pairs never leak."""
    from kitkat_spark.operators.dedup import q_passjoin_dedup
    from kitkat_spark.operators.streamparity import q_stream_passjoin
    from kitkat_spark.sources import load_table

    cut = (
        load_table(spark, SF, "documents")
        .agg(F.expr("(max(doc_id) + 1) * 4 div 5"))
        .first()[0]
    )
    got = {
        (r.doc_a, r.doc_b): (r.lev, r.rel_dist)
        for r in q_stream_passjoin(spark, SF).collect()
    }
    want = {
        (r.doc_a, r.doc_b): (r.lev, r.rel_dist)
        for r in q_passjoin_dedup(spark, SF).collect()
        if max(r.doc_a, r.doc_b) >= cut
    }
    assert got == want
    assert got, "fixture must contain at least one ingested near-dup pair"
    assert all(max(a, b) >= cut for a, b in got)


def test_stream_passjoin_crosses_waves(spark):
    """The standing index must grow between waves: at least one discovered
    pair must span the corpus and an ingest wave (a-side below the cut),
    proving the stream-static join actually consults the standing state,
    not just the arriving batch."""
    from kitkat_spark.operators.streamparity import q_stream_passjoin
    from kitkat_spark.sources import load_table

    cut = (
        load_table(spark, SF, "documents")
        .agg(F.expr("(max(doc_id) + 1) * 4 div 5"))
        .first()[0]
    )
    pairs = [
        (r.doc_a, r.doc_b) for r in q_stream_passjoin(spark, SF).collect()
    ]
    assert any(a < cut <= b for a, b in pairs), (
        "no corpus-to-ingest pair discovered; standing index unused?"
    )


# ----------------------------------------------------- fertility drift
def test_fertility_drift_trailing_is_cumulative(spark):
    """Per source, the trailing ratios must equal the exact cumulative
    recomputation from the bucket sums, the first bucket must be NULL,
    and the flag must fire somewhere (non-vacuous on the fixture)."""
    from collections import defaultdict

    from kitkat_spark.operators.textops import (
        FERT_DRIFT_PCT,
        q_fertility_drift,
    )

    rows = sorted(
        q_fertility_drift(spark, SF).collect(),
        key=lambda r: (r.source, r.bucket),
    )
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    assert any(r.drift for r in rows), "drift flag never fires on fixture"
    for src, rs in by_src.items():
        cw = ct = cc = 0
        for i, r in enumerate(rs):
            if i == 0:
                assert r.trailing_fertility is None and r.drift is None
            else:
                ft = round(ct / cw * 10000)
                ctr = round(cc / ct * 10000)
                assert r.trailing_fertility == ft / 10000.0
                assert r.trailing_cpt == ctr / 10000.0
                fm = round(r.fertility * 10000)
                cm = round(r.chars_per_token * 10000)
                want = (
                    abs(fm - ft) * 100 > ft * FERT_DRIFT_PCT
                    or abs(cm - ctr) * 100 > ctr * FERT_DRIFT_PCT
                )
                assert r.drift == want
            cw += r.n_words
            ct += r.n_tokens
            cc += r.n_chars
