"""Semantic-invariant tests for the round-12 operators (the
test_round10/11_ops.py discipline): each new operator gets at least one
property the oracle-parity hash can't state on its own — dominance
relations, closed-form replays, forced regimes the fixture never reaches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- HNSW layered ANN
def test_hnsw_recall_dominates_single_probe(spark):
    """q_ann_hnsw's layer 0 uses the FULL sign-LSH prefix, so its candidate
    pool contains q_ann_ivf's — per-query recall@k dominance must hold by
    construction, not just on average."""
    from kitkat_spark.operators.similarity import q_ann_recall_hnsw

    rows = q_ann_recall_hnsw(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.index_name] = r.recall_at_k
    assert by_q, "no queries audited"
    for q, d in by_q.items():
        assert set(d) == {"lsh_1probe", "hnsw_layered"}
        assert d["hnsw_layered"] >= d["lsh_1probe"], (q, d)


def test_hnsw_contains_ivf_topk_scores(spark):
    """Stronger than recall dominance: for each query, the layered index's
    worst kept cosine must be >= the single-probe index's worst kept cosine
    (ranking over a superset pool can only push the cut-line up)."""
    from kitkat_spark.operators.similarity import q_ann_hnsw, q_ann_ivf

    def worst(df):
        return {
            r.query_id: r.mn
            for r in df.groupBy("query_id").agg(F.min("cosine").alias("mn")).collect()
        }

    w_ivf = worst(q_ann_ivf(spark, SF))
    w_hnsw = worst(q_ann_hnsw(spark, SF))
    for q, mn in w_ivf.items():
        assert q in w_hnsw
        assert w_hnsw[q] >= mn, (q, w_hnsw[q], mn)


def test_ndcg_bounds_and_dominance(spark):
    """nDCG in [0, 1]; the layered index's candidate pool contains the
    1-probe pool and both rank by the same exact cosine with the same
    tie-break, so its nDCG@k dominates per query as well."""
    from kitkat_spark.operators.similarity import q_ndcg_eval

    rows = q_ndcg_eval(spark, SF).collect()
    by_q = {}
    for r in rows:
        assert 0.0 <= r.ndcg_at_k <= 1.0, r
        assert r.dcg6 <= r.idcg6, r
        by_q.setdefault(r.query_id, {})[r.index_name] = r.ndcg_at_k
    for q, d in by_q.items():
        assert d["hnsw_layered"] >= d["lsh_1probe"], (q, d)


def test_ndcg_perfect_for_exact_ranking(spark):
    """Feeding the exact top-k ranking back in as the 'approx' side must
    score ndcg == 1.0 for every query — the identity the metric is
    normalized around."""
    from kitkat_spark.operators.similarity import (
        _ndcg_vs_exact,
        q_similarity_search,
    )

    exact = q_similarity_search(spark, SF).select("query_id", "cand_id", "rk")
    rows = _ndcg_vs_exact(exact, exact, "self").collect()
    assert rows
    for r in rows:
        assert r.ndcg_at_k == 1.0, r


# ---------------------------------------------------------- LSH S-curve
def test_lsh_tuning_monotone_in_rows(spark):
    """For any fixed Jaccard j < 1, detection prob 1-(1-j^r)^(32/r) is
    non-increasing in r — so both per-config means, taken over the same
    pair population, must be non-increasing as rows-per-band grows."""
    from kitkat_spark.operators.dedup import q_lsh_tuning

    rows = sorted(q_lsh_tuning(spark, SF).collect(), key=lambda r: r.n_rows)
    assert [r.n_rows for r in rows] == [1, 2, 4, 8, 16, 32]
    assert all(r.n_bands * r.n_rows == 32 for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        if prev.exp_recall_dup is not None and cur.exp_recall_dup is not None:
            assert cur.exp_recall_dup <= prev.exp_recall_dup + 1e-9, (prev, cur)
        if prev.exp_catch_nondup is not None and cur.exp_catch_nondup is not None:
            assert cur.exp_catch_nondup <= prev.exp_catch_nondup + 1e-9, (prev, cur)


def test_lsh_tuning_closed_form_replay(spark):
    """The S-curve arithmetic replayed in Python over the SAME measured
    pair Jaccards must reproduce each config's micro-unit means exactly
    (repeated squaring + 1e-6 quantization + integer sums)."""
    from kitkat_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        LSH_TUNE_ROWS,
        q_lsh_tuning,
        q_minhash_accuracy,
    )

    js = [r.jaccard_exact for r in q_minhash_accuracy(spark, SF).collect()]
    assert js, "no candidate pairs at fixture scale"
    got = {(r.n_bands, r.n_rows): r for r in q_lsh_tuning(spark, SF).collect()}
    for r in LSH_TUNE_ROWS:
        k = r.bit_length() - 1

        def prob(j: float) -> float:
            jr = j
            for _ in range(k):
                jr = jr * jr
            miss = 1.0 - jr
            for _ in range(5 - k):
                miss = miss * miss
            return 1.0 - miss

        dup = [prob(j) for j in js if j >= JACCARD_THRESHOLD]
        non = [prob(j) for j in js if j < JACCARD_THRESHOLD]
        row = got[(32 // r, r)]
        assert row.n_dup_pairs == len(dup)
        assert row.n_nondup_pairs == len(non)

        def mean6(ps):
            if not ps:
                return None
            total = sum(int(round(p * 1e6)) for p in ps)
            return round(total / (len(ps) * 1e6), 6)

        assert row.exp_recall_dup == mean6(dup), (r, row)
        assert row.exp_catch_nondup == mean6(non), (r, row)


# ------------------------------------------------------------- gram guard
def test_gram_blocked_rejects_cross_partition_ragged(spark):
    """Round-11 advice: two partitions each internally consistent at
    DIFFERENT D must fail layout-independently (the per-partition check
    cannot see this mix; the aggregation-side min/max-D filter must)."""
    from kitkat_spark.operators.similarity import gram_blocked_from

    rdd = spark.sparkContext.parallelize(
        [Row(embedding=[1.0, 2.0]), Row(embedding=[1.0, 2.0, 3.0])], 2
    )
    emb = spark.createDataFrame(rdd, "embedding array<double>")
    assert emb.rdd.getNumPartitions() == 2
    with pytest.raises(Exception, match="mixed embedding dimensions"):
        gram_blocked_from(emb).count()  # count(): the column-pruned action


# -------------------------------------------------------------- PII battery
def test_pii_redact_four_classes_nonvacuous(spark):
    """Every synthesized contact card must surface all four PII classes,
    and the redacted text must carry the placeholders and ZERO digits —
    the whole point of running the battery in order."""
    from kitkat_spark.operators.pipelines import q_pii_redact

    rows = q_pii_redact(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_emails == 1, r
        assert r.n_phones == 1, r
        assert r.n_ibans == 1, r
        assert r.n_ids >= 1, r
        assert r.had_pii
        for tag in ("<EMAIL>", "<PHONE>", "<IBAN>", "<ID>"):
            assert tag in r.redacted, r
        assert not any(c.isdigit() for c in r.redacted), r


# ----------------------------------------------------- ANN index occupancy
def test_ann_index_stats_mass_identity(spark):
    """The histogram must conserve the corpus: per-row n_vectors is
    bucket_size * n_buckets, their sum equals the count of non-empty
    embeddings (every indexed vector in exactly one bucket), and the
    cumulative fraction is strictly increasing in bucket_size, ending at
    exactly 1.0."""
    from kitkat_spark.operators.similarity import q_ann_index_stats
    from kitkat_spark.sources import load_table

    rows = sorted(q_ann_index_stats(spark, SF).collect(), key=lambda r: r.bucket_size)
    assert rows, "empty histogram"
    n_indexed = (
        load_table(spark, SF, "embeddings").filter(F.size("embedding") > 0).count()
    )
    assert sum(r.n_vectors for r in rows) == n_indexed
    for r in rows:
        assert r.n_vectors == r.bucket_size * r.n_buckets, r
        assert 0.0 < r.frac_vectors <= 1.0, r
    cums = [r.cum_frac for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == 1.0


# ----------------------------------------------------- per-source S-curve
def test_lsh_source_curve_marginalizes_to_global(spark):
    """Summing the per-source pair counts over all pair_source classes must
    reproduce q_lsh_tuning's global counts for every (b, r) config — same
    candidate pipeline, same threshold, just one extra grouping level —
    and every pair_source is either a real corpus source or a sentinel."""
    from kitkat_spark.operators.dedup import (
        CROSS_SOURCE,
        NULL_SOURCE,
        q_lsh_source_curve,
        q_lsh_tuning,
    )
    from kitkat_spark.sources import load_table

    per_src = q_lsh_source_curve(spark, SF).collect()
    assert per_src, "no candidate pairs at fixture scale"
    glob = {(r.n_bands, r.n_rows): r for r in q_lsh_tuning(spark, SF).collect()}
    sources = {
        r.source
        for r in load_table(spark, SF, "documents").select("source").distinct().collect()
    }
    allowed = {s for s in sources if s is not None} | {CROSS_SOURCE, NULL_SOURCE}
    sums: dict[tuple[int, int], list[int]] = {}
    for r in per_src:
        assert r.pair_source in allowed, r
        acc = sums.setdefault((r.n_bands, r.n_rows), [0, 0])
        acc[0] += r.n_dup_pairs
        acc[1] += r.n_nondup_pairs
    assert set(sums) == set(glob)
    for cfg, (ndup, nnon) in sums.items():
        assert ndup == glob[cfg].n_dup_pairs, cfg
        assert nnon == glob[cfg].n_nondup_pairs, cfg
