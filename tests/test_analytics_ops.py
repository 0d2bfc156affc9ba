"""Semantic invariants for the session-4 analytics operators — properties
the DuckDB oracle cannot state (it replays the same arithmetic, so a shared
conceptual bug would pass parity): probability-mass closure, brute-force
equivalence on small frames, and bound checks.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kn_probability_mass_sums_to_one(spark):
    """Interpolated KN is a PROPER conditional distribution: for every
    history t1, sum over ALL continuations t2 of
    max(c12-D,0)/c1 + D*fwd/c1 * bwd/B must be 1 (the discount mass D*fwd
    is exactly what the continuation prior redistributes, and the prior
    itself sums to 1 over the bigram-type table). Recomputed here from
    raw counts — independent of the operator's code path."""
    from kitkat_spark.functions.text import tokens
    from kitkat_spark.operators.pipelines import KN_DISCOUNT
    from kitkat_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    toks = tokens(F.col("text"))
    bg = docs.select(
        F.explode(F.when(F.size(toks) >= 2, F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1), F.slice(toks, 2, F.size(toks) - 1)
        )).otherwise(F.array())).alias("b")
    ).select(F.col("b")["0"].alias("t1"), F.col("b")["1"].alias("t2"))
    pair = bg.groupBy("t1", "t2").agg(F.count("*").alias("c12")).toPandas()
    bt = len(pair)
    c1 = pair.groupby("t1")["c12"].sum().to_dict()
    fwd = pair.groupby("t1")["c12"].size().to_dict()
    bwd = pair.groupby("t2")["c12"].size().to_dict()
    for t1 in c1:
        rows = pair[pair["t1"] == t1]
        mass = sum(
            max(r.c12 - KN_DISCOUNT, 0.0) / c1[t1]
            + KN_DISCOUNT * fwd[t1] / c1[t1] * (bwd[r.t2] / bt)
            for r in rows.itertuples()
        )
        # the continuation prior is normalized over the FULL type table,
        # so per-history mass closes only when summed over every t2 in the
        # vocabulary; restricting to observed continuations under-counts by
        # the unseen-continuation prior mass. Add it back explicitly.
        unseen = [t2 for t2 in bwd if t2 not in set(rows["t2"])]
        mass += sum(
            KN_DISCOUNT * fwd[t1] / c1[t1] * (bwd[t2] / bt) for t2 in unseen
        )
        assert math.isclose(mass, 1.0, rel_tol=1e-9), (t1, mass)


def test_kn_trigram_mass_sums_to_one(spark):
    """The recursive trigram KN is a PROPER conditional distribution: for
    a sample of frequent histories (t1, t2), summing P(t3|t1,t2) over the
    FULL continuation vocabulary (observed trigram continuations + the
    backoff prior over every t3 with a continuation history) must close to
    1 — recomputed here from raw counts, independent of the operator."""
    from kitkat_spark.functions.text import _zipped_ngrams, tokens
    from kitkat_spark.operators.pipelines import KN_DISCOUNT, TRIGRAM_MIN_COUNT
    from kitkat_spark.sources import load_table

    D = KN_DISCOUNT
    docs = load_table(spark, SF, "documents")
    toks = tokens(F.col("text"))
    tg = docs.select(
        F.explode(
            F.when(F.size(toks) >= 3, _zipped_ngrams(toks, 3)).otherwise(F.array())
        ).alias("g")
    ).select(
        F.col("g")["0"].alias("t1"),
        F.col("g")["1"].alias("t2"),
        F.col("g")["2"].alias("t3"),
    )
    tri = tg.groupBy("t1", "t2", "t3").agg(F.count("*").alias("c123")).toPandas()
    b23 = tri.groupby(["t2", "t3"]).size().rename("cont23").reset_index()
    b2 = len(b23)
    cont2 = b23.groupby("t2")["cont23"].sum().to_dict()
    fwd2 = b23.groupby("t2")["cont23"].size().to_dict()
    bwd3 = b23.groupby("t3")["cont23"].size().to_dict()
    cont23 = {(r.t2, r.t3): r.cont23 for r in b23.itertuples()}

    def p_bi(t2, t3):
        return (
            max(cont23.get((t2, t3), 0) - D, 0.0) / cont2[t2]
            + D * fwd2[t2] / cont2[t2] * (bwd3[t3] / b2)
        )

    hist = tri.groupby(["t1", "t2"])["c123"].agg(["sum", "size"])
    frequent = hist[hist["sum"] >= TRIGRAM_MIN_COUNT]
    assert len(frequent) > 0, "no frequent histories at sf0.001"
    for (t1, t2), row in frequent.head(25).iterrows():
        c12, _ = row["sum"], row["size"]
        obs = tri[(tri["t1"] == t1) & (tri["t2"] == t2)]
        mass = sum(max(r.c123 - D, 0.0) / c12 for r in obs.itertuples())
        # the backoff term extends over EVERY t3 in the continuation vocab
        fwd12 = len(obs)
        mass += sum(D * fwd12 / c12 * p_bi(t2, t3) for t3 in bwd3)
        assert math.isclose(mass, 1.0, rel_tol=1e-9), (t1, t2, mass)


def test_kn_argmax_matches_query_output(spark):
    """The operator's per-history argmax equals the argmax of the
    independently recomputed KN table (pandas, from raw bigram counts —
    the brute-force cross-check the shared-arithmetic oracle can't make),
    with the operator's tie-break (p desc, then t2 asc) replayed."""
    from kitkat_spark.functions.text import tokens
    from kitkat_spark.operators.pipelines import BIGRAM_MIN_COUNT, KN_DISCOUNT
    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    out = {r.t1: (r.next_tok, r.p_kn) for r in QUERIES["q_kn_bigram"](spark, SF).collect()}
    assert out, "no frequent histories at sf0.001"

    docs = load_table(spark, SF, "documents")
    toks = tokens(F.col("text"))
    bg = docs.select(
        F.explode(F.when(F.size(toks) >= 2, F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1), F.slice(toks, 2, F.size(toks) - 1)
        )).otherwise(F.array())).alias("b")
    ).select(F.col("b")["0"].alias("t1"), F.col("b")["1"].alias("t2"))
    pair = bg.groupBy("t1", "t2").agg(F.count("*").alias("c12")).toPandas()
    bt = len(pair)
    c1 = pair.groupby("t1")["c12"].sum().to_dict()
    fwd = pair.groupby("t1")["c12"].size().to_dict()
    bwd = pair.groupby("t2")["c12"].size().to_dict()

    expected = {}
    for r in pair.itertuples():
        if c1[r.t1] < BIGRAM_MIN_COUNT:
            continue
        p = (
            max(r.c12 - KN_DISCOUNT, 0.0) / c1[r.t1]
            + KN_DISCOUNT * fwd[r.t1] / c1[r.t1] * (bwd[r.t2] / bt)
        )
        # operator tie-break: highest p, then lexicographically smallest t2
        best = expected.get(r.t1)
        if best is None or (-p, r.t2) < (-best[1], best[0]):
            expected[r.t1] = (r.t2, p)

    assert set(out) == set(expected)
    for t1, (nxt, p) in out.items():
        exp_tok, exp_p = expected[t1]
        assert nxt == exp_tok, (t1, nxt, exp_tok)
        assert math.isclose(p, round(exp_p, 6), abs_tol=1e-9), (t1, p, exp_p)
        assert 0.0 < p < 1.0


def test_markov_rows_normalize(spark):
    """Every history row of the transition matrix sums to 1 (each observed
    transition lands in exactly one (prev, next) cell)."""
    from kitkat_spark.queries import QUERIES

    df = QUERIES["q_markov_transitions"](spark, SF)
    sums = (
        df.groupBy("prev_type").agg(F.sum("p").alias("mass")).collect()
    )
    assert sums
    for r in sums:
        # per-row rounding to 6dp perturbs the sum by < 5e-6 * row count
        assert abs(r.mass - 1.0) < 1e-4, (r.prev_type, r.mass)


def test_markov_transitions_never_cross_users_or_sessions(spark):
    """Total transition count == (events whose predecessor in the SAME
    user's timeline is within the session gap) — recomputed via a
    different formulation (join on rank instead of lag)."""
    from kitkat_spark.operators.temporal import SESSION_GAP_MINUTES
    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    got = (
        QUERIES["q_markov_transitions"](spark, SF)
        .agg(F.sum("n_trans"))
        .collect()[0][0]
    )
    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_id")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rk", F.row_number().over(w))
    j = r.alias("a").join(
        r.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.rk") == F.col("b.rk") + 1),
    )
    expected = j.filter(
        F.col("a.ts").cast("double") - F.col("b.ts").cast("double")
        <= SESSION_GAP_MINUTES * 60
    ).count()
    assert got == expected


def test_triplet_mining_matches_bruteforce(spark):
    """Per anchor: pos_cos is the MINIMUM same-label cosine and neg_cos the
    MAXIMUM different-label cosine — recomputed by brute force in numpy."""
    import numpy as np

    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in rows}
    out = QUERIES["q_triplet_mining"](spark, SF).collect()
    assert len(out) == 5
    for r in out:
        av, al = vecs[r.anchor_id]
        best_pos, best_neg = None, None
        for cid, (cv, cl) in vecs.items():
            if cid == r.anchor_id:
                continue
            cos = round(float(av @ cv / (np.linalg.norm(av) * np.linalg.norm(cv))), 6)
            if cl == al:
                if best_pos is None or cos < best_pos:
                    best_pos = cos
            elif best_neg is None or cos > best_neg:
                best_neg = cos
        assert abs(r.pos_cos - best_pos) < 1e-9, (r.anchor_id, r.pos_cos, best_pos)
        assert abs(r.neg_cos - best_neg) < 1e-9, (r.anchor_id, r.neg_cos, best_neg)
        assert r.violates == (round(r.pos_cos - r.neg_cos, 6) < 0.2)


def test_ngram_novelty_bounds_and_first_doc(spark):
    """novelty in [0,1]; the lowest doc_id with shingles is fully novel;
    and the novel-count total equals the number of DISTINCT shingles in
    the corpus (each distinct shingle is novel in exactly one doc)."""
    from kitkat_spark.functions.text import full_shingle_hashes, tokens
    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    df = QUERIES["q_ngram_novelty"](spark, SF)
    rows = df.collect()
    assert rows
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    total_novel = sum(r.n_novel for r in rows)
    distinct_shingles = (
        load_table(spark, SF, "documents")
        .select(F.explode(full_shingle_hashes(tokens(F.col("text")), 3)).alias("s"))
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles


def test_source_overlap_matches_bruteforce_join(spark):
    """The collect_set + map-side pair fan-out equals the naive distinct
    (source, shingle) self-join it replaced."""
    from kitkat_spark.functions.text import full_shingle_hashes, tokens
    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    sh = (
        load_table(spark, SF, "documents")
        .select(
            "source",
            F.explode(full_shingle_hashes(tokens(F.col("text")), 3)).alias("s"),
        )
        .distinct()
    )
    a = sh.select(F.col("source").alias("src_a"), "s")
    b = sh.select(F.col("source").alias("src_b"), "s")
    naive = {
        (r.src_a, r.src_b): r.n
        for r in a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r.src_a, r.src_b): r.n_common
        for r in QUERIES["q_source_overlap"](spark, SF).collect()
    }
    # the query returns top-20 of 190 pairs; every returned pair must match
    # the naive count exactly
    for k, v in got.items():
        assert naive.get(k) == v, (k, v, naive.get(k))


def test_stream_anomaly_flags_match_batch_zscore(spark):
    """The streaming run's flagged set equals a batch z-score over the
    same sealed windows (streaming adds no rows, loses none, and the
    read-time moments see exactly the sealed sink)."""
    from kitkat_spark.queries import QUERIES

    df = QUERIES["q_stream_anomaly_wm"](spark, SF).collect()
    assert df
    by_type: dict[str, list] = {}
    for r in df:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rows in by_type.items():
        ns = [r.n_events for r in rows]
        cnt, s = len(ns), sum(ns)
        if cnt <= 1:
            assert all(r.z is None and not r.is_anomaly for r in rows)
            continue
        m = s / cnt
        var = max((sum(n * n for n in ns) - s * s / cnt) / (cnt - 1), 0.0)
        sd = math.sqrt(var)
        for r in rows:
            if sd == 0:
                assert r.z is None and not r.is_anomaly
            else:
                assert abs(r.z - round((r.n_events - m) / sd, 4)) < 1e-9
                assert r.is_anomaly == ((r.n_events - m) / sd > 2.0)


def test_assoc_rules_confidence_lift_consistency(spark):
    """conf = supp_ab/supp_a and lift = conf/(supp_b/N) recomputed from the
    returned integer counts; every rule meets the support floor; and the
    symmetric rule's n_both matches (pair counts are order-symmetric)."""
    from kitkat_spark.queries import QUERIES
    from kitkat_spark.sources import load_table

    n_docs = load_table(spark, SF, "documents").count()
    rows = QUERIES["q_assoc_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_both >= 0.05 * n_docs
        assert abs(r.confidence - round(r.n_both / r.n_ante, 6)) < 1e-9
        assert (
            abs(r.lift - round(r.n_both * n_docs / (r.n_ante * r.n_cons), 6))
            < 1e-9
        )
