"""Scale-technique correctness + plan shape: salted skew join equals the
plain join; bucketed join plans with zero Exchange on the bucketed sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kitkat_spark.operators.skew import salted_join
from kitkat_spark.plans import shuffle_count
from kitkat_spark.sources import load_table
from kitkat_spark.sources.bucketed import bucketed_join

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain = orders.join(lineitem, "o_orderkey")
    salted = salted_join(lineitem, orders, "o_orderkey")
    assert salted.count() == plain.count()
    p = plain.groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
    s = salted.groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
    assert sorted(map(tuple, p.collect())) == sorted(map(tuple, s.collect()))


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        df = bucketed_join(
            spark, SF, "orders", "customer", "o_custkey", "c_custkey", n_buckets=4
        )
        assert shuffle_count(df) == 0, "bucketed join must not shuffle"
        # and it still answers correctly
        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert df.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_multiprobe_recall_dominates_single_probe(spark):
    """Hamming-1 probing can only ADD candidates: per query, the multiprobe
    top-k cosine at each rank must be >= the single-probe value, and the
    result count never shrinks."""
    from kitkat_spark.operators.similarity import q_ann_ivf, q_ann_multiprobe

    sf = "/root/testdata/sf0.001"
    one = {(r.query_id, r.rk): r.cosine for r in q_ann_ivf(spark, sf).collect()}
    multi = {(r.query_id, r.rk): r.cosine for r in q_ann_multiprobe(spark, sf).collect()}
    assert len(multi) >= len(one)
    for key, cos in one.items():
        assert key in multi and multi[key] >= cos, key


def test_recall_audit_multiprobe_dominates(spark):
    """The measured form of the dominance property: q_ann_recall_multiprobe
    must report recall(multiprobe) >= recall(1probe) for EVERY query (the
    candidate set only grows), and both sides must audit the same exact
    top-k (n_exact equal per query)."""
    from kitkat_spark.operators.similarity import q_ann_recall_multiprobe

    rows = q_ann_recall_multiprobe(spark, "/root/testdata/sf0.001").collect()
    by_index: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_index.setdefault(r.index_name, {})[r.query_id] = (r.n_exact, r.n_hits)
    assert set(by_index) == {"lsh_1probe", "lsh_multiprobe"}
    assert set(by_index["lsh_1probe"]) == set(by_index["lsh_multiprobe"])
    for qid, (n_exact, hits_one) in by_index["lsh_1probe"].items():
        m_exact, hits_multi = by_index["lsh_multiprobe"][qid]
        assert m_exact == n_exact, qid
        assert hits_multi >= hits_one, qid


def test_ann_recall_absolute_floor(spark):
    """Round-9: with the plane count trained from the corpus
    (similarity._ann_planes, expected cell ~ANN_TARGET_BUCKET rows), the
    audits must report a MEANINGFUL absolute recall, not just dominance.
    Floors are set ~0.15 under the measured values (sf0.01: multiprobe
    min 0.8 / mean 0.88; sf0.1: min 0.7 / mean 0.80 — SCALE_NOTES r9) so
    an index regression fails but fixture drift does not."""
    from kitkat_spark.operators.similarity import q_ann_recall_multiprobe

    rows = q_ann_recall_multiprobe(spark, "/root/testdata/sf0.01").collect()
    multi = [r.recall_at_k for r in rows if r.index_name == "lsh_multiprobe"]
    assert multi, "no multiprobe audit rows"
    assert min(multi) >= 0.6, multi
    assert sum(multi) / len(multi) >= 0.75, multi


def test_adaptive_salted_join_equals_plain_join(spark):
    """Hot-key-only salting must be row-for-row identical to the plain join
    for inner and left, with a synthetic celebrity key on the probe side."""
    from pyspark.sql import functions as F

    from kitkat_spark.operators.skew import adaptive_salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in (2, 3, 99)], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b")], ["k", "tag"])

    for how in ("inner", "left"):
        got = adaptive_salted_join(left, right, "k", n_salts=4, hot_threshold=100, how=how)
        want = left.join(right, "k", how)
        assert got.count() == want.count(), how
        assert got.exceptAll(want).count() == 0, how
        assert want.exceptAll(got).count() == 0, how

    import pytest

    with pytest.raises(ValueError):
        adaptive_salted_join(left, right, "k", how="full")


def test_adaptive_salted_join_auto_threshold(spark):
    """With no threshold given, it derives rows-per-task sizing and still
    equals the plain join."""
    from kitkat_spark.operators.skew import adaptive_salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(2000)] + [(k, 0) for k in range(2, 50)], ["k", "v"]
    )
    right = spark.createDataFrame([(k, f"t{k}") for k in range(50)], ["k", "tag"])
    got = adaptive_salted_join(left, right, "k")
    want = left.join(right, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_adaptive_salted_join_auto_threshold_no_extra_pass(spark):
    """Default-threshold sizing must come from the SAME per-key aggregation
    that builds the hot list: bounded construction-time jobs over the
    persisted counts, and a result plan whose hot list is a LOCAL relation —
    no re-aggregation of the fact table embedded (the old form paid a full
    skewed.count() pass up front PLUS re-ran the hot-list groupBy inside
    each of the three hot/cold join branches)."""
    from kitkat_spark.operators.skew import adaptive_salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(2000)] + [(k, 0) for k in range(2, 50)], ["k", "v"]
    )
    right = spark.createDataFrame([(k, f"t{k}") for k in range(50)], ["k", "tag"])
    sc = spark.sparkContext
    sc.setJobGroup("salt-sizing", "auto-threshold construction jobs")
    try:
        got = adaptive_salted_join(left, right, "k")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # two actions (counts-build+total, hot-list readback from cache); AQE
    # materializes each query stage as its own job, so allow a few — the
    # point is a small constant, with ONE of them touching the fact table
    jobs = sc.statusTracker().getJobIdsForGroup("salt-sizing")
    assert 1 <= len(jobs) <= 6, jobs
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan, plan


def test_semdedup_two_level_assign_brute_force(spark):
    """Force the two-level quantizer (tiny max_broadcast) and brute-force
    verify the hierarchical assignment: every vector's coarse cell is the
    global coarse argmax, and its fine cell is the argmax among the fine
    centroids OF ITS COARSE CELL (rounded cosine, centroid-id tie-break) —
    the contract the SQL oracle can't reach because it only replays the
    flat regime."""
    import math

    from kitkat_spark.operators.similarity import _semdedup_assign, _with_norm

    emb = _with_norm(
        load_table(spark, SF, "embeddings").filter(F.size("embedding") > 0)
    )
    k = 16
    got = {
        r.vec_id: r.cell
        for r in _semdedup_assign(emb, k, max_broadcast=4).collect()
    }

    rows = emb.select("vec_id", "v", "nrm").collect()
    vecs = {r.vec_id: (r.v, r.nrm) for r in rows}
    kc = math.ceil(math.sqrt(k))

    def cos(a, b):
        va, na = vecs[a]
        vb, nb = vecs[b]
        return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)

    def argmax(vid, cands):
        return max(cands, key=lambda c: (cos(vid, c), -c))

    coarse_of = {vid: argmax(vid, range(kc)) for vid in vecs}
    fine_by_coarse = {}
    for c in range(k):
        # coarse centroids pin their fine row to their OWN cell (the
        # round-10 advice fix: guarantees no coarse cell is left empty)
        fine_by_coarse.setdefault(c if c < kc else coarse_of[c], []).append(c)
    assert len(got) == len(vecs)
    for vid, cell in got.items():
        cands = fine_by_coarse[coarse_of[vid]]
        assert cell == argmax(vid, cands), (vid, cell)


def test_semdedup_two_level_assign_duplicate_tie(spark):
    """The round-10 advice case, forced: duplicate embeddings make a
    rounded-cosine TIE route coarse centroid c's fine row toward a
    lower-id twin — pre-fix, cell c ended up with zero fine centroids and
    the inner join DROPPED every vector still coarse-assigned to c. With
    the pin, assignment is total and matches the brute-force model."""
    import math

    from pyspark.sql import functions as F

    from kitkat_spark.operators.similarity import _semdedup_assign, _with_norm

    # 8 vectors in 4 dims, k = 4 (fine centroids = vecs 0..3), kc = 2
    # (coarse = vecs 0, 1). Vec 1 is a NEAR-duplicate of vec 0
    # (cos = 1/sqrt(1 + 1e-6) > 0.9999995, which ROUNDS to 1.0 at 6 dp),
    # so coarse centroid 1's own fine row ties at rounded cosine 1.0 with
    # both coarse cells and the id tie-break routes it to cell 0. Fine
    # centroids 2 and 3 have ZERO second component, so they strictly
    # prefer coarse 0 too -> pre-fix, coarse cell 1 held no fine
    # centroids at all. Vectors 4 and 5 carry a large second component,
    # so their coarse argmax is cell 1 (cos with v1 beats cos with v0 by
    # ~1e-3, far above rounding) — pre-fix they were silently dropped.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),  # near-dup of 0 -> the rounded tie
        (2, [0.9, 0.0, 0.1, 0.0]),
        (3, [0.7, 0.0, 0.0, 0.3]),
        (4, [0.0, 1.0, 0.0, 0.0]),  # coarse cell 1 -> dropped pre-fix
        (5, [0.1, 0.9, 0.0, 0.0]),  # coarse cell 1 -> dropped pre-fix
        (6, [0.95, 0.0, 0.05, 0.0]),
        (7, [0.6, 0.0, 0.4, 0.0]),
    ]
    emb = _with_norm(
        spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in rows],
            "vec_id long, embedding array<float>, label int",
        )
    )
    k = 4
    kc = math.ceil(math.sqrt(k))
    got = {
        r.vec_id: r.cell
        for r in _semdedup_assign(emb, k, max_broadcast=2).collect()
    }
    vecs = {r.vec_id: (r.v, r.nrm) for r in emb.select("vec_id", "v", "nrm").collect()}

    def cos(a, b):
        va, na = vecs[a]
        vb, nb = vecs[b]
        return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)

    def argmax(vid, cands):
        return max(cands, key=lambda c: (cos(vid, c), -c))

    coarse_of = {vid: argmax(vid, range(kc)) for vid in vecs}
    fine_by_coarse = {}
    for c in range(k):
        fine_by_coarse.setdefault(c if c < kc else coarse_of[c], []).append(c)
    # the tie really happened: without the pin, centroid 1's argmax is 0
    # (rounded-cosine tie at 1.0, id tie-break), abandoning coarse cell 1
    assert argmax(1, range(kc)) == 0
    # and some vectors still coarse-assign to the abandoned cell
    assert {vid for vid, c in coarse_of.items() if c == 1} == {4, 5}
    # assignment is TOTAL — the pre-fix bug dropped vectors 4 and 5 here
    assert len(got) == len(vecs), sorted(set(vecs) - set(got))
    for vid, cell in got.items():
        cands = fine_by_coarse[coarse_of[vid]]
        assert cell == argmax(vid, cands), (vid, cell)
