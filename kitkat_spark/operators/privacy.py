"""Privacy-release operators (SURVEY.md §2.B extension surface): the audit
and noise steps a corpus passes through before leaving the trust boundary —
k-anonymity class sizing over quasi-identifiers and differentially-private
counts. The reference (a Kinesis CLI; /root/reference/consumer/consumer.go)
releases nothing and has no privacy surface; these are new design from
public literature (Sweeney, IJUFKS 2002; Dwork et al., TCC 2006).

Determinism discipline: like the sampling module, anything "random" is
md5-derived from stable keys (functions/text.py md5_long), so releases are
reproducible across reruns/layouts/engines and the DuckDB oracle replays
them value-for-value — which is exactly what a release audit trail needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.functions.text import md5_long
from kitkat_spark.sources import load_table

K_ANON = 5  # classes smaller than this are re-identification risks
KANON_LEN_BAND = 100  # n_chars quantization for the quasi-identifier
# NULL-sensitive-value sentinel, interpolated into BOTH engines' groupBys
# (same spelling convention as dedup.NULL_SOURCE)
NULL_LANG = "<null>"


def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney, IJUFKS 2002 — public literature): group
    the corpus by its quasi-identifier tuple (lang, source, length band)
    and report every equivalence class with its size and an at-risk flag
    (size < K_ANON) — the table a privacy review reads before a metadata
    release, since any class of size 1 pins a document to its row.

    Scale: ONE map-side-combinable shuffle whose key domain is the
    quasi-identifier product (|langs| x |sources| x length bands — bounded
    by the schema, not the corpus); the length band is the standard
    generalization step (quantization IS the k-anonymity lever: widen the
    band until min class size clears k). Suppression/generalization
    decisions stay with the caller; this operator is the measurement."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {KANON_LEN_BAND}").alias("len_band"),
        )
        .agg(F.count("*").alias("class_size"))
        .select(
            "lang",
            "source",
            "len_band",
            "class_size",
            (F.col("class_size") < K_ANON).alias("at_risk"),
        )
    )


L_DIV = 3  # classes need >= this many distinct sensitive values


def q_ldiv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006 — public
    literature): k-anonymity is not enough when everyone in a class
    shares the SENSITIVE value (the homogeneity attack) — each
    quasi-identifier class (source, length band) must also contain at
    least l distinct values of the sensitive attribute (lang here), and
    the audit reports both the distinct count and the entropy of the
    within-class distribution (entropy l-diversity's measure).

    Entropy is computed from EXACT integer counts in the counts-only form
    H = log2(n) - sum(c*log2 c)/n over a SORTED per-class fold (the
    q_doc_entropy determinism move — float accumulation order is pinned
    on both engines), rounded 6 dp off ulp boundaries.

    Scale: one (qid, lang) combinable shuffle (key domain = qid product x
    |langs|, schema-bounded), then the class rollup runs on that tiny
    relation with a sorted array fold."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy(
        "source",
        F.expr(f"n_chars div {KANON_LEN_BAND}").alias("len_band"),
        "lang",
    ).agg(F.count("*").alias("c"))
    cls = cell.groupBy("source", "len_band").agg(
        F.sum("c").alias("class_size"),
        F.count("*").alias("l_distinct"),
        F.sort_array(F.collect_list("c")).alias("cs"),
    )
    h = F.expr(
        "log2(class_size) - aggregate(cs, cast(0.0 as double), "
        "(acc, c) -> acc + c * log2(c)) / class_size"
    )
    return cls.select(
        "source",
        "len_band",
        F.col("class_size").cast("long").alias("class_size"),
        F.col("l_distinct").cast("int").alias("l_distinct"),
        F.round(h, 6).alias("lang_entropy"),
        (F.col("l_distinct") >= L_DIV).alias("l_diverse"),
    )


T_CLOSE = 0.2  # max EMD between class and corpus sensitive distributions


def q_tclose_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 — public
    literature), completing k-anon (q_kanon_audit) → l-diversity
    (q_ldiv_audit) → t-closeness: l-diversity is not enough when a class's
    sensitive distribution is merely SKEWED toward the corpus's rare
    values (the skewness/similarity attacks) — each quasi-identifier
    class's sensitive-value distribution must stay within Earth Mover's
    Distance t of the CORPUS marginal. For a categorical sensitive
    attribute with the equal-distance ground metric (lang here), EMD is
    exactly total variation distance: 1/2 * sum_v |P_class(v) - P_corpus(v)|.

    Exactness discipline (the decimal-sum rule): the distance is computed
    as EXACT INTEGERS until one final division —
    sum_v |c_v*N - g_v*n| / (2*n*N), where c_v = class count of value v,
    g_v = corpus count, n = class size, N = corpus size. Values ABSENT
    from the class contribute g_v*n each, folded in closed form as
    (N - sum_{v in class} g_v) * n, so the per-class sum only touches the
    class's own cells. Integer sums are order-independent (no sorted-fold
    needed); products run as decimal(38,0) (c*N <= N^2 ~ 1e24 at 1e12
    rows — past int64, inside decimal38: the graph.py overflow lesson);
    the single division converts to double and rounds 6 dp.

    Scale: the (qid, lang) cell relation is schema-bounded (qid product x
    |langs|), the lang marginal broadcasts, N rides a broadcast 1-row
    cross join, and the class rollup reuses the cell shuffle's keys — no
    corpus-sized shuffle beyond the one combinable cell count.

    NULL sensitive values (round-11 advice): lang is coalesced to a
    sentinel BEFORE both groupBys, so NULL-lang documents form a regular
    sensitive value instead of silently dropping out of class_size and the
    TVD sum at the inner marginal join (NULL keys never match) — keeping
    class accounting consistent with q_kanon_audit/q_ldiv_audit."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "lang", F.coalesce(F.col("lang"), F.lit(NULL_LANG))
    )
    cell = docs.groupBy(
        "source",
        F.expr(f"n_chars div {KANON_LEN_BAND}").alias("len_band"),
        "lang",
    ).agg(F.count("*").alias("c"))
    marginal = docs.groupBy("lang").agg(F.count("*").alias("g"))
    total = docs.agg(F.count("*").alias("n_corpus"))
    w_cls = W.partitionBy("source", "len_band")
    j = (
        cell.join(F.broadcast(marginal), "lang")
        .crossJoin(F.broadcast(total))
        .withColumn("n_class", F.sum("c").over(w_cls))
    )
    dec = "decimal(38,0)"
    term = F.abs(
        F.col("c").cast(dec) * F.col("n_corpus") - F.col("g").cast(dec) * F.col("n_class")
    )
    cls = j.groupBy("source", "len_band").agg(
        F.max("n_class").alias("class_size"),
        F.max("n_corpus").alias("n_corpus"),
        F.sum(term).alias("num_in"),
        F.sum("g").alias("g_in"),
    )
    numer = F.col("num_in") + (
        (F.col("n_corpus") - F.col("g_in")).cast(dec) * F.col("class_size")
    )
    denom = F.lit(2.0) * F.col("class_size") * F.col("n_corpus")
    t = F.round(numer.cast("double") / denom, 6)
    return cls.select(
        "source",
        F.col("len_band").cast("long").alias("len_band"),
        F.col("class_size").cast("long").alias("class_size"),
        t.alias("emd"),
        (t <= T_CLOSE).alias("t_close"),
    )


DP_EPS = 1.0  # epsilon for the per-source count release (sensitivity 1)
DP_SEED = "dp1"


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release ARITHMETIC (Dwork, McSherry, Nissim
    & Smith, TCC 2006 — public literature): each count is released as
    count + Lap(1/eps), the calibrated noise for a sensitivity-1 counting
    query.

    **NOT a real DP mechanism — a deterministic replay twin for parity
    testing only.** The noise here is a deterministic function of the
    PROTECTED DATA itself (u = md5_long(seed|source)), which provides no
    epsilon-DP guarantee under ANY seed policy: data-keyed deterministic
    noise is never DP (an adversary who knows the seed recomputes the
    noise exactly). The output also carries true_count and noise next to
    dp_count — release-shaped for the AUDIT trail, never for publication;
    a real release (a) draws noise from a cryptographic RNG independent
    of the data, and (b) publishes ONLY the dp_count column.

    What the determinism buys: u = md5_long(seed|source)/2^60 is a
    uniform in (0,1) (the q_weighted_sample trick), and the Laplace draw
    is its inverse CDF -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|) — so the
    mechanism's ARITHMETIC (inverse-CDF transform, calibration b = 1/eps,
    post-noise rounding) is replayable value-for-value by the DuckDB
    oracle, which is exactly what a cross-engine parity test of the
    release pipeline needs. The ln result is rounded to 6 dp before the
    sum so the one transcendental stays off cross-engine ulp boundaries
    (the q_weighted_sample / q_bm25 lesson).

    Scale: one combinable count shuffle (key domain = |sources|); the
    noise projection is a codegen'd scalar on the tiny result."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("true_count"))
    u = (
        F.greatest(
            md5_long(F.concat(F.lit(DP_SEED + "|"), F.col("source"))), F.lit(1)
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    v = u - F.lit(0.5)
    b = 1.0 / DP_EPS
    noise = F.round(
        F.lit(-b) * F.signum(v) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v)), 6
    )
    return counts.select(
        "source",
        "true_count",
        noise.alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("dp_count"),
    )


WR_K = 10
WR_SEED = "wr1"


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP weighted reservoir sampling without replacement
    (Efraimidis & Spirakis, IPL 2006 A-Res — public literature): within
    every source, the WR_K documents with the largest priorities
    u^(1/w) form a weighted sample without replacement; ordering by the
    monotone-equivalent key ln(u)/w (descending) avoids the pow. The
    per-stratum version of q_weighted_sample's global draw — the corpus
    mix that up-weights long documents inside each source independently.

    Determinism as everywhere in the sampling family: u is md5-derived
    from the doc_id, so the draw is layout/rerun/engine-invariant. The
    rank filter plans as WindowGroupLimit (map-side top-k per group
    before the exchange — the distributed reservoir merge, same plan pin
    as q_reservoir_sample); the key rounds to 12 dp to stay off ln ulp
    boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.greatest(
            md5_long(F.concat(F.lit(WR_SEED + "|"), F.col("doc_id").cast("string"))),
            F.lit(1),
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    key = F.round(F.log(u) / F.col("n_chars"), 12)
    w = W.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WR_K)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id", "n_chars")
    )


ORACLE: dict[str, str] = {
    "q_kanon_audit": f"""
        SELECT lang, source,
               CAST(n_chars // {KANON_LEN_BAND} AS BIGINT) AS len_band,
               count(*) AS class_size,
               count(*) < {K_ANON} AS at_risk
        FROM documents
        GROUP BY 1, 2, 3
    """,
    # Same counts-only entropy over the same SORTED fold (list_reduce on
    # an ORDER BY list — the q_doc_entropy determinism pattern).
    "q_ldiv_audit": f"""
        WITH cell AS (
            SELECT source, n_chars // {KANON_LEN_BAND} AS len_band, lang,
                   count(*) AS c
            FROM documents GROUP BY 1, 2, 3
        ), cls AS (
            SELECT source, CAST(len_band AS BIGINT) AS len_band,
                   CAST(sum(c) AS BIGINT) AS class_size,
                   CAST(count(*) AS INT) AS l_distinct,
                   list_sort(list(c)) AS cs
            FROM cell GROUP BY 1, 2
        )
        SELECT source, len_band, class_size, l_distinct,
               round(log2(class_size)
                     - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(cs, c -> c * log2(c))),
                           (acc, x) -> acc + x) / class_size, 6)
                   AS lang_entropy,
               l_distinct >= {L_DIV} AS l_diverse
        FROM cls
    """,
    # Same exact-integer TVD numerator (HUGEINT here, decimal(38,0) in
    # Spark — both exact), same closed-form absent-value fold, one final
    # double division rounded 6 dp.
    "q_tclose_audit": f"""
        WITH d AS (
            SELECT source, n_chars, coalesce(lang, '{NULL_LANG}') AS lang
            FROM documents
        ), cell AS (
            SELECT source, n_chars // {KANON_LEN_BAND} AS len_band, lang,
                   count(*) AS c
            FROM d GROUP BY 1, 2, 3
        ), marginal AS (
            SELECT lang, count(*) AS g FROM d GROUP BY 1
        ), tot AS (SELECT count(*) AS n_corpus FROM d),
        j AS (
            SELECT cell.source, cell.len_band, cell.c, marginal.g,
                   tot.n_corpus,
                   sum(cell.c) OVER (
                       PARTITION BY cell.source, cell.len_band) AS n_class
            FROM cell JOIN marginal USING (lang) CROSS JOIN tot
        ), cls AS (
            SELECT source, len_band,
                   max(n_class) AS class_size,
                   max(n_corpus) AS n_corpus,
                   sum(abs(CAST(c AS HUGEINT) * n_corpus
                           - CAST(g AS HUGEINT) * n_class)) AS num_in,
                   sum(g) AS g_in
            FROM j GROUP BY 1, 2
        )
        SELECT source, CAST(len_band AS BIGINT) AS len_band,
               CAST(class_size AS BIGINT) AS class_size,
               round((num_in + CAST(n_corpus - g_in AS HUGEINT) * class_size)::DOUBLE
                     / (2.0 * class_size * n_corpus), 6) AS emd,
               round((num_in + CAST(n_corpus - g_in AS HUGEINT) * class_size)::DOUBLE
                     / (2.0 * class_size * n_corpus), 6) <= {T_CLOSE} AS t_close
        FROM cls
    """,
    # Identical md5-uniform, identical inverse-CDF arithmetic; ln rounded
    # to 6 dp on both sides before the sum.
    "q_dp_counts": f"""
        WITH c AS (
            SELECT source, count(*) AS true_count FROM documents GROUP BY 1
        ), n AS (
            SELECT source, true_count,
                   greatest(('0x' || substr(md5('{DP_SEED}|' || source), 1, 15))::BIGINT, 1)
                       / 1152921504606846976.0 - 0.5 AS v
            FROM c
        )
        SELECT source, true_count,
               round(-{1.0 / DP_EPS} * sign(v) * ln(1.0 - 2.0 * abs(v)), 6)
                   AS noise,
               round(true_count
                     + round(-{1.0 / DP_EPS} * sign(v) * ln(1.0 - 2.0 * abs(v)), 6),
                     6) AS dp_count
        FROM n
    """,
    "q_weighted_reservoir": f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   round(ln(greatest(('0x' || substr(md5('{WR_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, 1)
                      / 1152921504606846976.0) / n_chars, 12) AS k
            FROM documents
        )
        SELECT source,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY k DESC, doc_id) AS INT) AS rk,
               doc_id, n_chars
        FROM keyed
        QUALIFY rk <= {WR_K}
    """,
}
