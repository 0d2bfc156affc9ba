"""Corpus-construction operators (SURVEY.md §2.B north-star surface — new
design, no reference counterpart: /root/reference is a Kinesis CLI with no
analytics, see SURVEY §2.A).

The ops a 100 TB training-corpus build runs between dedup and tokenization:

- q_dedup_clusters: connected components over the near-dup pair graph
  (the q_ngram_jaccard edges), emitting one canonical doc per duplicate
  cluster. Iterative min-label propagation — the distributed-native CC
  formulation (no driver-side union-find; labels live in a DataFrame and
  every step is a join+agg Catalyst can plan). Converges in O(diameter)
  rounds; near-dup families are near-cliques, so diameter is 1-2.
- q_chunk_docs: context-window chunking — fixed-size token windows with
  stride overlap, the pre-tokenizer packing step. Pure codegen array ops
  (sequence -> posexplode -> slice): a narrow 1->N map, zero shuffle.
- q_length_outliers: quantile-based length filtering — global p05/p95 of
  n_chars, then per-(lang, bucket) counts. The percentile aggregate is one
  tiny 1-row result broadcast back onto the scan; at 100 TB you'd swap
  `percentile` for `approx_percentile` (same plan shape, sketch merge).
- q_corpus_mix: weighted per-source upsampling (explode(sequence(1,k))) —
  the corpus-mixing move (3x wiki-style sources, 1x web) every training-mix
  recipe needs. A 1->k narrow fan-out; repetition happens AFTER dedup, so
  no shuffle ever sees the duplicated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.functions.text import full_shingle_hashes, tokens
from kitkat_spark.operators.dedup import (
    PAIRS_SQL_CTES,
    jaccard_pairs,
    pairwise_set_counts,
)
from kitkat_spark.sources import load_table

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
CC_MAX_ITER = 20
# Real decontamination passes use 8-13-gram overlap; the synthetic fixture
# docs are ~55 tokens with diffuse near-dup edits, so 4-grams are the
# scale-equivalent signal (8-grams match almost nothing, verified).
DECON_NGRAM = 4
BENCH_DOCS = 20


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """(node, component-min) for every node in an undirected edge list.

    Hybrid strategy (the GraphX-vs-GraphFrames trade resolved at runtime):

    1. Min-label propagation for up to ``max_iter`` rounds — ONE join +
       one 1-row agg per round, converges in O(diameter) rounds. Near-dup
       graphs are star-like (diameter ~2-4), so this is the common fast
       path; labels only decrease, so a stable sum(label) witnesses
       convergence.
    2. If the diameter exceeds the budget (a 100 TB corpus chain
       A~B~C~..., the round-3 flagged scale risk), fall back to the
       alternating large-star/small-star algorithm (operators/graph.py):
       heavier per round but O(log^2 n) rounds REGARDLESS of diameter.
       No silent wrong answer in either path.
    """
    # materialize the edge list BEFORE the symmetric union: both union
    # branches reference the same plan, and without truncation the (possibly
    # expensive) edge derivation would execute once per branch
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    sym = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = labels.join(nbr_min, "u", "left").select(
            "u", F.least("label", F.coalesce("nbr_min", "label")).alias("label")
        )
        labels = labels.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    from kitkat_spark.operators.graph import connected_components_star

    return connected_components_star(e0, src="u", dst="v")


# Materialized cluster-membership tables, one parquet dir per sf_dir
# (tempfile.mkdtemp's random suffix keeps concurrent pytest/bench
# processes from clobbering each other's files). Each re-materialization
# creates a fresh dir and the superseded ones stay on disk until process
# exit (_cleanup_members_dirs) — bounded growth: one small parquet dir per
# q_dedup_clusters call, paid only by long sessions that re-cluster.
# This is the production layout: clustering writes a
# membership table ONCE; every downstream consumer (canonical selection,
# the corpus anti-join, dup-rate reporting) reads the table instead of
# re-deriving the pair graph + CC — at 100 TB the membership table is the
# contract between the dedup stage and everything after it.
_MEMBERS_PATHS: dict[str, str] = {}


def _compute_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("u").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("u") == F.col("label")).alias("is_canonical"),
    )


_MEMBERS_DIRS_CREATED: list[str] = []


def _cleanup_members_dirs() -> None:
    import shutil

    for d in _MEMBERS_DIRS_CREATED:
        shutil.rmtree(d, ignore_errors=True)
    # a mid-process call must not leave the memo pointing at deleted dirs
    _MEMBERS_DIRS_CREATED.clear()
    _MEMBERS_PATHS.clear()


def _materialize_members(spark: SparkSession, sf_dir: str, members: DataFrame) -> str:
    import atexit
    import hashlib
    import os
    import tempfile

    # a fresh versioned dir per materialization (never overwrite in place:
    # a live DataFrame from a previous cluster_members() call still lists
    # the old part files — overwriting them under it is a
    # FileNotFoundException at its next action); all dirs are removed at
    # process exit
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = tempfile.mkdtemp(prefix=f"kitkat_members_{key}_")
    members.write.mode("overwrite").parquet(path)
    if not _MEMBERS_DIRS_CREATED:
        atexit.register(_cleanup_members_dirs)
    _MEMBERS_DIRS_CREATED.append(path)
    _MEMBERS_PATHS[sf_dir] = path
    return path


def cluster_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The membership table, from the materialized parquet — computing and
    writing it first if this process hasn't yet. Consumers always plan a
    plain parquet scan (order-deterministic for the plan-facts gate); only
    the FIRST caller in a process pays the pair-graph + CC derivation."""
    if sf_dir not in _MEMBERS_PATHS:
        _materialize_members(spark, sf_dir, _compute_members(spark, sf_dir))
    return spark.read.parquet(_MEMBERS_PATHS[sf_dir])


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the exact-Jaccard pair
    graph (same edges as q_ngram_jaccard), one canonical doc (min doc_id)
    per cluster. Singleton docs are not emitted — output is exactly the
    membership table a dedup pass would anti-join against the corpus
    (keep rows where is_canonical OR doc absent).

    Side effect: refreshes the materialized membership parquet (see
    ``cluster_members``) so downstream consumers read instead of
    re-deriving — the write is of the already-checkpointed CC output, so
    it adds only the tiny parquet write, not a recompute. The RETURNED
    plan is a plain scan of that parquet (not the pre-write projection):
    the returned DataFrame and the materialized contract are the same
    artifact, so consumers of the return value never re-execute the
    projection and the timing boundary (compute + write inside this call)
    cannot silently regress if the CC output ever stops being
    checkpointed."""
    members = _compute_members(spark, sf_dir)
    path = _materialize_members(spark, sf_dir, members)
    return spark.read.parquet(path)


def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: the step AFTER clustering — for every
    near-dup cluster keep the most content-rich member (longest text, ties
    to the lowest doc_id) and account for what deduplication removes. This
    is what a production dedup pass actually ships: a per-cluster keeper
    plus removal stats, not just a membership table.

    Shape: reads the MATERIALIZED membership table (``cluster_members`` —
    only non-singleton docs, structurally tiny relative to the corpus;
    written once by the clustering stage, the production contract), joins
    doc lengths, then ONE window argmax per cluster and ONE aggregation
    emit (cluster_id, canonical doc, member count, chars kept/removed).
    At 100 TB both stages key on cluster_id — the post-clustering data is
    already a small fraction of the corpus, and the final anti-join of
    losers against the corpus is a broadcast."""
    members = cluster_members(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = members.join(docs, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = m.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("canonical_doc"),
            F.count("*").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("chars_kept"),
            (F.sum("n_chars") - F.max(F.when(F.col("rn") == 1, F.col("n_chars"))))
            .alias("chars_removed"),
        )
        .select(
            "cluster_id", "canonical_doc", "n_members", "chars_kept", "chars_removed"
        )
    )


def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's APPLY step — the query that actually emits the
    deduplicated corpus: every singleton (doc not in any near-dup cluster)
    plus the one canonical keeper per cluster (most content-rich member,
    q_canonical_docs' selection rule). Completes the three-stage production
    flow: cluster (q_dedup_clusters, writes the membership table) →
    select (q_canonical_docs) → apply (this).

    Shape: the membership table (materialized parquet, structurally tiny —
    only docs that HAVE a near-duplicate) gets its per-cluster keeper rank,
    then the corpus LEFT-JOINs that against doc_id with the membership side
    broadcast — the corpus itself is scanned once and NEVER shuffled; a row
    is kept when it has no membership row (singleton) or is the keeper.
    At 100 TB this is the exact layout the docstrings promise: a broadcast
    anti-join of the bounded loser set against the full corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    members = cluster_members(spark, sf_dir).select("doc_id", "cluster_id")
    # members is the broadcast side BOTH times: the sizing join streams a
    # 2-column pruned corpus scan past it, never the reverse
    sized = F.broadcast(members).join(docs.select("doc_id", "n_chars"), "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = sized.select(
        "doc_id", F.row_number().over(w).alias("rn")
    )
    return (
        docs.join(F.broadcast(ranked), "doc_id", "left")
        .filter(F.col("rn").isNull() | (F.col("rn") == 1))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.when(F.col("rn") == 1, F.lit("canonical"))
            .otherwise(F.lit("singleton"))
            .alias("kept_as"),
        )
    )


def q_dedup_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's ACCEPTANCE test — the check a production dedup
    ships after the apply step: re-run the exact near-dup detector
    (jaccard_pairs, the same edge generator that fed clustering) over the
    corpus q_dedup_apply KEEPS and report the residual duplication in one
    summary row: kept-doc count, residual pairs still >= the Jaccard
    threshold, and the worst residual score (NULL when clean). Completes
    the audit family: cluster → select → apply → VERIFY.

    Residuals CAN legitimately be non-zero: document frequencies are
    recomputed on the kept corpus (exactly what a re-run over the written
    output sees), so a shingle bucket the first pass dropped as hot
    (> DF_CAP docs) may fall under the cap once duplicates are removed and
    admit pairs the clustering never saw. Measuring that honestly is the
    point — the number is the feedback that tunes DF_CAP.

    Shape: the keep-set derivation is q_dedup_apply's broadcast left-join
    (corpus scanned once, never shuffled), the detector is the audited
    inverted-index pipeline (bucket-capped, no N^2), and the summary is
    two 1-row aggregations — cost tracks one detector run over the
    (smaller) kept corpus."""
    from kitkat_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    members = cluster_members(spark, sf_dir).select("doc_id", "cluster_id")
    sized = F.broadcast(members).join(docs.select("doc_id", "n_chars"), "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = sized.select("doc_id", F.row_number().over(w).alias("rn"))
    kept = (
        docs.join(F.broadcast(ranked), "doc_id", "left")
        .filter(F.col("rn").isNull() | (F.col("rn") == 1))
        .select("doc_id", "text")
    )
    residual = jaccard_pairs(spark, sf_dir, docs=kept)
    summary = residual.agg(
        F.count("*").alias("n_residual_pairs"),
        F.max("jaccard").alias("max_residual_jaccard"),
    )
    n_kept = kept.agg(F.count("*").alias("n_docs_kept"))
    return n_kept.crossJoin(summary).select(
        "n_docs_kept", "n_residual_pairs", "max_residual_jaccard"
    )


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunks (32 tokens, stride 24 -> 8-token overlap).

    sequence(1, n_tok, stride) -> posexplode -> slice is a codegen'd Generate
    with no shuffle; each input row fans out to ceil(n/stride) chunk rows.
    The trailing chunk may be short — kept (training pipelines pad), which
    also keeps the op exactly invertible to doc boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ", -1).alias("w")).filter(
        F.size("w") > 0
    )
    ex = d.select(
        "doc_id",
        "w",
        F.posexplode(F.sequence(F.lit(1), F.size("w"), F.lit(CHUNK_STRIDE))).alias(
            "chunk_id", "start"
        ),
    )
    piece = F.slice("w", F.col("start"), CHUNK_TOKENS)
    return ex.select(
        "doc_id",
        "chunk_id",
        "start",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile length filter audit: bucket docs against global p05/p95 of
    n_chars, count per (lang, bucket). Exact `percentile` here so DuckDB's
    quantile_cont matches; the 100 TB plan swaps in approx_percentile."""
    docs = load_table(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.array(F.lit(0.05), F.lit(0.95)))
    bounds = docs.agg(
        F.element_at(pct, 1).alias("lo"), F.element_at(pct, 2).alias("hi")
    )
    bucket = (
        F.when(F.col("n_chars") < F.col("lo"), F.lit("short"))
        .when(F.col("n_chars") > F.col("hi"), F.lit("long"))
        .otherwise(F.lit("keep"))
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mix: upsample src0 3x, src1 2x, everything else 1x —
    each copy tagged with its repetition index. Narrow explode after dedup;
    at scale the copies exist only in the written training shards, never in
    a shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    factor = (
        F.when(F.col("source") == "src0", F.lit(3))
        .when(F.col("source") == "src1", F.lit(2))
        .otherwise(F.lit(1))
    )
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(1), factor)).alias("copy"),
    )


MIX_SEED = "mix1"


def q_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing by deterministic downsampling: every source
    stratum is cut to the size of the SMALLEST source, members chosen by a
    seeded md5 rank — the "data mixing" step an LLM corpus runs to stop
    over-represented sources from dominating training (the down-weighting
    half of the mix; q_corpus_mix is the up-sampling half).

    Determinism (vs ``df.sampleBy``): the keep-set is a pure function of
    (seed, doc_id) — layout/rerun invariant and replayed value-for-value by
    the DuckDB oracle. Shape: one agg for per-source counts (broadcast — a
    handful of rows), one window rank per source, one filter. The
    partitionBy(source) window is fine at fixture scale; at 100 TB with few
    huge sources, swap the exact rank for the rate-based acceptance test
    u < m/count_s (no shuffle at all, stratum sizes exact to ~sqrt(m)) —
    same seeded-hash machinery, documented trade."""
    from kitkat_spark.functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    m = counts.agg(F.min("n_src").alias("m"))
    u = md5_long(F.concat(F.lit(MIX_SEED + "|"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(u.asc(), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


def q_mix_rebalance_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of q_mix_rebalance: rate-based acceptance instead
    of an exact per-source rank. Keep a doc iff
    ``u/2^32 < m/n_src`` where u is the seeded 32-bit md5 hash of doc_id,
    m the smallest stratum and n_src the doc's stratum size — stratum
    sizes land within ~sqrt(m) of the target instead of exactly m, and in
    exchange the full corpus is NEVER shuffled: the only wide operator is
    the per-source count (map-side-combined partials over a handful of
    keys), broadcast back onto the scan as a filter. The rank variant's
    partitionBy(source) window moves every row of every huge stratum
    through one partition chain; this one is a scan + broadcast join +
    filter, embarrassingly parallel at any scale.

    Portability: both sides of the comparison are single IEEE-754 double
    divisions of exact integers — correctly rounded and therefore
    bit-identical in Spark and DuckDB (no transcendental, no multi-op
    accumulation), so the keep-set is value-replayable by the oracle.
    tests/test_corpus.py proves the bounded-difference contract vs the
    exact-rank variant."""
    from kitkat_spark.functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    m = counts.agg(F.min("n_src").alias("m"))
    u32 = md5_long(
        F.concat(F.lit(MIX_SEED + "|"), F.col("doc_id").cast("string")), hex_chars=8
    )
    accept = (u32.cast("double") / F.lit(4294967296.0)) < (
        F.col("m").cast("double") / F.col("n_src").cast("double")
    )
    return (
        docs.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(m))
        .filter(accept)
        .select("doc_id", "source")
    )


QUALITY_MIN = 0.55


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end quality-filter pass — the composition every corpus build
    runs before tokenization: keep a doc iff (a) heuristic quality score
    >= 0.55, (b) repeated-3-gram ratio <= 0.2, (c) n_chars inside the global
    p05..p95 band; report per-source keep/drop counts and the binding filter.

    One Catalyst plan: the per-doc scores are narrow map expressions fused
    into the scan stage, the percentile band is a 1-row broadcast, and the
    only real shuffle is the final per-source aggregation. Demonstrates that
    filter composition costs ONE corpus pass regardless of how many rules
    stack — the property that matters when the corpus is 100 TB and every
    extra pass is hours."""
    from kitkat_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.element_at(F.percentile("n_chars", F.array(F.lit(0.05), F.lit(0.95))), 1).alias("lo"),
        F.element_at(F.percentile("n_chars", F.array(F.lit(0.05), F.lit(0.95))), 2).alias("hi"),
    )
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    stop_ratio = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|a|of|and|is|to|in)\b"), F.lit(0)))
        / n_tok
    )
    len_ok = F.when((n_tok >= 20) & (n_tok <= 1000), 1.0).otherwise(0.5)
    quality = F.lit(0.4) * ttr + F.lit(0.3) * (1 - stop_ratio) + F.lit(0.3) * len_ok
    n_grams = F.greatest(n_tok - 2, F.lit(0))
    rep_ratio = F.when(
        n_grams > 0, 1 - F.size(word_shingles(toks, 3)) / n_grams
    ).otherwise(F.lit(0.0))
    scored = docs.select(
        "source",
        "n_chars",
        quality.alias("q"),
        rep_ratio.alias("rep"),
    ).crossJoin(F.broadcast(bounds))
    verdict = (
        F.when(F.col("q") < QUALITY_MIN, "low_quality")
        .when(F.col("rep") > 0.2, "repetitive")
        .when((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")), "length")
        .otherwise("keep")
    )
    return (
        scored.groupBy("source", verdict.alias("verdict"))
        .agg(F.count("*").alias("n_docs"))
    )


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication audit: fraction of each source's docs whose
    content fingerprint appears more than once corpus-WIDE (cross-source
    copies count against both sources) — the table a corpus-mix decision
    reads before weighting sources. One window over the fingerprint (copy
    counts), one hash agg on source; the fingerprint is the same 200-char
    normalized-prefix md5 as q_split_leakage / q_incremental_dedup."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.substring(F.lower(F.regexp_replace("text", r"\s+", " ")), 1, 200))
    d = docs.select("doc_id", "source", fp.alias("fp"))
    dd = d.withColumn("n_copies", F.count("*").over(W.partitionBy("fp")))
    return dd.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias("n_dup_docs"),
        F.round(
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)) * 1.0 / F.count("*"),
            4,
        ).alias("dup_rate"),
    )


PACK_BIN_TOKENS = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing prep: per source, docs in doc_id order receive their
    running token offset, the 512-token training bin that offset lands in,
    and whether the doc straddles a bin boundary — the deterministic layout
    pass before concatenate-and-chunk tokenization (every pretraining
    pipeline's packing step).

    One shuffle: partitionBy(source) orderBy(doc_id) running sum. Integer
    arithmetic end-to-end, so the assignment is exact cross-engine and
    stable under repartitioning — a doc's bin depends only on the ordered
    prefix of its source, never on executor layout. At 100 TB the same
    window runs per source-shard (the natural packing unit is a shard, so
    the sort stays bounded per partition)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    w = W.partitionBy("source").orderBy("doc_id")
    d = docs.select("doc_id", "source", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    start = F.col("cum") - F.col("n_tok")
    return d.select(
        "doc_id",
        "source",
        "n_tok",
        start.alias("start_off"),
        F.expr(f"(cum - n_tok) div {PACK_BIN_TOKENS}").alias("bin"),
        (
            F.expr(f"(cum - n_tok) div {PACK_BIN_TOKENS}")
            != F.expr(f"(cum - 1) div {PACK_BIN_TOKENS}")
        ).alias("straddles"),
    )


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-utilization audit — the number a pretraining data team
    actually reports for its packing strategy: per source, how many
    512-token training bins concatenate-and-chunk packing
    (q_pack_sequences' layout) needs versus naive one-doc-per-bin padding,
    the bins saved, and both strategies' token utilization. Packing's win
    is exactly the padding waste: utilization_packed is ~1.0 (only the
    last bin per source is partial) while utilization_padded decays with
    short-doc share.

    ONE corpus pass: per-doc token counts aggregate straight into three
    per-source integer sums (map-side combined); everything after is
    arithmetic on a handful of rows. All bin math is integer
    ceil-division, exact and identical cross-engine; the utilization
    ratios are single IEEE divisions of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select("source", F.size(tokens(F.col("text"))).alias("n_tok"))
    agg = per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(
            F.expr(f"(n_tok + {PACK_BIN_TOKENS - 1}) div {PACK_BIN_TOKENS}")
        ).alias("padded_bins"),
    )
    packed = F.expr(f"(n_tokens + {PACK_BIN_TOKENS - 1}) div {PACK_BIN_TOKENS}")
    return agg.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("padded_bins").cast("long").alias("padded_bins"),
        packed.cast("long").alias("packed_bins"),
        (F.col("padded_bins") - packed).cast("long").alias("bins_saved"),
        F.round(
            F.col("n_tokens") / (packed * F.lit(float(PACK_BIN_TOKENS))), 4
        ).alias("util_packed"),
        F.round(
            F.col("n_tokens") / (F.col("padded_bins") * F.lit(float(PACK_BIN_TOKENS))),
            4,
        ).alias("util_padded"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: corpus docs sharing any 4-gram with
    the benchmark set (docs 0..19 stand in for an eval benchmark) — the
    standard pre-training decontamination pass.

    The benchmark side is tiny BY DEFINITION (eval sets are a few thousand
    rows even when the corpus is 100 TB), so its distinct shingles broadcast
    and the corpus side never shuffles: one narrow scan + broadcast-hash
    join + partial agg. Shingles are full-range xxhash64 longs (equality on
    hashes == equality on strings up to 2^-64 collisions; the DuckDB oracle
    verifies the string-level overlap)."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")

    def shingled(side):
        return side.select(
            "doc_id",
            F.explode(full_shingle_hashes(tokens(F.col("text")), DECON_NGRAM)).alias("s"),
        )

    # Derive each side from its OWN filtered scan so the doc_id predicates
    # reach the parquet reader: the bench side then reads ~|eval set| rows
    # instead of re-scanning and re-shingling the whole corpus. (The
    # previous shape filtered ABOVE a shared repartition, which blocked
    # pushdown and ran the full tokenize+hash scan once per branch — 18
    # xxhash64 copies in the executed plan, caught by the round-5 plan
    # sweep. A persist() of the shared shingle table also fixes the double
    # scan but materializes an exploded table as large as the corpus;
    # measured slower at sf0.1 and strictly worse at 100 TB than reading
    # 20 rows.)
    bench = (
        shingled(docs.filter(F.col("doc_id") < BENCH_DOCS))
        .select("s", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    corp = shingled(docs.filter(F.col("doc_id") >= BENCH_DOCS).repartition(par))
    return (
        corp.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


NOVELTY_NGRAM = 3


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles whose FIRST occurrence (lowest doc_id in ingest
    order) is this doc — the memorization/repetition audit that separates
    fresh text from recombinations of already-ingested material (the
    complement of q_span_dedup's duplicated-span view).

    Two shuffles, both narrow: (1) the distinct (doc, shingle-hash) pairs
    shuffle once keyed on the 8-byte hash so a partitionBy(shingle)
    window can take min(doc_id) — first-occurrence assignment without a
    groupBy + self-join (which would shuffle the same table twice);
    (2) the per-doc roll-up. Shingles travel as full-range xxhash64
    longs (equality up to 2^-64 collisions — same contract as
    q_decontaminate); the oracle verifies at the string level."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    sh = docs.select(
        "doc_id",
        F.explode(
            full_shingle_hashes(tokens(F.col("text")), NOVELTY_NGRAM)
        ).alias("s"),
    )
    w = W.partitionBy("s")
    marked = sh.withColumn("first_doc", F.min("doc_id").over(w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


OVERLAP_TOP_K = 20


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, the
    Jaccard similarity of their distinct 3-gram shingle sets — the
    governance check that finds mirror sites, scraped re-posts, and
    shared boilerplate BETWEEN corpus sources before mixing weights are
    chosen. Output: top-20 pairs by Jaccard.

    ONE corpus-sized shuffle: the exploded (shingle-hash, source) stream
    aggregates straight to collect_set(source) keyed on the 8-byte hash
    (set-union partials combine map-side; the set is bounded by the
    source count, so no group can grow with the data). Source PAIRS are
    then generated map-side from each set — sorted, nested transform,
    a < b — exactly the q_assoc_rules fan-out, bounded by C(|sources|,2)
    per shingle, and aggregate to the |sources|^2 matrix; a self-join of
    the distinct (source, shingle) table would shuffle the corpus twice
    more. Set sizes come from exploding the same checkpointed set table.
    Jaccard = inter / (|A| + |B| - inter) on exact integers cast to
    double in the same order in both engines."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    sets = (
        docs.select(
            "source",
            F.explode(
                full_shingle_hashes(tokens(F.col("text")), NOVELTY_NGRAM)
            ).alias("s"),
        )
        .groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .localCheckpoint(eager=True)
    )
    sizes = (
        sets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sh"))
    )
    inter = pairwise_set_counts(sets, "srcs")
    jac = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("n_b"))),
            "src_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    top = jac.orderBy(F.col("jaccard").desc(), "src_a", "src_b").limit(OVERLAP_TOP_K)
    w_r = W.orderBy(F.col("jaccard").desc(), "src_a", "src_b")
    return top.select(
        F.row_number().over(w_r).alias("rank"),
        "src_a",
        "src_b",
        "n_common",
        "n_a",
        "n_b",
        F.round(F.col("jaccard"), 6).alias("jaccard"),
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the last 20% of doc_ids play an incoming
    batch, deduped against the existing corpus (fingerprint anti-join) and
    within itself (min doc_id per fingerprint). Output = the rows a daily
    ingest would actually append.

    Scale shape: ONE groupBy(fingerprint) pass over the whole table with
    conditional min aggregates — corpus-hit detection and within-batch
    canonicalization come out of the same shuffle. (The anti-join + window
    formulation this replaces scanned documents three times, fingerprinted
    twice, and shuffled on fp twice — 8 exchanges vs 4, measured via
    PLAN_FACTS. At 100 TB the single full scan + one fp shuffle is the
    floor for this op without a pre-bucketed fingerprint index.)"""
    # fan the single-file fixture scan out before the regexp+md5 map — the
    # fingerprint pass is CPU-bound and must use every core (no-op on a real
    # cluster where the scan already has many partitions)
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    fp = F.md5(F.substring(F.lower(F.regexp_replace("text", r"\s+", " ")), 1, 200))
    d = docs.select("doc_id", fp.alias("fp"))
    # scale-free split point: integer arithmetic, exact in both engines;
    # the 1-row aggregate broadcasts onto the fact scan (doc_id-only read)
    cut = d.agg(F.expr("(max(doc_id) + 1) * 4 div 5").alias("cut"))
    per_fp = (
        d.crossJoin(F.broadcast(cut))
        .groupBy("fp")
        .agg(
            F.min(
                F.when(F.col("doc_id") < F.col("cut"), F.col("doc_id"))
            ).alias("corpus_hit"),
            F.min(
                F.when(F.col("doc_id") >= F.col("cut"), F.col("doc_id"))
            ).alias("new_id"),
        )
    )
    return per_fp.filter(
        F.col("corpus_hit").isNull() & F.col("new_id").isNotNull()
    ).select(F.col("new_id").alias("doc_id"), "fp")


SHUFFLE_MIN_SHARDS = 16
SHUFFLE_DOCS_PER_SHARD = 1024
SHUFFLE_SEED = "shuf1"


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the final 'write
    training shards' step of a data pipeline: every document gets a
    pseudo-random but SEEDED, layout-invariant position, so the exact
    training order is reproducible across reruns, cluster layouts, and
    engines (md5_long of seed||doc_id; the oracle replays it).

    shard = key mod N; position = rank within the shard by (key, doc_id).
    N is SIZED FROM THE CORPUS — max(16, ceil(docs / 1024)) — so each
    shard-window stays ~training-file-sized no matter the corpus (a fixed
    N would make every window partition grow linearly with the data, the
    same fixed-resolution disease the near-dup quantizer had; the sizing
    count is the same one-scan 'train the layout' step). One shuffle — the
    per-shard window; the production form writes partitionBy(shard) with
    sortWithinPartitions(key) and lets position be implicit file order
    rather than materializing row_number."""
    import math

    from kitkat_spark.functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # mirror the oracle arithmetic exactly: ceil(n / docs_per_shard)
    shards = max(SHUFFLE_MIN_SHARDS, math.ceil(n_docs / SHUFFLE_DOCS_PER_SHARD))
    keyed = docs.select(
        "doc_id",
        md5_long(
            F.concat(F.lit(SHUFFLE_SEED + "|"), F.col("doc_id").cast("string"))
        ).alias("k"),
    )
    w = W.partitionBy(F.pmod(F.col("k"), F.lit(shards))).orderBy("k", "doc_id")
    return keyed.select(
        F.pmod(F.col("k"), F.lit(shards)).alias("shard"),
        F.row_number().over(w).alias("pos"),
        "doc_id",
    )


SPAN_TOKENS = 10


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span audit (the C4/RefinedWeb within-corpus span dedup, at
    span granularity rather than whole-document): every document splits into
    non-overlapping SPAN_TOKENS-word spans, each span fingerprints (md5),
    and an occurrence is a duplicate iff ANOTHER occurrence of the same
    fingerprint precedes it in (doc_id, start) order. Output: per-document
    span counts + duplicated-span fraction — the signal used to drop or
    trim boilerplate-heavy documents.

    Plan: the span fan-out is a codegen'd Generate (map-side, ~n_tokens/10
    rows per doc, NO shuffle — same shape as q_chunk_docs); first-occurrence
    marking is ONE window shuffle keyed on the fingerprint (exactly the
    shuffle an exact-dedup groupBy would pay; the groupBy(fp)+join-back
    alternative pays two); the per-doc rollup partial-aggregates map-side.
    A viral span (site boilerplate repeated millions of times) concentrates
    one fp key — the window only sorts within that key, and a production
    run caps it the way q_ngram_jaccard's DF_CAP bounds hot shingles:
    spans past the cap are duplicates by definition, no sort needed.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ", -1).alias("w")).filter(
        F.size("w") > 0
    )
    spans = d.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.size("w"), F.lit(SPAN_TOKENS))).alias(
            "start"
        ),
    ).select(
        "doc_id",
        "start",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("start"), SPAN_TOKENS))).alias("fp"),
    )
    w_fp = W.partitionBy("fp").orderBy("doc_id", "start")
    marked = spans.select(
        "doc_id",
        F.when(F.row_number().over(w_fp) > 1, 1).otherwise(0).alias("dup"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("dup").cast("long").alias("n_dup_spans"),
        F.round(F.sum("dup") / F.count("*"), 4).alias("dup_frac"),
    )


CDC_GRAM = 4  # rolling window width (tokens) for the boundary gate
CDC_MOD = 8  # boundary when gram-hash % MOD == 0 -> ~MOD-token chunks


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """The content-defined chunk stream: one row (doc_id, source,
    chunk_idx, fp, clen) per chunk. Factored out of q_cdc_chunk so the
    shift-resilience property — insert tokens early and every chunk after
    the next boundary keeps its fingerprint — is directly unit-testable
    (tests/test_corpus.py).

    Gate hash j (1-based) covers tokens j..j+3; a passing gate puts a
    boundary after token j+3. The LAST gate (ending exactly at the final
    token) is excluded — a trailing boundary would only emit an empty tail
    chunk. Docs shorter than the gram width get zero gates (the slice
    length clamps to 0 -> one whole-doc chunk)."""
    d = docs.select("doc_id", "source", tokens(F.col("text")).alias("w")).filter(
        F.size("w") > 0
    )
    m = F.greatest(F.size("w") - (CDC_GRAM - 1), F.lit(0))
    grams = F.arrays_zip(
        *[F.slice(F.col("w"), j + 1, m) for j in range(CDC_GRAM)]
    )
    gate = (
        "transform(grams, x -> cast(conv(substring(md5(concat_ws(' ', "
        "x['0'], x['1'], x['2'], x['3'])), 1, 15), 16, 10) as bigint)"
        f" % {CDC_MOD})"
    )
    g = d.select("doc_id", "source", "w", grams.alias("grams")).select(
        "doc_id", "source", "w", F.expr(gate).alias("gates")
    )
    # Spark's sequence(1, 0) DESCENDS; guard the empty/singleton-gate case
    bnds = (
        "(case when size(gates) > 1 then "
        "filter(sequence(1, size(gates) - 1), j -> element_at(gates, j) = 0) "
        "else cast(array() as array<int>) end)"
    )
    spans = g.select(
        "doc_id",
        "source",
        "w",
        F.expr(
            f"concat(array(1), transform({bnds}, j -> j + {CDC_GRAM}))"
        ).alias("starts"),
        F.expr(
            f"concat(transform({bnds}, j -> j + {CDC_GRAM} - 1), array(size(w)))"
        ).alias("ends"),
    )
    return spans.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                "zip_with(starts, ends, (s, e) -> struct("
                "md5(concat_ws(' ', slice(w, s, e - s + 1))) AS fp, "
                "e - s + 1 AS clen))"
            )
        ).alias("chunk_idx", "c"),
    ).select(
        "doc_id",
        "source",
        "chunk_idx",
        F.col("c.fp").alias("fp"),
        F.col("c.clen").alias("clen"),
    )


def q_cdc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup audit — the storage-
    dedup modality (rsync/LBFS/backup dedup): chunk boundaries are set by
    CONTENT (a rolling-window hash gate), not by fixed offsets, so an
    insertion early in a document shifts only the chunk it lands in and
    every following chunk still fingerprints identically — exactly what
    fixed-stride spans (q_span_dedup) lose. Word-level variant: a boundary
    falls after token i when md5_long(4-gram ending at i) % CDC_MOD == 0.

    Output: per source, chunk count, duplicated-chunk count (an occurrence
    is a dup iff another occurrence of the same chunk fingerprint precedes
    it in (doc_id, chunk_idx) order — the q_span_dedup rule), dup fraction,
    and mean chunk length — the measurements that size a chunk store.

    Plan: gates + boundaries + per-chunk fingerprints are ARRAY-NATIVE per
    document (see cdc_chunks) — a narrow map, no shuffle until the chunk
    stream exists; dup marking is ONE window shuffle on the fingerprint;
    the per-source rollup partial-aggregates map-side. The array HOFs run
    interpreted (the q_passjoin_dedup lesson) but over per-doc arrays, so
    the cost is a constant per scanned token at any corpus size."""
    chunks = cdc_chunks(load_table(spark, sf_dir, "documents"))
    w_fp = W.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    marked = chunks.select(
        "source",
        "clen",
        F.when(F.row_number().over(w_fp) > 1, 1).otherwise(0).alias("dup"),
    )
    return marked.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum("dup").cast("long").alias("n_dup_chunks"),
        F.round(F.sum("dup") / F.count("*"), 4).alias("dup_frac"),
        F.round(F.sum("clen") / F.count("*"), 4).alias("mean_chunk_len"),
    )


LCP_GRAM = 8  # exact-substring match width (tokens); >= this length = dup


def lcp_span_fold(k: int) -> F.Column:
    """Closed-form island fold over a SORTED int array ``ps`` of
    duplicated gram start-positions (width-k grams): returns a struct
    with ns (maximal-span count), tot (covered tokens), mx (longest
    span). A new span starts when the gap to the previous position
    exceeds k (spans [p, p+k-1] no longer touch); otherwise the covered
    region extends by exactly the gap. prev starts at -2k (bigint —
    ANSI-safe) so the first position always opens a span. Equivalent to
    classic interval-merge of [p, p+k-1] — property-tested against a
    brute-force merge in tests/test_round11_ops.py, and against DuckDB's
    independent gaps-and-islands window derivation via the oracle."""
    return F.expr(
        f"""aggregate(ps,
            named_struct(
                'prev', cast(-{2 * k} as bigint), 'cur', cast(0 as bigint),
                'mx', cast(0 as bigint), 'tot', cast(0 as bigint),
                'ns', cast(0 as int)),
            (a, p) -> if(p - a.prev > {k},
                named_struct(
                    'prev', cast(p as bigint), 'cur', cast({k} as bigint),
                    'mx', greatest(a.mx, cast({k} as bigint)),
                    'tot', a.tot + {k}, 'ns', a.ns + 1),
                named_struct(
                    'prev', cast(p as bigint), 'cur', a.cur + (p - a.prev),
                    'mx', greatest(a.mx, a.cur + (p - a.prev)),
                    'tot', a.tot + (p - a.prev), 'ns', a.ns)))"""
    )


def q_lcp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup audit (the suffix-array exact-substring dedup
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — public literature), suffix-array-FREE: a token
    position is duplicated iff the LCP_GRAM-token substring starting
    there occurs anywhere else in the corpus (>= 2 occurrences of its
    fingerprint — the sorted-fingerprint adjacent-overlap formulation:
    sorting all gram fingerprints puts equal substrings adjacent, which
    is exactly what a suffix array's LCP pass detects, re-expressed as
    ONE shuffle on the fingerprint domain). Overlapping duplicated
    positions then merge into MAXIMAL duplicated spans per document —
    the spans the Lee et al. pipeline cuts out of training text. The
    exact-substring complement to q_cdc_chunk (storage-chunk dedup) and
    q_span_dedup (fixed-stride span audit, which misses any duplicate
    not aligned to its stride).

    Output per document (n_tokens >= LCP_GRAM): token count, maximal
    duplicated-span count, duplicated-token total and fraction, longest
    duplicated span — the decide-to-trim table.

    Plan, 100 TB discipline: the stride-1 gram fan-out is a codegen'd
    Generate of the corpus TOKEN STREAM (same cardinality as the exploded
    bigram passes q_lm_score/q_bigram_lm already pay — linear, map-side,
    no shuffle); duplicate marking is ONE count-over-fingerprint window
    shuffle (a viral substring concentrates one fp key, but the window is
    a COUNT, not a sort — no per-key ordering cost); span merging is
    ARRAY-NATIVE per document (sorted dup positions fold through a
    closed-form island accumulator: covered tokens grow by min(gap, K)),
    so the per-doc rollup is one more combinable shuffle and there is NO
    join back — n_tokens re-derives as n_grams + K - 1. The fold's island
    arithmetic is integer-exact; the one division rounds at 4 dp."""
    k = LCP_GRAM
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= k
    )
    grams = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - (k - 1))).alias("p"),
        "w",
    ).select(
        "doc_id",
        "p",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("p"), k))).alias("fp"),
    )
    marked = grams.select(
        "doc_id",
        "p",
        (F.count("*").over(W.partitionBy("fp")) > 1).alias("dup"),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sort_array(
            F.collect_list(F.when(F.col("dup"), F.col("p")))
        ).alias("ps"),
    )
    fold = lcp_span_fold(k)
    n_tokens = (F.col("n_grams") + (k - 1)).cast("long")
    return per_doc.select(
        "doc_id", F.col("n_grams").alias("n_grams"), fold.alias("f")
    ).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.col("f.ns").alias("n_dup_spans"),
        F.col("f.tot").alias("dup_tokens"),
        F.round(F.col("f.tot") / n_tokens, 4).alias("dup_frac"),
        F.col("f.mx").alias("max_span_len"),
    )


MANIFEST_SEED = "manifest1"


def q_train_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-ready manifest — the composed END of the data pipeline, as
    one driver-verified query: exact dedup → split assignment → seeded
    shard shuffle → within-shard position. Its output is literally what a
    training job consumes: for every SURVIVING document, which split it
    belongs to and (for train) which shard file and position it occupies.

    Stages (each individually oracled elsewhere; this query verifies their
    COMPOSITION end-to-end):
    1. exact dedup: whitespace-normalized md5 fingerprint, keep the min
       doc_id per fingerprint (q_dedup / q_incremental_dedup's rule);
    2. split: deterministic Knuth hash-mod bucketing, 80/10/10
       (sampling.split_column — layout- and rerun-invariant);
    3. shard: train docs get a seeded md5 order key; shard = key mod N
       with N SIZED FROM THE SURVIVING TRAIN COUNT (max(16, ceil(n/1024)),
       q_shuffle_shards' corpus-sized rule); valid/test stay shard -1
       (eval sets ship whole);
    4. position: rank within the shard by (key, doc_id) — the exact
       training order, reproducible across engines and cluster layouts.

    Plan: one fp window (the dedup shuffle), a codegen'd split/shard
    projection, one per-shard window (each shard ~1024 rows at any corpus
    size, because N scales). The sizing count runs on the deduped train
    subset — one cheap aggregate, the same 'train the layout' step the
    shuffle-shards query prices. No stage rescans the corpus.
    """
    import math

    from kitkat_spark.functions.text import md5_long
    from kitkat_spark.operators.sampling import split_column

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    # one survivor per fingerprint = min(doc_id) per fp — a combinable
    # aggregate, not a row_number window over the corpus (r14, guide
    # §2.3): the partial agg collapses every fingerprint map-side before
    # the exchange, and there is no per-group sort
    survivors = (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .withColumn("split", split_column(F.col("doc_id")))
    )
    n_train = survivors.filter(F.col("split") == "train").count()
    shards = max(SHUFFLE_MIN_SHARDS, math.ceil(n_train / SHUFFLE_DOCS_PER_SHARD))
    keyed = survivors.withColumn(
        "k",
        md5_long(
            F.concat(F.lit(MANIFEST_SEED + "|"), F.col("doc_id").cast("string"))
        ),
    ).withColumn(
        "shard",
        F.when(
            F.col("split") == "train", F.pmod(F.col("k"), F.lit(shards)).cast("int")
        ).otherwise(F.lit(-1)),
    )
    w_shard = W.partitionBy("split", "shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        "split",
        "shard",
        F.row_number().over(w_shard).alias("pos"),
    )


CARD_SHORT_CHARS = 100  # "short document" threshold for the card's frac


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card — the corpus-health summary a dataset release ships
    (Gebru et al., "Datasheets for Datasets", CACM 2021 — public
    literature): ONE table holding the (source x lang) composition matrix
    plus all its marginals and the grand total, each row with document
    count, char volume, mean/min/max length, short-doc fraction, and share
    of corpus.

    CUBE(source, lang) computes all four grouping levels in a single
    pass — Catalyst expands the grouping sets map-side and the one shuffle
    carries partial aggregates for every level at once (vs 4 separate
    scans); the key domain is |sources| x |langs| + marginals, tiny at any
    corpus size. The grand total for pct_docs comes from the same pass's
    () row semantics replayed as a 1-row broadcast (no second scan of the
    corpus — the broadcast subtree re-aggregates only because the fixture
    is unpersisted; a production card materializes the cube once). Level
    labels use '<all>' coalescing, safe because the fixture columns are
    non-null (grouping_id would disambiguate otherwise)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars"
    )
    cube = docs.cube("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(
            F.sum((F.col("n_chars") < CARD_SHORT_CHARS).cast("long"))
            / F.count("*"),
            4,
        ).alias("short_frac"),
    )
    total = docs.agg(F.count("*").alias("n_total"))
    return cube.crossJoin(F.broadcast(total)).select(
        F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
        "n_docs",
        "total_chars",
        "avg_chars",
        "min_chars",
        "max_chars",
        "short_frac",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("pct_docs"),
    )


ORACLE: dict[str, str] = {
    # Independent replay: DuckDB computes the SAME maximal spans via the
    # classic gaps-and-islands window (lag + cumulative sum) instead of
    # Spark's closed-form array fold — two derivations, one answer, which
    # is the strongest form of the parity check.
    "q_lcp_dedup": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), d AS (
            SELECT doc_id, len(w) AS n_tokens, w FROM toks
            WHERE len(w) >= {LCP_GRAM}
        ), grams AS (
            SELECT doc_id, n_tokens, i AS p,
                   md5(array_to_string(
                       list_slice(w, i, i + {LCP_GRAM} - 1), ' ')) AS fp
            FROM d, UNNEST(generate_series(1, n_tokens - {LCP_GRAM} + 1)) AS t(i)
        ), marked AS (
            SELECT doc_id, p, count(*) OVER (PARTITION BY fp) > 1 AS dup
            FROM grams
        ), dups AS (
            SELECT doc_id, p,
                   CASE WHEN lag(p) OVER w IS NULL
                             OR p - lag(p) OVER w > {LCP_GRAM}
                        THEN 1 ELSE 0 END AS new_s
            FROM marked WHERE dup
            WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        ), isl AS (
            SELECT doc_id, p,
                   sum(new_s) OVER (PARTITION BY doc_id ORDER BY p
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM dups
        ), spans AS (
            SELECT doc_id, min(p) AS s, max(p) + {LCP_GRAM} - 1 AS e
            FROM isl GROUP BY doc_id, sid
        ), per_doc AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_dup_spans,
                   CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
                   CAST(max(e - s + 1) AS BIGINT) AS max_span_len
            FROM spans GROUP BY doc_id
        )
        SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
               coalesce(p.n_dup_spans, 0) AS n_dup_spans,
               coalesce(p.dup_tokens, 0) AS dup_tokens,
               round(coalesce(p.dup_tokens, 0) * 1.0 / d.n_tokens, 4)
                   AS dup_frac,
               coalesce(p.max_span_len, 0) AS max_span_len
        FROM d LEFT JOIN per_doc p USING (doc_id)
    """,
    "q_dataset_card": f"""
        WITH t AS (SELECT count(*) AS n_total FROM documents)
        SELECT coalesce(source, '<all>') AS source,
               coalesce(lang, '<all>') AS lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 2) AS avg_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars,
               round(CAST(sum(CASE WHEN n_chars < {CARD_SHORT_CHARS}
                                   THEN 1 ELSE 0 END) AS BIGINT)
                     / count(*), 4) AS short_frac,
               round(count(*) / t.n_total, 6) AS pct_docs
        FROM documents, t
        GROUP BY CUBE (source, lang), t.n_total
    """,
    # Replays the content-defined chunking value-for-value: same md5_long
    # gate (('0x' || md5-prefix)::BIGINT), same boundary rule, same chunk
    # fingerprints; duckdb list indexing is 1-based like element_at.
    "q_cdc_chunk": """
        WITH d AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) > 0
        ), g AS (
            SELECT doc_id, source, w, len(w) AS n,
                   list_transform(
                       generate_series(1, greatest(len(w) - 3, 0)),
                       j -> ('0x' || substr(md5(array_to_string(
                                w[j:j+3], ' ')), 1, 15))::BIGINT % 8) AS gates
            FROM d
        ), b AS (
            SELECT doc_id, source, w, n,
                   list_filter(generate_series(1, greatest(len(gates) - 1, 0)),
                               j -> gates[j] = 0) AS bnds
            FROM g
        ), se AS (
            SELECT doc_id, source, w,
                   list_prepend(1, list_transform(bnds, j -> j + 4)) AS starts,
                   list_append(list_transform(bnds, j -> j + 3), n) AS ends
            FROM b
        ), chunks AS (
            SELECT doc_id, source, t.i AS chunk_idx,
                   md5(array_to_string(w[starts[t.i]:ends[t.i]], ' ')) AS fp,
                   ends[t.i] - starts[t.i] + 1 AS clen
            FROM se, unnest(generate_series(1, len(starts))) AS t(i)
        ), marked AS (
            SELECT source, clen,
                   CASE WHEN row_number() OVER (
                            PARTITION BY fp ORDER BY doc_id, chunk_idx) > 1
                        THEN 1 ELSE 0 END AS dup
            FROM chunks
        )
        SELECT source, count(*) AS n_chunks,
               CAST(sum(dup) AS BIGINT) AS n_dup_chunks,
               round(sum(dup) * 1.0 / count(*), 4) AS dup_frac,
               round(sum(clen) * 1.0 / count(*), 4) AS mean_chunk_len
        FROM marked GROUP BY source
    """,
    "q_train_manifest": f"""
        WITH surv AS (
            SELECT doc_id,
                   CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
                        WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id,
                       row_number() OVER (
                           PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
                           ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        ),
        params AS (
            SELECT greatest({SHUFFLE_MIN_SHARDS},
                   CAST(ceil(count(*) * 1.0 / {SHUFFLE_DOCS_PER_SHARD}) AS BIGINT)) AS n
            FROM surv WHERE split = 'train'
        ),
        keyed AS (
            SELECT doc_id, split,
                   ('0x' || substr(md5('{MANIFEST_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
            FROM surv
        ),
        sharded AS (
            SELECT doc_id, split, k,
                   CASE WHEN split = 'train'
                        THEN CAST(k % (SELECT n FROM params) AS INT)
                        ELSE -1 END AS shard
            FROM keyed
        )
        SELECT doc_id, split, shard,
               CAST(row_number() OVER (
                   PARTITION BY split, shard ORDER BY k, doc_id) AS INT) AS pos
        FROM sharded
    """,
    "q_span_dedup": f"""
        WITH d AS (
            SELECT doc_id, str_split(text, ' ') AS w FROM documents
        ),
        spans AS (
            SELECT doc_id, start,
                   md5(array_to_string(w[start:start+{SPAN_TOKENS - 1}], ' ')) AS fp
            FROM d, unnest(generate_series(1, len(w), {SPAN_TOKENS})) AS t(start)
            WHERE len(w) > 0
        ),
        marked AS (
            SELECT doc_id,
                   CASE WHEN row_number() OVER (
                            PARTITION BY fp ORDER BY doc_id, start) > 1
                        THEN 1 ELSE 0 END AS dup
            FROM spans
        )
        SELECT doc_id, count(*) AS n_spans,
               CAST(sum(dup) AS BIGINT) AS n_dup_spans,
               round(sum(dup) * 1.0 / count(*), 4) AS dup_frac
        FROM marked GROUP BY doc_id
    """,
    # replays the corpus-sized shard count (max(16, ceil(n/1024))) and the
    # md5 key arithmetic value-for-value
    "q_shuffle_shards": f"""
        WITH params AS (
            SELECT greatest({SHUFFLE_MIN_SHARDS},
                   CAST(ceil(count(*) * 1.0 / {SHUFFLE_DOCS_PER_SHARD}) AS BIGINT)) AS n
            FROM documents
        ), k AS (
            SELECT doc_id,
                   ('0x' || substr(md5('{SHUFFLE_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
            FROM documents
        )
        SELECT CAST(k % (SELECT n FROM params) AS BIGINT) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY k % (SELECT n FROM params) ORDER BY k, doc_id) AS INT) AS pos,
               doc_id
        FROM k
    """,
    "q_corpus_pipeline": """
        WITH b AS (
            SELECT quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM documents
        ), toks AS (
            SELECT source, n_chars, text,
                   string_split(text, ' ') AS w
            FROM documents
        ), g AS (
            SELECT source, n_chars,
                   len(w) AS n_tok,
                   len(list_distinct(w)) * 1.0 / len(w) AS ttr,
                   len(regexp_extract_all(text, '\\b(the|a|of|and|is|to|in)\\b')) * 1.0
                       / len(w) AS stop_ratio,
                   CASE WHEN len(w) >= 3 THEN
                       1 - (SELECT count(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                            FROM UNNEST(generate_series(1, len(w) - 2)) AS t(i)) * 1.0
                           / (len(w) - 2)
                   ELSE 0.0 END AS rep
            FROM toks
        ), scored AS (
            SELECT source, n_chars, rep,
                   0.4 * ttr + 0.3 * (1 - stop_ratio)
                       + 0.3 * (CASE WHEN n_tok BETWEEN 20 AND 1000
                                     THEN 1.0 ELSE 0.5 END) AS q
            FROM g
        )
        SELECT source,
               CASE WHEN q < 0.55 THEN 'low_quality'
                    WHEN rep > 0.2 THEN 'repetitive'
                    WHEN n_chars < lo OR n_chars > hi THEN 'length'
                    ELSE 'keep' END AS verdict,
               count(*) AS n_docs
        FROM scored, b
        GROUP BY 1, 2
    """,
    "q_dup_rate_by_source": """
        WITH d AS (
            SELECT source,
                   count(*) OVER (PARTITION BY
                       md5(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), 1, 200))
                   ) AS n_copies
            FROM documents
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
               round(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS dup_rate
        FROM d GROUP BY source
    """,
    "q_pack_sequences": """
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tok,
                   sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY source ORDER BY doc_id) AS cum
            FROM documents
        )
        SELECT doc_id, source,
               CAST(n_tok AS INT) AS n_tok,
               CAST(cum - n_tok AS BIGINT) AS start_off,
               CAST((cum - n_tok) // 512 AS BIGINT) AS bin,
               (cum - n_tok) // 512 <> (cum - 1) // 512 AS straddles
        FROM d
    """,
    "q_pack_efficiency": f"""
        WITH per AS (
            SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents
        ), agg AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   CAST(sum((n_tok + {PACK_BIN_TOKENS - 1}) // {PACK_BIN_TOKENS})
                        AS BIGINT) AS padded_bins
            FROM per GROUP BY source
        )
        SELECT source, n_docs, n_tokens, padded_bins,
               CAST((n_tokens + {PACK_BIN_TOKENS - 1}) // {PACK_BIN_TOKENS}
                    AS BIGINT) AS packed_bins,
               CAST(padded_bins
                    - (n_tokens + {PACK_BIN_TOKENS - 1}) // {PACK_BIN_TOKENS}
                    AS BIGINT) AS bins_saved,
               round(n_tokens / (((n_tokens + {PACK_BIN_TOKENS - 1})
                                  // {PACK_BIN_TOKENS}) * {PACK_BIN_TOKENS}.0), 4)
                   AS util_packed,
               round(n_tokens / (padded_bins * {PACK_BIN_TOKENS}.0), 4)
                   AS util_padded
        FROM agg
    """,
    # String-level shingles stand in for Spark's xxhash64 longs (equality
    # contract, same as q_decontaminate); min-over-partition replays the
    # first-occurrence window.
    "q_ngram_novelty": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            WHERE len(w) >= 3
        ), marked AS (
            SELECT doc_id, min(doc_id) OVER (PARTITION BY s) AS first_doc
            FROM sh
        )
        SELECT doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                          AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty
        FROM marked GROUP BY doc_id
    """,
    "q_source_overlap": """
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS w FROM documents
        ), sh AS (
            SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS s
            FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            WHERE len(w) >= 3
        ), sizes AS (
            SELECT source, count(*) AS n_sh FROM sh GROUP BY source
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2
        ), jac AS (
            SELECT src_a, src_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
                   CAST(n_common AS DOUBLE)
                       / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes sa ON src_a = sa.source
            JOIN sizes sb ON src_b = sb.source
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY jaccard DESC, src_a, src_b) AS INT) AS rank,
               src_a, src_b, n_common, n_a, n_b, round(jaccard, 6) AS jaccard
        FROM jac ORDER BY jaccard DESC, src_a, src_b LIMIT 20
    """,
    "q_decontaminate": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS s
            FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
            WHERE len(w) >= 4
        ), bench AS (
            SELECT DISTINCT s, doc_id AS bench_id FROM sh WHERE doc_id < 20
        )
        SELECT c.doc_id,
               count(DISTINCT c.s) AS n_shared_ngrams,
               count(DISTINCT b.bench_id) AS n_bench_docs
        FROM sh c JOIN bench b ON c.s = b.s
        WHERE c.doc_id >= 20
        GROUP BY c.doc_id
    """,
    "q_incremental_dedup": """
        WITH d AS (
            SELECT doc_id,
                   md5(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), 1, 200))
                       AS fp
            FROM documents
        ), b AS (
            SELECT (max(doc_id) + 1) * 4 // 5 AS cut FROM d
        ), corpus AS (
            SELECT DISTINCT fp FROM d, b WHERE doc_id < cut
        ), batch AS (
            SELECT doc_id, fp FROM d, b WHERE doc_id >= cut
        )
        SELECT min(doc_id) AS doc_id, fp
        FROM batch
        WHERE fp NOT IN (SELECT fp FROM corpus)
        GROUP BY fp
    """,
    "q_dedup_clusters": f"""
        WITH RECURSIVE {PAIRS_SQL_CTES},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM jpairs
            UNION ALL
            SELECT doc_b, doc_a FROM jpairs
        ),
        reach(u, r) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        )
        SELECT u AS doc_id, min(r) AS cluster_id, u = min(r) AS is_canonical
        FROM reach GROUP BY u
    """,
    "q_mix_rebalance": f"""
        WITH c AS (
            SELECT source, count(*) AS n_src FROM documents GROUP BY source
        ), m AS (
            SELECT min(n_src) AS m FROM c
        ), ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5('{MIX_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                                doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, source, CAST(rk AS INT) AS rk
        FROM ranked, m WHERE rk <= m.m
    """,
    "q_mix_rebalance_rate": f"""
        WITH c AS (
            SELECT source, count(*) AS n_src FROM documents GROUP BY source
        ), m AS (
            SELECT min(n_src) AS m FROM c
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN c ON d.source = c.source, m
        WHERE CAST(('0x' || substr(md5('{MIX_SEED}|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS DOUBLE) / 4294967296.0
              < CAST(m.m AS DOUBLE) / CAST(c.n_src AS DOUBLE)
    """,
    "q_canonical_docs": f"""
        WITH RECURSIVE {PAIRS_SQL_CTES},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM jpairs
            UNION ALL
            SELECT doc_b, doc_a FROM jpairs
        ),
        reach(u, r) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        ),
        members AS (
            SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
        ),
        ranked AS (
            SELECT m.cluster_id, m.doc_id, d.n_chars,
                   row_number() OVER (PARTITION BY m.cluster_id
                                      ORDER BY d.n_chars DESC, m.doc_id) AS rn
            FROM members m JOIN documents d ON m.doc_id = d.doc_id
        )
        SELECT cluster_id,
               min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
               count(*) AS n_members,
               max(CASE WHEN rn = 1 THEN n_chars END) AS chars_kept,
               CAST(sum(n_chars) - max(CASE WHEN rn = 1 THEN n_chars END)
                    AS BIGINT) AS chars_removed
        FROM ranked GROUP BY cluster_id
    """,
    "q_dedup_apply": f"""
        WITH RECURSIVE {PAIRS_SQL_CTES},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM jpairs
            UNION ALL
            SELECT doc_b, doc_a FROM jpairs
        ),
        reach(u, r) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        ),
        members AS (
            SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
        ),
        ranked AS (
            SELECT m.doc_id,
                   row_number() OVER (PARTITION BY m.cluster_id
                                      ORDER BY d.n_chars DESC, m.doc_id) AS rn
            FROM members m JOIN documents d ON m.doc_id = d.doc_id
        )
        SELECT d.doc_id, d.source, d.n_chars,
               CASE WHEN r.rn = 1 THEN 'canonical' ELSE 'singleton' END AS kept_as
        FROM documents d LEFT JOIN ranked r ON d.doc_id = r.doc_id
        WHERE r.doc_id IS NULL OR r.rn = 1
    """,
    # Full pipeline replay: pair graph → CC → per-cluster keeper → kept
    # corpus, then the SAME detector chain re-run over the kept corpus
    # (document frequencies recomputed on it, as the Spark side does).
    "q_dedup_verify": f"""
        WITH RECURSIVE {PAIRS_SQL_CTES},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM jpairs
            UNION ALL
            SELECT doc_b, doc_a FROM jpairs
        ),
        reach(u, r) AS (
            SELECT DISTINCT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        ),
        members AS (
            SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
        ),
        ranked AS (
            SELECT m.doc_id,
                   row_number() OVER (PARTITION BY m.cluster_id
                                      ORDER BY d.n_chars DESC, m.doc_id) AS rn
            FROM members m JOIN documents d ON m.doc_id = d.doc_id
        ),
        kept AS (
            SELECT d.doc_id, d.text
            FROM documents d LEFT JOIN ranked r ON d.doc_id = r.doc_id
            WHERE r.doc_id IS NULL OR r.rn = 1
        ),
        ktoks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM kept
        ), ksh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM ktoks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            WHERE len(w) >= 3
        ), kfiltered AS (
            SELECT * FROM ksh WHERE s NOT IN (
                SELECT s FROM ksh GROUP BY s HAVING count(*) > 50
            )
        ), kcounts AS (
            SELECT doc_id, count(*) AS n_sh FROM ksh GROUP BY doc_id
        ), kraw AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM kfiltered a JOIN kfiltered b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), kpairs AS (
            SELECT round(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4)
                       AS jaccard
            FROM kraw
            JOIN kcounts ca ON doc_a = ca.doc_id
            JOIN kcounts cb ON doc_b = cb.doc_id
            WHERE round(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4) >= 0.8
        )
        SELECT (SELECT count(*) FROM kept) AS n_docs_kept,
               count(*) AS n_residual_pairs,
               max(jaccard) AS max_residual_jaccard
        FROM kpairs
    """,
    "q_chunk_docs": """
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), s AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w), 24)) AS start
            FROM d WHERE len(w) > 0
        )
        SELECT doc_id,
               CAST((start - 1) / 24 AS INT) AS chunk_id,
               CAST(start AS INT) AS start,
               CAST(len(w[start:start+31]) AS INT) AS n_tokens,
               array_to_string(w[start:start+31], ' ') AS chunk_text
        FROM s
    """,
    "q_length_outliers": """
        WITH b AS (
            SELECT quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM documents
        )
        SELECT lang,
               CASE WHEN n_chars < lo THEN 'short'
                    WHEN n_chars > hi THEN 'long'
                    ELSE 'keep' END AS bucket,
               count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars
        FROM documents, b
        GROUP BY 1, 2
    """,
    "q_corpus_mix": """
        SELECT doc_id, source, n_chars,
               CAST(unnest(generate_series(1,
                   CASE WHEN source = 'src0' THEN 3
                        WHEN source = 'src1' THEN 2
                        ELSE 1 END)) AS INT) AS copy
        FROM documents
    """,
}


BOILER_DF_PERMILLE = 4  # a gram is corpus-commodity when df > this 0.1% of docs


def q_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-coverage audit: for every document, the fraction of its
    DISTINCT 3-gram shingles that are corpus-commodity phrases (document
    frequency above BOILER_DF_PERMILLE per mille of the corpus — a rate
    threshold, so the cut tracks corpus growth) — the CCNet/RefinedWeb
    governance signal that separates documents which are mostly template
    (navigation chrome, license headers, repeated disclaimers) from
    documents with substance. Order-free complement of q_ngram_novelty
    (whose first-occurrence attribution depends on ingest order) and of
    q_lcp_dedup (which needs an 8-token exact match): a doc built from
    common phrases scores high here even when no single long span repeats.

    Plan, 100 TB discipline: ONE distinct (doc, gram-fp) pass — the same
    cardinality every shingle query already pays — then document frequency
    as a count window keyed on the fp (no self-join), then one per-doc
    roll-up; the corpus doc count broadcasts as a 1-row aggregate. The
    threshold compares exact integers (df * 1000 > n_docs * PERMILLE — no
    float boundary), and the one division per doc rounds at 4 dp."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 3
    )
    pairs = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda p: F.md5(F.concat_ws(" ", F.slice("w", p, 3))),
                )
            )
        ).alias("fp"),
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    marked = pairs.select(
        "doc_id", F.count("*").over(W.partitionBy("fp")).alias("df")
    )
    return (
        marked.crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                (F.col("df") * 1000 > F.col("n_docs") * BOILER_DF_PERMILLE).cast("long")
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            # integer micro-units, not round(x, 4): engine round() diverges
            # on ulp-below-boundary doubles (the q_minhash_merge lesson)
            (
                F.round(F.col("n_boiler") / F.col("n_grams") * 10000).cast("long")
                / F.lit(10000.0)
            ).alias("boiler_frac"),
        )
    )


def q_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arg-max duplicated span per document, WITH its text — the
    report q_lcp_dedup's decide-to-trim table points at but doesn't show
    (round-12 survey worklist): for every document that contains at least
    one maximal duplicated span (>= LCP_GRAM tokens occurring elsewhere in
    the corpus, Lee et al. ACL 2022 exact-substring semantics), the
    longest such span's start position, length, and the span text itself —
    what a pipeline operator eyeballs before approving the trim list.

    Plan: identical gram/mark/island machinery as q_lcp_dedup (stride-1
    gram Generate, ONE count-over-fingerprint shuffle, per-doc island
    windows) with two additions that stay per-doc: a row_number window
    picks the longest island (earliest start breaks ties), and ONE
    doc_id-keyed join back to the token arrays reconstructs the span text
    — the wide text column never rides the fingerprint shuffle. Span
    arithmetic is integer-exact; there are no divisions at all."""
    k = LCP_GRAM
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= k
    )
    grams = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - (k - 1))).alias("p"),
        "w",
    ).select(
        "doc_id",
        "p",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("p"), k))).alias("fp"),
    )
    dups = grams.select(
        "doc_id",
        "p",
        (F.count("*").over(W.partitionBy("fp")) > 1).alias("dup"),
    ).filter("dup")
    wd = W.partitionBy("doc_id").orderBy("p")
    isl = dups.select(
        "doc_id",
        "p",
        F.sum(
            F.when(
                F.lag("p").over(wd).isNull() | (F.col("p") - F.lag("p").over(wd) > k),
                1,
            ).otherwise(0)
        ).over(wd.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("sid"),
    )
    spans = isl.groupBy("doc_id", "sid").agg(
        F.min("p").alias("s"), (F.max("p") + (k - 1)).alias("e")
    )
    # longest span as min(struct(s - e, s, e)) per doc (r14, guide §2.3):
    # (e - s) desc == (s - e) asc, ties to s asc — identical ranking to
    # the former row_number window, map-side combinable, no sort; e rides
    # along as payload (distinct islands never share s)
    winner = (
        spans.groupBy("doc_id")
        .agg(
            F.min(
                F.struct((F.col("s") - F.col("e")).alias("nl"), "s", "e")
            ).alias("best")
        )
        .select(
            "doc_id",
            F.col("best.s").alias("s"),
            F.col("best.e").alias("e"),
        )
    )
    return winner.join(d, "doc_id").select(
        "doc_id",
        F.col("s").cast("long").alias("span_start"),
        (F.col("e") - F.col("s") + 1).cast("long").alias("span_len"),
        F.concat_ws(
            " ", F.slice("w", F.col("s"), F.col("e") - F.col("s") + 1)
        ).alias("span_text"),
    )


ORACLE["q_boilerplate_coverage"] = f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), d AS (
            SELECT doc_id, w FROM toks WHERE len(w) >= 3
        ), pairs AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(list_slice(w, i, i + 2), ' ')) AS fp
            FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        ), nd AS (
            SELECT count(*) AS n_docs FROM d
        ), marked AS (
            SELECT doc_id, count(*) OVER (PARTITION BY fp) AS df FROM pairs
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN df * 1000 > n_docs * {BOILER_DF_PERMILLE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               CAST(round(sum(CASE WHEN df * 1000 > n_docs * {BOILER_DF_PERMILLE}
                              THEN 1 ELSE 0 END) * 1.0 / count(*) * 10000)
                    AS BIGINT) / 10000.0 AS boiler_frac
        FROM marked, nd
        GROUP BY doc_id
    """

ORACLE["q_longest_repeat"] = f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), d AS (
            SELECT doc_id, w FROM toks WHERE len(w) >= {LCP_GRAM}
        ), grams AS (
            SELECT doc_id, i AS p,
                   md5(array_to_string(
                       list_slice(w, i, i + {LCP_GRAM} - 1), ' ')) AS fp
            FROM d, UNNEST(generate_series(1, len(w) - {LCP_GRAM} + 1)) AS t(i)
        ), dups AS (
            SELECT doc_id, p,
                   CASE WHEN lag(p) OVER w IS NULL
                             OR p - lag(p) OVER w > {LCP_GRAM}
                        THEN 1 ELSE 0 END AS new_s
            FROM (
                SELECT doc_id, p,
                       count(*) OVER (PARTITION BY fp) > 1 AS dup
                FROM grams
            ) WHERE dup
            WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        ), isl AS (
            SELECT doc_id, p,
                   sum(new_s) OVER (PARTITION BY doc_id ORDER BY p
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM dups
        ), spans AS (
            SELECT doc_id, min(p) AS s, max(p) + {LCP_GRAM} - 1 AS e
            FROM isl GROUP BY doc_id, sid
        ), winner AS (
            SELECT doc_id, s, e,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY e - s DESC, s ASC) AS rk
            FROM spans
        )
        SELECT w.doc_id,
               CAST(w.s AS BIGINT) AS span_start,
               CAST(w.e - w.s + 1 AS BIGINT) AS span_len,
               array_to_string(list_slice(d.w, w.s, w.e), ' ') AS span_text
        FROM winner w JOIN d USING (doc_id)
        WHERE w.rk = 1
    """


def q_boilerplate_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE boilerplate attribution — whose templates pollute the
    pool (round-14 survey worklist): q_boilerplate_coverage scores each
    DOCUMENT's commodity-gram fraction; this rolls the same dictionary up
    by source and adds the governance column the per-doc view cannot give
    — how many commodity grams each source DOMINATES (contributes a strict
    majority of the gram's document frequency). A source with a high
    boiler_frac merely REUSES common templates; a source with many
    dominated grams is the one INJECTING its own boilerplate into the
    corpus — the crawler/format bug the mix planner should throttle first
    (CCNet-style governance, Wenzek et al. 2020).

    Semantics (exact integers end-to-end): over the same DISTINCT
    (doc, 3-gram-fp) incidence q_boilerplate_coverage builds, a gram is
    corpus-commodity when df * 1000 > n_docs * BOILER_DF_PERMILLE; per
    source,
      n_docs          token-bearing docs from the source
      n_hits          its (doc, gram) incidences
      n_boiler_hits   incidences on commodity grams
      boiler_frac     n_boiler_hits / n_hits, 1e-4 integer micro-units
      n_dominated     commodity grams where 2 * df_src > df (a strict
                      majority cannot be shared, so dominance is unique
                      per gram and sums to <= the commodity-gram count)

    Plan, 100 TB discipline: the distinct incidence pass is the same
    cardinality every shingle query pays; df and per-(fp, source) counts
    are combinable aggregates keyed on the gram fp (no self-join, no
    all-pairs); the corpus doc count is a 1-row broadcast; the final frame
    is config-sized (one row per source). The dominance join shuffles on
    fp — keyed and pre-aggregated, so candidates ~ vocabulary, not corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 3
    )
    pairs = d.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda p: F.md5(F.concat_ws(" ", F.slice("w", p, 3))),
                )
            )
        ).alias("fp"),
    ).persist()
    n_docs = d.agg(F.count("*").alias("n_docs_corpus"))
    # per-(gram, source) counts roll up to the gram's df: one combinable
    # aggregate feeds both the commodity cut and the dominance test
    src_df = pairs.groupBy("fp", "source").agg(F.count("*").alias("df_src"))
    gram_df = src_df.groupBy("fp").agg(F.sum("df_src").alias("df"))
    commodity = (
        gram_df.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 1000 > F.col("n_docs_corpus") * BOILER_DF_PERMILLE)
        .select("fp", "df")
    )
    hits = (
        pairs.join(commodity.select("fp", F.lit(True).alias("boiler")), "fp", "left")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_hits"),
            F.sum(F.col("boiler").isNotNull().cast("long")).alias("n_boiler_hits"),
        )
    )
    dominated = (
        src_df.join(commodity, "fp")
        .filter(F.col("df_src") * 2 > F.col("df"))
        .groupBy("source")
        .agg(F.count("*").alias("n_dominated"))
    )
    return hits.join(dominated, "source", "left").select(
        "source",
        "n_docs",
        "n_hits",
        "n_boiler_hits",
        (
            F.round(F.col("n_boiler_hits") / F.col("n_hits") * 10000).cast("long")
            / F.lit(10000.0)
        ).alias("boiler_frac"),
        F.coalesce("n_dominated", F.lit(0)).alias("n_dominated"),
    )


ORACLE["q_boilerplate_sources"] = f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        ), d AS (
            SELECT doc_id, source, w FROM toks WHERE len(w) >= 3
        ), pairs AS (
            SELECT DISTINCT doc_id, source,
                   md5(array_to_string(list_slice(w, i, i + 2), ' ')) AS fp
            FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        ), nd AS (
            SELECT count(*) AS n_docs_corpus FROM d
        ), src_df AS (
            SELECT fp, source, CAST(count(*) AS BIGINT) AS df_src
            FROM pairs GROUP BY fp, source
        ), gram_df AS (
            SELECT fp, CAST(sum(df_src) AS BIGINT) AS df
            FROM src_df GROUP BY fp
        ), commodity AS (
            SELECT fp, df FROM gram_df, nd
            WHERE df * 1000 > n_docs_corpus * {BOILER_DF_PERMILLE}
        ), hits AS (
            SELECT p.source,
                   CAST(count(DISTINCT p.doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_hits,
                   CAST(sum(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_boiler_hits
            FROM pairs p LEFT JOIN commodity c USING (fp)
            GROUP BY p.source
        ), dom AS (
            SELECT s.source, CAST(count(*) AS BIGINT) AS n_dominated
            FROM src_df s JOIN commodity c USING (fp)
            WHERE s.df_src * 2 > c.df
            GROUP BY s.source
        )
        SELECT h.source, h.n_docs, h.n_hits, h.n_boiler_hits,
               CAST(round(h.n_boiler_hits * 1.0 / h.n_hits * 10000) AS BIGINT)
                   / 10000.0 AS boiler_frac,
               coalesce(dom.n_dominated, 0) AS n_dominated
        FROM hits h LEFT JOIN dom USING (source)
    """


DEDUP_TTL_DOCS = 200  # retention horizon of the fingerprint index, in doc-clock minutes


def q_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL/retention sweep over the fingerprint index — the aging policy
    that makes q_incremental_dedup's state DEPLOYABLE at 100 TB/day
    (round-14 survey worklist): an unbounded fingerprint index grows
    forever, so production dedup keeps each fingerprint only for a
    retention horizon and accepts RE-ADMISSIONS (an expired duplicate
    re-enters the corpus) as the price of bounded state. This query runs
    the refresh-on-arrival policy — every arrival of a fingerprint
    refreshes its index entry, so a duplicate is dropped iff the SAME
    fingerprint arrived within the trailing DEDUP_TTL_DOCS window of the
    ingest clock (doc_id minutes; the TTL-cache policy, refreshed on
    access) — and MEASURES what the horizon costs: per document, the gap
    to the previous same-fingerprint arrival, whether it is kept, and
    whether it is a re-admission (kept despite an earlier expired copy —
    rows a horizonless index would have dropped). The companion
    first-arrival-eviction policy (state pinned to the first arrival,
    NOT refreshed by dropped duplicates) is exactly Spark's
    dropDuplicatesWithinWatermark and is exercised by q_stream_dedup_wm
    (operators/streamparity.py); refresh-on-arrival is its lag-expressible
    batch complement, and the two bound the real policy space.

    Plan, 100 TB discipline: one fingerprint projection on the scan
    (codegen'd regexp+md5, no UDF), ONE shuffle keyed on fp, and a lag
    window per fingerprint group (groups are duplicate-family-sized —
    bounded by content repetition, never corpus-scaled); every comparison
    is exact integer doc_id arithmetic, so the DuckDB twin replays it
    cell-for-cell."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    fp = F.md5(F.substring(F.lower(F.regexp_replace("text", r"\s+", " ")), 1, 200))
    d = docs.select("doc_id", fp.alias("fp"))
    w = W.partitionBy("fp").orderBy("doc_id")
    gap = F.col("doc_id") - F.lag("doc_id").over(w)
    return d.select(
        "doc_id",
        "fp",
        gap.alias("prev_gap"),
        (gap.isNull() | (gap > DEDUP_TTL_DOCS)).alias("kept"),
        (gap.isNotNull() & (gap > DEDUP_TTL_DOCS)).alias("readmitted"),
    )


def q_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-granularity cross-source overlap — q_source_overlap at
    LCP_GRAM-token exact-substring width (round-14 survey worklist): the
    3-gram shingle Jaccard finds topical/template similarity but DILUTES
    verbatim plagiarism (a wholesale copied paragraph contributes the same
    per-gram weight as scattered stock phrases); width-LCP_GRAM spans are
    the q_lcp_dedup match unit, so a cross-source span hit means an exact
    8-token substring shared verbatim — the mirror-site / scraped-re-post
    signal (Lee et al., ACL 2022 exact-substring dedup applied ACROSS
    sources). Adds the column the symmetric Jaccard cannot express:
    CONTAINMENT (n_common / min(|A|, |B|)) — the plagiarism-detection
    metric that stays high when a small source is wholly embedded in a
    large one while Jaccard vanishes (Broder 1997's two resemblance
    measures). Output: top-OVERLAP_TOP_K source pairs by containment.

    Scale shape, identical to q_source_overlap (shared fan-out bound):
    ONE corpus-sized shuffle keyed on the 8-byte span hash to
    collect_set(source) (set bounded by |sources|, combines map-side);
    pair expansion is the shared pairwise_set_counts map-side transform
    (<= C(|sources|, 2) per span); sizes broadcast. Ratios are exact
    int/int divisions quantized to 1e-6 integer micro-units in the same
    order in both engines (the q_minhash_merge rounding rule)."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    sets = (
        docs.select(
            "source",
            F.explode(
                full_shingle_hashes(tokens(F.col("text")), LCP_GRAM)
            ).alias("s"),
        )
        .groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .localCheckpoint(eager=True)
    )
    return _span_pair_ranking(sets)


def _span_pair_ranking(sets: DataFrame) -> DataFrame:
    """q_span_overlap's scoring tail over a prebuilt (span key -> sorted
    source set) table — factored out so q_span_attribution can feed it the
    SAME span incidence it already aggregates instead of re-expanding the
    corpus (r14, guide §1.2). The ranking depends only on set COUNTS, so
    any injective span key (xxhash64 of token hashes, md5 of the span
    text) produces the identical pair table."""
    sizes = (
        sets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sp"))
    )
    inter = pairwise_set_counts(sets, "srcs")
    scored = (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_a"), F.col("n_sp").alias("n_a"))
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("n_sp").alias("n_b"))
            ),
            "src_b",
        )
        .withColumn(
            "containment",
            F.round(
                F.col("n_common")
                / F.least("n_a", "n_b")
                * 1000000
            ).cast("long")
            / F.lit(1000000.0),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                * 1000000
            ).cast("long")
            / F.lit(1000000.0),
        )
    )
    order = [
        F.col("containment").desc(),
        F.col("jaccard").desc(),
        F.col("src_a"),
        F.col("src_b"),
    ]
    top = scored.orderBy(*order).limit(OVERLAP_TOP_K)
    w_r = W.orderBy(*order)
    return top.select(
        F.row_number().over(w_r).alias("rank"),
        "src_a",
        "src_b",
        "n_common",
        "n_a",
        "n_b",
        "containment",
        "jaccard",
    )


# Span sets replayed on the raw 8-token substring (hash VALUES never
# surface, so DuckDB dedups on the string itself, exactly like the
# q_source_overlap oracle); containment/jaccard are int/int divisions
# quantized to micro-units in the same order.
ORACLE["q_span_overlap"] = f"""
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS w FROM documents
        ), sh AS (
            SELECT DISTINCT source,
                   array_to_string(w[i:i+{LCP_GRAM - 1}], ' ') AS s
            FROM toks, UNNEST(generate_series(1, len(w) - {LCP_GRAM - 1}))
                 AS t(i)
            WHERE len(w) >= {LCP_GRAM}
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_sp
            FROM sh GROUP BY source
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2
        ), scored AS (
            SELECT src_a, src_b, n_common, sa.n_sp AS n_a, sb.n_sp AS n_b,
                   CAST(round(n_common * 1.0 / least(sa.n_sp, sb.n_sp)
                              * 1000000) AS BIGINT) / 1000000.0
                       AS containment,
                   CAST(round(n_common * 1.0
                              / (sa.n_sp + sb.n_sp - n_common)
                              * 1000000) AS BIGINT) / 1000000.0 AS jaccard
            FROM inter
            JOIN sizes sa ON src_a = sa.source
            JOIN sizes sb ON src_b = sb.source
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY containment DESC, jaccard DESC, src_a, src_b)
                   AS INT) AS rank,
               src_a, src_b, n_common, n_a, n_b, containment, jaccard
        FROM scored
        ORDER BY containment DESC, jaccard DESC, src_a, src_b
        LIMIT {OVERLAP_TOP_K}
    """


ORACLE["q_dedup_ttl"] = f"""
        WITH d AS (
            SELECT doc_id,
                   md5(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')),
                       1, 200)) AS fp
            FROM documents
        ), g AS (
            SELECT doc_id, fp,
                   doc_id - lag(doc_id) OVER (PARTITION BY fp ORDER BY doc_id)
                       AS prev_gap
            FROM d
        )
        SELECT doc_id, fp, CAST(prev_gap AS BIGINT) AS prev_gap,
               (prev_gap IS NULL OR prev_gap > {DEDUP_TTL_DOCS}) AS kept,
               (prev_gap IS NOT NULL AND prev_gap > {DEDUP_TTL_DOCS})
                   AS readmitted
        FROM g
    """


SPAN_PAIR_TOP = 3  # source pairs drilled into (by span containment rank)
SPAN_TOP = 5  # shared spans reported per pair


def q_span_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-overlap DRILL-DOWN — the evidence view behind q_span_overlap's
    ranking (round-14 survey worklist): for the top-SPAN_PAIR_TOP source
    pairs by span containment, the SPAN_TOP most widely shared verbatim
    LCP_GRAM-token spans, with per-side document attribution (how many
    docs of each source carry the span). q_span_overlap says WHICH pairs
    leak; this says WHAT text leaks and how broadly — the row a governance
    reviewer actually reads before throttling a source (the shared spans
    are usually one template or one syndicated article, and doc counts
    separate boilerplate from a single mirrored page).

    Feeds from q_span_overlap's OWN ranking tail (_span_pair_ranking,
    rank <= SPAN_PAIR_TOP) applied to the span incidence this query
    already builds, so "top pair" can never drift between the two queries
    — the q_ann_index_delete composition discipline without paying the
    corpus expansion twice (r14).

    Scale: the (doc, source, span) incidence is the same distinct
    fan-out every span query pays, aggregated ONCE keyed on the span
    fingerprint (per-(fp, source) doc counts are combinable; the span
    TEXT rides along as min() — fp is md5 of the text, so min = the
    text); the pair filter is a broadcast of a <= SPAN_PAIR_TOP-row
    frame; the per-pair window runs on pair-filtered rows (shared spans
    only — bounded by the overlap the top pairs actually have). Output
    is config-sized: <= SPAN_PAIR_TOP x SPAN_TOP rows."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    w = tokens(F.col("text"))
    spans = F.array_distinct(
        F.when(
            F.size(w) >= LCP_GRAM,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (LCP_GRAM - 1)),
                lambda p: F.concat_ws(" ", F.slice(w, p, LCP_GRAM)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    inc = docs.select(
        "doc_id", "source", F.explode(spans).alias("sp")
    ).select("source", F.md5("sp").alias("fp"), "sp")
    # ONE corpus expansion + ONE corpus-sized shuffle for the whole query
    # (r14, guide §1.2): per_src is pinned and feeds BOTH the pair ranking
    # (via the derived source sets — _span_pair_ranking depends only on
    # counts, so the md5 span key ranks identically to q_span_overlap's
    # xxhash64 key) and the per-side attribution. Before, the top pairs
    # came from q_span_overlap(spark, sf_dir), which re-tokenized and
    # re-expanded the corpus a second time.
    per_src = (
        inc.groupBy("fp", "source")
        .agg(F.count("*").alias("n_docs"), F.min("sp").alias("span"))
        .localCheckpoint(eager=True)
    )
    sets = per_src.groupBy("fp").agg(
        F.sort_array(F.collect_set("source")).alias("srcs")
    )
    pairs = (
        _span_pair_ranking(sets)
        .filter(F.col("rank") <= SPAN_PAIR_TOP)
        .select(F.col("rank").alias("pair_rank"), "src_a", "src_b")
    )
    pa = per_src.select(
        "fp",
        F.col("source").alias("src_a"),
        F.col("n_docs").alias("n_docs_a"),
        "span",
    )
    pb = per_src.select(
        "fp", F.col("source").alias("src_b"), F.col("n_docs").alias("n_docs_b")
    )
    shared = pa.join(pb, "fp").join(F.broadcast(pairs), ["src_a", "src_b"])
    w_p = W.partitionBy("pair_rank").orderBy(
        (F.col("n_docs_a") + F.col("n_docs_b")).desc(), "span"
    )
    return (
        shared.withColumn("span_rank", F.row_number().over(w_p))
        .filter(F.col("span_rank") <= SPAN_TOP)
        .select(
            "pair_rank",
            "src_a",
            "src_b",
            "span_rank",
            "span",
            "n_docs_a",
            "n_docs_b",
        )
    )


# Replays the q_span_overlap ranking (same CTE chain) to pick the top
# pairs, then attributes shared spans on the raw span text — doc counts
# are exact integers; ordering ties break on the span string itself.
ORACLE["q_span_attribution"] = f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, source,
                   array_to_string(w[i:i+{LCP_GRAM - 1}], ' ') AS s
            FROM toks, UNNEST(generate_series(1, len(w) - {LCP_GRAM - 1}))
                 AS t(i)
            WHERE len(w) >= {LCP_GRAM}
        ), src_sh AS (
            SELECT DISTINCT source, s FROM sh
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_sp
            FROM src_sh GROUP BY source
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM src_sh a JOIN src_sh b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2
        ), scored AS (
            SELECT src_a, src_b,
                   CAST(round(n_common * 1.0 / least(sa.n_sp, sb.n_sp)
                              * 1000000) AS BIGINT) / 1000000.0
                       AS containment,
                   CAST(round(n_common * 1.0
                              / (sa.n_sp + sb.n_sp - n_common)
                              * 1000000) AS BIGINT) / 1000000.0 AS jaccard
            FROM inter
            JOIN sizes sa ON src_a = sa.source
            JOIN sizes sb ON src_b = sb.source
        ), top_pairs AS (
            SELECT CAST(row_number() OVER (
                       ORDER BY containment DESC, jaccard DESC, src_a,
                                src_b) AS INT) AS pair_rank,
                   src_a, src_b
            FROM scored
            ORDER BY containment DESC, jaccard DESC, src_a, src_b
            LIMIT {SPAN_PAIR_TOP}
        ), per_src AS (
            SELECT source, s, CAST(count(*) AS BIGINT) AS n_docs
            FROM sh GROUP BY source, s
        ), shared AS (
            SELECT tp.pair_rank, tp.src_a, tp.src_b, a.s AS span,
                   a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
            FROM top_pairs tp
            JOIN per_src a ON a.source = tp.src_a
            JOIN per_src b ON b.source = tp.src_b AND b.s = a.s
        ), ranked AS (
            SELECT pair_rank, src_a, src_b,
                   CAST(row_number() OVER (
                       PARTITION BY pair_rank
                       ORDER BY n_docs_a + n_docs_b DESC, span) AS INT)
                       AS span_rank,
                   span, n_docs_a, n_docs_b
            FROM shared
        )
        SELECT pair_rank, src_a, src_b, span_rank, span, n_docs_a, n_docs_b
        FROM ranked WHERE span_rank <= {SPAN_TOP}
    """


# temperature-smoothed token-budget allocation (UniMax-style):
# budget = UNIMAX_BUDGET_NUM/DEN x available tokens, per-source repetition
# capped at UNIMAX_MAX_EPOCHS. 39/20 (=1.95x) with cap 2 puts the budget
# strictly inside the band where smoothing direction decides cappedness,
# so BOTH arms are live at every SF (measured: 8/7/2 of 20 sources capped
# at sf0.001/0.01/0.1) — the never-fires lesson applied at birth.
UNIMAX_BUDGET_NUM = 39
UNIMAX_BUDGET_DEN = 20
UNIMAX_MAX_EPOCHS = 2


def unimax_allocate(per: DataFrame) -> DataFrame:
    """The closed-form UniMax waterfilling over a per-source census frame
    (source, n_docs, n_tokens) — shared by q_token_budget and its
    streaming twin q_stream_token_budget (one implementation). See
    q_token_budget's docstring for the full derivation; everything here
    runs on the config-sized per-source frame."""
    w_all = W.partitionBy()
    per = per.withColumn("tot", F.sum("n_tokens").over(w_all)).withColumn(
        "w",
        F.round(F.sqrt(F.col("n_tokens") / F.col("tot")) * 1000000).cast(
            "long"
        ),
    )
    per = (
        per.withColumn("wt", F.sum("w").over(w_all))
        .withColumn(
            "budget",
            F.expr(
                f"CAST({UNIMAX_BUDGET_NUM} * tot div {UNIMAX_BUDGET_DEN}"
                " AS BIGINT)"
            ),
        )
        .withColumn("cap", F.lit(UNIMAX_MAX_EPOCHS) * F.col("n_tokens"))
    )
    w_ord = w_all.orderBy((F.col("cap") / F.col("w")).asc(), "source")
    prev = w_ord.rowsBetween(W.unboundedPreceding, -1)
    per = per.withColumn(
        "cumc_prev", F.coalesce(F.sum("cap").over(prev), F.lit(0))
    ).withColumn("cumw_prev", F.coalesce(F.sum("w").over(prev), F.lit(0)))
    # 38-digit decimals, not int64: cap * wt reaches ~2 * n_tokens * 1e6 *
    # |sources| and wraps int64 once a source holds ~2.3e11 tokens (~1 TB
    # of text) — decimal(38,0) here and HUGEINT in the oracles keep the
    # cross-multiplied test exact at the 100 TB scale the docstring
    # claims (review finding; same fix as q_ann_rebalance)
    dec = "decimal(38,0)"
    per = per.withColumn(
        "capped",
        F.col("cap").cast(dec) * (F.col("wt") - F.col("cumw_prev"))
        <= (F.col("budget") - F.col("cumc_prev")).cast(dec) * F.col("w"),
    )
    per = per.withColumn(
        "cumc_m",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))).over(w_all), F.lit(0)
        ),
    ).withColumn(
        "cumw_m",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("w"))).over(w_all), F.lit(0)
        ),
    )
    lam = F.when(
        F.col("wt") > F.col("cumw_m"),
        (F.col("budget") - F.col("cumc_m")) / (F.col("wt") - F.col("cumw_m")),
    ).otherwise(F.lit(0.0))
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(
        F.round(lam * F.col("w")).cast("long")
    )
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("w") / F.lit(1000000.0)).alias("weight"),
        F.round(F.col("budget") / F.col("wt") * F.col("w"))
        .cast("long")
        .alias("naive_tokens"),
        F.col("cap").alias("cap_tokens"),
        "capped",
        alloc.alias("alloc_tokens"),
        (
            F.round(alloc / F.col("n_tokens") * 10000).cast("long")
            / F.lit(10000.0)
        ).alias("epochs"),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed TOKEN-BUDGET allocation with repetition caps —
    the planning table a training-mix recipe actually ships (round-14
    survey worklist): given a token budget B (a fixed multiple of the
    corpus's available tokens, so the query is scale-free), allocate it
    across sources by temperature-smoothed token share, but cap every
    source at UNIMAX_MAX_EPOCHS repetitions of its real data and
    REDISTRIBUTE the excess to uncapped sources — the UniMax allocation
    (Chung et al., "UniMax: Fairer and More Effective Language Sampling
    for Large-Scale Multilingual Pretraining", ICLR 2023; temperature
    smoothing per mT5, Xue et al. 2021). Smoothing exponent is pinned at
    alpha = 0.5 and computed as sqrt: IEEE sqrt is correctly rounded in
    both engines, pow() is not — the cross-engine-exactness rule decides
    the hyperparameter's representation.

    The waterfilling solves a_s = min(cap_s, lambda * w_s) with
    sum a_s = B in CLOSED FORM with window functions — no driver-side
    loop: sources sort by cap/w (the fill ratio; a single correctly-
    rounded int/int division, deterministic in both engines), and source
    k is capped iff cap_k * (W - cumw_{k-1}) <= (B - cumc_{k-1}) * w_k —
    the prefix characterization cross-multiplied into PURE INTEGER
    arithmetic (exact in int64 far past any real corpus). lambda then
    comes off the capped prefix's totals in one division. Per source:
      n_docs, n_tokens   the real data
      weight             sqrt-smoothed share, 1e-6 units
      naive_tokens       cap-free allocation B * w / W (what plain
                         temperature sampling would take)
      cap_tokens         UNIMAX_MAX_EPOCHS * n_tokens
      capped             hit the repetition cap (excess redistributed)
      alloc_tokens       the final allocation (cap, or round(lambda * w))
      epochs             alloc / n_tokens, 1e-4 units — the per-source
                         repetition factor the data loader executes

    Plan: one scan with a codegen'd regexp token count, ONE combinable
    groupBy(source); everything after runs on the config-sized per-source
    frame (|sources| rows — the window sorts 20 rows, not the corpus).
    At 100 TB this is the exact shape: the corpus pass is the token
    census you already run, the allocation is free."""
    from kitkat_spark.operators.textops import TOKEN_RE

    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    per = (
        docs.select(
            "source",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
            ).cast("long").alias("t"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("n_tokens"))
    )
    return unimax_allocate(per)



# Replays the census, the sqrt-smoothed integer weights, the integer
# cross-multiplied capped-prefix test, and the closed-form lambda — every
# comparison exact, every division a single correctly-rounded IEEE op on
# identically-valued operands.
def _unimax_ctes_sql(census: str) -> str:
    """The UniMax allocation CTE chain (per -> alloc) over a census CTE
    named ``tok`` with columns (source, t) — shared verbatim by
    q_token_budget, q_stream_token_budget, and q_budget_realize so the
    allocation arithmetic can never drift between their oracles."""
    return census + f"""), per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(t) AS BIGINT) AS n_tokens
            FROM tok GROUP BY source
        ), wts AS (
            SELECT *,
                   CAST(sum(n_tokens) OVER () AS BIGINT) AS tot
            FROM per
        ), wtd AS (
            SELECT *,
                   CAST(round(sqrt(n_tokens * 1.0 / tot) * 1000000)
                        AS BIGINT) AS w,
                   {UNIMAX_MAX_EPOCHS} * n_tokens AS cap
            FROM wts
        ), full_w AS (
            SELECT *,
                   CAST(sum(w) OVER () AS BIGINT) AS wt,
                   CAST({UNIMAX_BUDGET_NUM} * tot // {UNIMAX_BUDGET_DEN}
                        AS BIGINT) AS budget,
                   coalesce(CAST(sum(cap) OVER (
                       ORDER BY cap * 1.0 / w, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS cumc_prev,
                   coalesce(CAST(sum(w) OVER (
                       ORDER BY cap * 1.0 / w, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS cumw_prev
            FROM wtd
        ), flagged AS (
            SELECT *,
                   cap::HUGEINT * (wt - cumw_prev)
                       <= (budget - cumc_prev)::HUGEINT * w AS capped
            FROM full_w
        ), folded AS (
            SELECT *,
                   coalesce(CAST(sum(CASE WHEN capped THEN cap END)
                       OVER () AS BIGINT), 0) AS cumc_m,
                   coalesce(CAST(sum(CASE WHEN capped THEN w END)
                       OVER () AS BIGINT), 0) AS cumw_m
            FROM flagged
        ), alloc AS (
            SELECT *,
                   CASE WHEN capped THEN cap
                        ELSE CAST(round(
                            CASE WHEN wt > cumw_m
                                 THEN (budget - cumc_m) * 1.0 / (wt - cumw_m)
                                 ELSE 0.0 END * w) AS BIGINT)
                   END AS alloc_tokens
            FROM folded
        )"""


ORACLE["q_token_budget"] = _unimax_ctes_sql("""
        WITH tok AS (
            SELECT source,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS t
            FROM documents
        """) + """
        SELECT source, n_docs, n_tokens,
               w / 1000000.0 AS weight,
               CAST(round(budget * 1.0 / wt * w) AS BIGINT) AS naive_tokens,
               cap AS cap_tokens,
               capped,
               alloc_tokens,
               CAST(round(alloc_tokens * 1.0 / n_tokens * 10000) AS BIGINT)
                   / 10000.0 AS epochs
        FROM alloc
    """

REALIZE_SALT = "realize1"  # acceptance-hash salt for the fractional epoch


def q_budget_realize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget REALIZATION audit — the sampler that EXECUTES
    q_token_budget's allocation and proves the plan survives contact with
    actual documents (round-14 survey worklist): per source, every doc is
    replicated floor(alloc / T_s) times (the whole epochs), and one extra
    fractional epoch admits each doc iff md5(doc_id:source:salt) mod T_s
    < alloc mod T_s — deterministic acceptance with probability EXACTLY
    (alloc mod T_s) / T_s in expectation over the 60-bit hash (modulo
    bias <= T_s / 2^60, immaterial), and byte-reproducible by the oracle,
    so realized token counts are exact integers, not a tolerance band.
    This is the per-doc decision a data loader actually ships (the
    deterministic-salt acceptance of q_sample_split applied to epoch
    scheduling); the audit columns quantify the one gap a plan-level view
    cannot see — the fractional layer samples DOCS uniformly, but tokens
    arrive in doc-sized lumps, so realized_tokens wobbles around
    alloc_tokens by the token-weight of the marginal accepted docs.

    Per source, all exact integers except the two quantized ratios:
      planned_tokens    q_token_budget's alloc (capped waterfilling)
      base_epochs       floor(alloc / T_s) whole passes over the source
      n_extra_docs      docs admitted by the fractional layer
      realized_tokens   base_epochs * T_s + sum of admitted docs' tokens
      realized_epochs   realized / T_s, 1e-4 units
      rel_err           (realized - planned) / planned, 1e-6 units — the
                        doc-lumpiness error the loader tolerates

    Plan: ONE extra scan beyond the census (the per-doc accept is a
    codegen'd md5 + integer mod against the broadcast 20-row allocation),
    one combinable groupBy(source). Composes with q_token_budget the way
    q_dedup_apply composes with q_canonical_docs: plan, then execute,
    then verify the execution against the plan."""
    from kitkat_spark.functions.text import md5_long
    from kitkat_spark.operators.textops import TOKEN_RE

    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par)
    plan = q_token_budget(spark, sf_dir).select(
        "source",
        F.col("n_tokens").alias("t_src"),
        F.col("alloc_tokens").alias("planned_tokens"),
        "capped",
    )
    d = docs.select(
        "doc_id",
        "source",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
        ).cast("long").alias("t"),
    ).join(F.broadcast(plan), "source")
    accept = (
        md5_long(
            F.concat_ws(":", F.col("doc_id"), F.col("source"), F.lit(REALIZE_SALT))
        )
        % F.col("t_src")
        < F.col("planned_tokens") % F.col("t_src")
    )
    agg = d.groupBy("source", "t_src", "planned_tokens", "capped").agg(
        F.count("*").alias("n_docs"),
        F.sum(accept.cast("long")).alias("n_extra_docs"),
        F.sum(F.when(accept, F.col("t")).otherwise(F.lit(0))).alias(
            "extra_tokens"
        ),
    )
    base = F.expr("planned_tokens div t_src")
    realized = base * F.col("t_src") + F.col("extra_tokens")
    return agg.select(
        "source",
        "n_docs",
        F.col("t_src").alias("n_tokens"),
        "planned_tokens",
        "capped",
        base.cast("long").alias("base_epochs"),
        "n_extra_docs",
        realized.alias("realized_tokens"),
        (
            F.round(realized / F.col("t_src") * 10000).cast("long")
            / F.lit(10000.0)
        ).alias("realized_epochs"),
        (
            F.round(
                (realized - F.col("planned_tokens"))
                / F.col("planned_tokens")
                * 1000000
            ).cast("long")
            / F.lit(1000000.0)
        ).alias("rel_err"),
    )


# The allocation CTE chain shared verbatim with q_token_budget's oracle,
# then the deterministic acceptance replayed per doc: the same md5-mod
# arithmetic (('0x' || md5-prefix)::BIGINT is md5_long), same integer
# aggregates, same quantized ratios.
ORACLE["q_budget_realize"] = _unimax_ctes_sql("""
        WITH tok AS (
            SELECT source,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS t
            FROM documents
        """) + f"""
        , plan AS (
            SELECT source, n_tokens AS t_src, alloc_tokens AS planned_tokens,
                   capped
            FROM alloc
        ), d AS (
            SELECT doc.doc_id, doc.source,
                   CAST(len(regexp_extract_all(doc.text,
                       '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS t,
                   p.t_src, p.planned_tokens, p.capped,
                   ('0x' || substr(md5(doc.doc_id || ':' || doc.source
                        || ':{REALIZE_SALT}'), 1, 15))::BIGINT % p.t_src
                       < p.planned_tokens % p.t_src AS accept
            FROM documents doc JOIN plan p USING (source)
        ), agg AS (
            SELECT source, t_src, planned_tokens, capped,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN accept THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_extra_docs,
                   CAST(sum(CASE WHEN accept THEN t ELSE 0 END) AS BIGINT)
                       AS extra_tokens
            FROM d GROUP BY source, t_src, planned_tokens, capped
        )
        SELECT source, n_docs, t_src AS n_tokens, planned_tokens, capped,
               planned_tokens // t_src AS base_epochs,
               n_extra_docs,
               (planned_tokens // t_src) * t_src + extra_tokens
                   AS realized_tokens,
               CAST(round(((planned_tokens // t_src) * t_src + extra_tokens)
                          * 1.0 / t_src * 10000) AS BIGINT) / 10000.0
                   AS realized_epochs,
               CAST(round(((planned_tokens // t_src) * t_src + extra_tokens
                           - planned_tokens) * 1.0 / planned_tokens
                          * 1000000) AS BIGINT) / 1000000.0 AS rel_err
        FROM agg
    """
