"""Distributed connected components: the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — public literature), expressed as DataFrame rounds.

Why not min-label propagation? Label propagation converges in O(graph
diameter) rounds — fine for near-dup clusters (diameter ~3) but a stall on
the long chains a 100 TB corpus can produce (doc A near-dups B near-dups C
...). The star algorithm contracts the graph toward a star forest and
converges in O(log^2 n) rounds REGARDLESS of diameter, with every round a
constant number of shuffles. This replaces the fixed-iteration-cap risk
flagged in round 3 (corpus.py min-label needed a convergence assert; this
needs far fewer rounds to hit it).

Round structure (each phase is one groupBy + one join, keyed on node id):

- large-star(u): with m(u) = min(N(u) ∪ {u}), connect every LARGER
  neighbor v > u directly to m(u). Long tails hanging off u re-attach to
  u's smallest neighbor — path lengths roughly halve.
- small-star(u): with N⁻(u) = {v ∈ N(u) : v < u} and m = min(N⁻(u)),
  connect u and every smaller neighbor to m. Edges canonicalize into
  (bigger → smaller) star edges.

At the fixed point the edge set IS the answer: every edge is
(node → component-min). Monotone witness: the edge set only moves toward
the star forest, so a stable (count, content-hash) pair across one full
round means convergence — one cheap 1-row agg per round, same pattern as
the min-label sum witness.

Scale notes: every phase shuffles on the node id (the natural key); edges
are 2 longs on the wire; each round is localCheckpoint'ed to truncate the
O(rounds) lineage (standard iterative-algorithm hygiene, same as GraphX).
Skewed high-degree nodes (a hub attached to millions) concentrate one
groupBy key; AQE's skew split handles the sort, and the emitted edges
re-key by the NEIGHBOR id, so the skew does not propagate round-to-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_STAR_MAX_ITER = 50  # ~log^2(n) rounds: 50 covers n ~ 2^7e3 — unreachable


def _large_star(sym: DataFrame) -> DataFrame:
    """(u,v) symmetric edges -> large-star edges, canonical (a > m)."""
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m"))
        .filter(F.col("a") != F.col("m"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(a,m) canonical edges (a > m) -> small-star edges, still canonical."""
    minn = edges.groupBy("a").agg(F.min("m").alias("mn"))
    j = edges.join(minn, "a")
    rewired = j.filter(F.col("m") != F.col("mn")).select(
        F.col("m").alias("a"), F.col("mn").alias("m")
    )
    anchors = minn.select(F.col("a"), F.col("mn").alias("m"))
    return rewired.union(anchors).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = CC_STAR_MAX_ITER,
) -> DataFrame:
    """(u, label) for every node in the undirected edge list; label is the
    minimum node id in the component. Output schema matches the min-label
    formulation it replaces (corpus.connected_components callers)."""
    e0 = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("m"))
        .filter(F.col("a") != F.col("m"))
        .select(
            F.greatest("a", "m").alias("a"), F.least("a", "m").alias("m")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = e0
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        sym = cur.select(F.col("a").alias("u"), F.col("m").alias("v")).union(
            cur.select(F.col("m").alias("u"), F.col("a").alias("v"))
        )
        cur = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        sig = tuple(
            cur.agg(
                F.count("*"),
                # decimal accumulator: a long sum of 64-bit hashes overflows
                # (ANSI mode raises); decimal(38,0) holds 2^63 * 10^18 rows
                F.sum(F.xxhash64(F.struct("a", "m")).cast("decimal(38,0)")),
            ).collect()[0]
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — not expected for any graph with < 2^100 nodes; "
            "check the edge list for pathological growth"
        )
    roots = cur.select(F.col("m").alias("u")).distinct().withColumn(
        "label", F.col("u")
    )
    members = cur.select(F.col("a").alias("u"), F.col("m").alias("label"))
    labels = members.union(roots).distinct()
    # nodes that only ever appeared in self-loops dropped out of e0; they are
    # their own singleton components
    all_nodes = (
        edges.select(F.col(src).alias("u"))
        .union(edges.select(F.col(dst).alias("u")))
        .distinct()
    )
    singletons = all_nodes.join(labels, "u", "left_anti").withColumn(
        "label", F.col("u")
    )
    return labels.union(singletons)


def q_cc_chain(spark, sf_dir):
    """Driver-verified deep-diameter connected components: documents chained
    by consecutive doc_id (one path graph, diameter = corpus size - 1),
    labeled through corpus.connected_components with a round budget far
    below the diameter — so the min-label fast path CANNOT finish and the
    star fallback must produce the answer. The oracle is closed-form
    (every node's component-min is the global min doc_id), giving an exact
    cross-engine check of an iterative algorithm no SQL recursion could
    replay at this depth.

    The lead() edge derivation is verification scaffolding (a global-order
    window — fine for building a known graph, never a pattern for real
    edge lists); the operator under test is the CC iteration, whose rounds
    are all key-partitioned shuffles."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kitkat_spark.operators.corpus import connected_components
    from kitkat_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.withColumn("nxt", F.lead("doc_id").over(W.orderBy("doc_id")))
        .filter(F.col("nxt").isNotNull())
    )
    cc = connected_components(edges, src="doc_id", dst="nxt", max_iter=3)
    return cc.select(F.col("u").alias("doc_id"), "label")


PR_ITERS = 3
PR_SCALE = 1_000_000  # rank unit: 1.0 == 1e6 (fixed-point int64)


def pagerank_fixed(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED edge list, in exact
    fixed-point int64 arithmetic so the result is bit-identical across
    engines and shuffle layouts.

    Floating-point PageRank is not oracle-checkable: the per-node sum of
    neighbor contributions is order-dependent in IEEE doubles, and iterating
    compounds the divergence. Instead ranks live as int64 micro-units
    (1.0 == 1e6) and every step is integer arithmetic with truncating
    division — associative, commutative, deterministic:

        contrib(u) = rank(u) div deg(u)
        rank'(v)   = 0.15*SCALE + (850 * sum_in(contrib)) div 1000

    Plan per iteration: ONE join (edges ⋈ ranks, both keyed on the node id)
    + ONE partial-aggregated groupBy on the destination — the minimal
    shuffle shape for message passing. The degree is attached to the edge
    list ONCE up front (`sym`), so iterations never re-aggregate it; `sym`
    is localCheckpoint'ed to keep each iteration's lineage flat. High-degree
    hubs concentrate one groupBy key; the sum combines map-side, so the
    skew cost is bounded by partial-agg merge, not row movement. Symmetric
    edges mean every node has in-degree >= 1 — no dangling-mass term.

    At 100 TB this is the GraphX/Pregel layout expressed in DataFrames:
    edges co-partition with ranks on the node key, per-iteration cost is
    |E| shuffle bytes, and the iteration count is fixed (power iteration
    converges geometrically; 3 rounds is the verification setting — a
    production run raises `iters`, the shape is identical).
    """
    # canonicalize (u < v) and dedupe BEFORE symmetrizing: the reversed
    # branch then has u > v everywhere, so the union is duplicate-free by
    # construction — the distinct runs on |E| rows, not 2|E|
    canon = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = canon.union(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # degree via a partitionBy-window, not groupBy+join-back: ONE shuffle
    # both attaches deg to every edge AND leaves the table hash-partitioned
    # on the join key (no orderBy -> no sort, just a whole-partition count).
    # The eager checkpoint retains that partitioning, so each iteration's
    # sym ⋈ ranks join exchanges only the (node, rank) side — the |E|-row
    # edge table is shuffled once for the whole run, not once per round.
    from pyspark.sql import Window as W

    sym = sym.withColumn(
        "deg", F.count("*").over(W.partitionBy("u"))
    ).localCheckpoint(eager=True)
    ranks = (
        sym.select("u")
        .distinct()
        .select("u", F.lit(PR_SCALE).cast("long").alias("rank"))
    )
    for _ in range(iters):
        contribs = sym.join(ranks, "u").select(
            F.col("v").alias("node"),
            F.expr("rank div deg").alias("contrib"),
        )
        ranks = (
            contribs.groupBy("node")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("node").alias("u"),
                (F.lit(150_000) + F.expr("(850 * s) div 1000")).alias("rank"),
            )
        )
    return ranks


def q_pagerank(spark, sf_dir):
    """PageRank over the customer–supplier trade graph: an edge links a
    customer to every supplier that shipped one of its orders (distinct
    pairs via orders ⋈ lineitem). Node ids interleave (cust*2, supp*2+1) so
    the two key spaces stay disjoint. 3 exact fixed-point iterations; the
    DuckDB oracle unrolls the same three message-passing rounds as CTEs —
    a value-level cross-engine check of an iterative graph algorithm.
    """
    from kitkat_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    )
    # no .distinct() here: pagerank_fixed canonicalizes + dedupes anyway
    ranks = pagerank_fixed(edges)
    return ranks.select(
        F.col("u").alias("node"),
        F.when(F.col("u") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.col("rank"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over canonical (u < v) undirected edges, using
    the degree orientation of Suri & Vassilvitskii ("Counting Triangles and
    the Curse of the Last Reducer", WWW 2011 — public literature).

    The naive wedge join enumerates sum(deg(x)^2) candidate wedges — a hub
    of degree d contributes d^2, the quadratic 'last reducer' that stalls
    web-scale graphs. Orienting every edge from its (degree, id)-smaller
    endpoint to its larger one makes each triangle countable at exactly ONE
    node (the one whose two out-edges enter it), and out-degrees under this
    orientation are bounded by O(sqrt(|E|)) — wedge candidates drop from
    sum(deg^2) to sum(outdeg^2) <= |E|^(3/2) total, with no single hot
    reducer. Three shuffle joins overall (attach degrees, wedge self-join
    on the source, close the wedge against the canonical edge set), each
    keyed on a node/edge key with map-side combine on the final count.
    """
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    withdeg = edges.join(du, "u").join(dv, "v")
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # the oriented table self-joins (x ⋈ y): checkpoint so the degree-join
    # subtree isn't evaluated once per side
    oriented = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.join(y, "src")
        .filter(F.col("x.dst") < F.col("y.dst"))
        .select(F.col("x.dst").alias("u"), F.col("y.dst").alias("v"))
    )
    tri = wedges.join(edges, ["u", "v"]).agg(
        F.count("*").alias("n_triangles")
    )
    return edges.agg(F.count("*").alias("n_edges")).crossJoin(tri)


TRIANGLE_MIN_SUPPORT = 2


def q_triangle_count(spark, sf_dir):
    """Triangle count of the part co-purchase graph: parts linked when they
    co-occur in >= TRIANGLE_MIN_SUPPORT orders. The support threshold is
    the standard market-basket move (one-off co-occurrence is noise) and
    the graph-side reason it exists at scale: the raw co-order graph is
    near-quadratic in basket size (1.2M edges at sf0.1, most of weight 1),
    while the supported graph is the stable co-purchase structure (3.8k
    edges) — threshold BEFORE triangle counting, exactly like a min-df cut
    before pair mining (q_ngram_jaccard's DF_CAP is the same lesson).

    The oracle counts the same triangles with the naive a<b<c three-way
    self-join — fine at oracle scale, exactly what the degree orientation
    exists to avoid at 100 TB — so the driver value-checks that the
    oriented plan changes the COST, not the answer."""
    from kitkat_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= TRIANGLE_MIN_SUPPORT)
        .select("u", "v")
        # eager checkpoint, not lazy persist: the edge table feeds FOUR
        # consumers (degrees, orientation, wedge self-join, closure join) —
        # lazily-cached, each consumer's plan re-embeds the whole
        # lineitem-pair build (22 Exchanges in the plan report); the
        # checkpoint computes it once and every consumer scans the
        # materialized relation
        .localCheckpoint(eager=True)
    )
    return triangle_count(edges)


LP_ITERS = 3
LP_SEED_MOD = 10  # customers with custkey % 10 == 0 are labeled seeds


def label_propagation_fixed(
    sym: DataFrame, seeds: DataFrame, iters: int = LP_ITERS
) -> DataFrame:
    """Fixed-iteration synchronous label propagation from a clamped seed
    set (Zhu & Ghahramani, CMU-CALD-02-107, 2002 — public literature):
    each round, every node takes the majority label of its LABELED
    neighbors (ties: highest count, then lexicographically smallest
    label); seed labels never change. Deterministic by construction —
    exact integer votes, total tie-break — so the DuckDB oracle unrolls
    the same rounds as CTEs (the q_pagerank pattern).

    Plan per round: ONE join (edges ⋈ labels, keyed on the node id) + TWO
    partial-aggregated groupBys — votes on (node, label), then the argmax
    as ``min(struct(-c, label))`` per node (struct comparison is
    lexicographic, so min(-c) is the highest count and ties fall to the
    smallest label — identical to a rank-1 window but map-side combinable
    and sort-free). The same message-passing shuffle shape as PageRank.
    `sym` is expected checkpointed by the caller so iterations share one
    materialized edge list. Hub nodes concentrate one vote key; both
    aggs combine map-side."""
    labels = seeds
    for _ in range(iters):
        votes = (
            sym.join(labels, "u")
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        winners = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("best")
            )
            .select(F.col("node").alias("u"), F.col("best.label").alias("label"))
        )
        labels = seeds.unionByName(
            winners.join(seeds.select("u"), "u", "left_anti")
        )
    return labels


def q_label_prop(spark, sf_dir):
    """Semi-supervised label propagation over the customer–supplier trade
    graph: 10% of customers are seeded with their REGION (the labeled
    slice every real corpus has), and 3 synchronous rounds spread region
    labels across suppliers and the remaining customers — the
    transductive labeling move behind weak-supervision data curation
    (label a corpus from a small labeled subset via the similarity
    graph). Node ids interleave (cust*2, supp*2+1), q_pagerank's layout.
    The oracle unrolls the identical three rounds."""
    from kitkat_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    # u is always even and v odd, so the reversed branch can't collide
    # with the forward one: unionAll of a distinct edge list stays distinct
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # seeds feed seven consumers (initial labels + a union and an anti
    # join per round). Deliberately NOT checkpointed: the re-embedded
    # subtree is three dimension scans with pushed IsNotNull filters that
    # AQE turns into broadcast joins everywhere; a checkpointed seeds
    # relation loses those stats and the anti joins fall to sort-merge
    # (measured 3.0 -> 5.3 s at sf0.1 — worse, reverted)
    seeds = (
        customer.filter(F.col("c_custkey") % LP_SEED_MOD == 0)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select((F.col("c_custkey") * 2).alias("u"), F.col("r_name").alias("label"))
    )
    labels = label_propagation_fixed(sym, seeds, LP_ITERS)
    return labels.select(
        F.col("u").alias("node"),
        F.when(F.col("u") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        "label",
        (F.col("u") % (2 * LP_SEED_MOD) == 0).alias("is_seed"),
    )


ORACLE = {
    "q_label_prop": f"""
        WITH e AS (
            SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        seeds AS (
            SELECT c_custkey * 2 AS u, r_name AS label
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_custkey % {LP_SEED_MOD} = 0
        ),
        v1 AS (
            SELECT sym.v AS node, l.label, count(*) AS c
            FROM sym JOIN seeds l ON sym.u = l.u GROUP BY 1, 2
        ),
        a1 AS (
            SELECT node AS u, label FROM v1
            QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1
        ),
        l1 AS (
            SELECT * FROM seeds
            UNION ALL
            SELECT u, label FROM a1 WHERE u NOT IN (SELECT u FROM seeds)
        ),
        v2 AS (
            SELECT sym.v AS node, l.label, count(*) AS c
            FROM sym JOIN l1 l ON sym.u = l.u GROUP BY 1, 2
        ),
        a2 AS (
            SELECT node AS u, label FROM v2
            QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1
        ),
        l2 AS (
            SELECT * FROM seeds
            UNION ALL
            SELECT u, label FROM a2 WHERE u NOT IN (SELECT u FROM seeds)
        ),
        v3 AS (
            SELECT sym.v AS node, l.label, count(*) AS c
            FROM sym JOIN l2 l ON sym.u = l.u GROUP BY 1, 2
        ),
        a3 AS (
            SELECT node AS u, label FROM v3
            QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1
        ),
        l3 AS (
            SELECT * FROM seeds
            UNION ALL
            SELECT u, label FROM a3 WHERE u NOT IN (SELECT u FROM seeds)
        )
        SELECT u AS node,
               CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               label,
               u % {2 * LP_SEED_MOD} = 0 AS is_seed
        FROM l3
    """,
    "q_triangle_count": """
        WITH e AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT (SELECT count(*) FROM e) AS n_edges,
               (SELECT count(*)
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
    "q_cc_chain": """
        SELECT doc_id, (SELECT min(doc_id) FROM documents) AS label
        FROM documents
    """,
    # the same three fixed-point rounds, unrolled; // is floor division ==
    # Spark's `div` on the non-negative values here
    "q_pagerank": """
        WITH e AS (
            SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
        deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
        g AS (SELECT sym.u, sym.v, deg.deg FROM sym JOIN deg ON sym.u = deg.u),
        r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS rank FROM deg),
        r1 AS (SELECT g.v AS u, 150000 + (850 * sum(r0.rank // g.deg)) // 1000 AS rank
               FROM g JOIN r0 ON g.u = r0.u GROUP BY g.v),
        r2 AS (SELECT g.v AS u, 150000 + (850 * sum(r1.rank // g.deg)) // 1000 AS rank
               FROM g JOIN r1 ON g.u = r1.u GROUP BY g.v),
        r3 AS (SELECT g.v AS u, 150000 + (850 * sum(r2.rank // g.deg)) // 1000 AS rank
               FROM g JOIN r2 ON g.u = r2.u GROUP BY g.v)
        SELECT u AS node,
               CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               CAST(rank AS BIGINT) AS rank
        FROM r3
    """,
}
