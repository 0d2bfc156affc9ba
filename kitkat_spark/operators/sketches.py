"""Sketch-based counting: a Count-Min heavy-hitter audit (SURVEY.md §2.B
extension surface — bounded-memory frequency estimation for key domains too
large to count exactly; the reference counts nothing, consumer.go renders
and moves on).

Count-Min (Cormode & Muthukrishnan, J. Algorithms 2005 — public literature):
D seeded hash rows x W counters; every token increments one counter per row;
the estimate for a token is the MIN of its D counters — always an
OVERESTIMATE (collisions only add), within eps*N with probability 1-delta
for W = e/eps, D = ln(1/delta).

Why it matters at 100 TB: an exact token count over a web corpus shuffles
a key domain of billions (vocabulary grows ~heap's law); the CMS state is
a FIXED D x W integer grid (3 x 8192 here = 96 KiB) regardless of corpus or
vocabulary size, built with one partial-agg shuffle whose key domain is at
most D*W, and grids from different shards/streams/days merge by addition —
the standard streaming heavy-hitter layout. The exact top-K side of this
query exists to VERIFY the sketch cross-engine; a production pipeline keeps
only the grid.

Determinism: bucket hashes are md5-derived (functions/text.py md5_long),
bit-identical in DuckDB, so the oracle rebuilds the very same grid and the
driver hash-compares estimated counts — value-level verification of an
approximation structure (same trick as the LSH family's replayed oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kitkat_spark.functions.text import md5_long, tokens
from kitkat_spark.sources import load_table

CMS_W = 8192  # counters per hash row
CMS_D = 3  # hash rows
CMS_TOP_K = 20


def _bucket(token: Column, seed: int) -> Column:
    return F.pmod(
        md5_long(F.concat(F.lit(f"cms{seed}|"), token)), F.lit(CMS_W)
    )


def cms_counters(token_stream: DataFrame, col: str = "token") -> DataFrame:
    """(seed, bucket, n): the D x W grid as a DataFrame — at most D*W rows
    no matter the input size; the explode is map-side (D rows per token)
    and the groupBy key domain is the grid itself, so the shuffle carries
    only partial counters."""
    cells = token_stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col(col), s).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.seed", "c.bucket").agg(F.count("*").alias("n"))


def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-vs-sketch audit: the top-20 tokens by TRUE term frequency,
    each with its Count-Min estimate (min over the D grid cells). n_cms >=
    n_true always; equality means no collision landed in any of the
    token's D cells. One token-stream scan feeds both sides; the exact
    side's orderBy+limit is TakeOrderedAndProject (per-partition heap)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    counters = cms_counters(toks)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_true"))
        .orderBy(F.col("n_true").desc(), "token")
        .limit(CMS_TOP_K)
    )
    probes = top.select(
        "token",
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col("token"), s).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select("token", "n_true", "c.seed", "c.bucket")
    # D*K probe rows vs <= D*W grid rows: broadcast the probes
    est = (
        counters.join(F.broadcast(probes), ["seed", "bucket"])
        .groupBy("token", "n_true")
        .agg(F.min("n").alias("n_cms"))
    )
    return est.select("token", "n_true", "n_cms")


ORACLE: dict[str, str] = {
    "q_count_min": f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        cells AS (
            SELECT s.seed,
                   ('0x' || substr(md5('cms' || s.seed || '|' || token), 1, 15))::BIGINT
                       % {CMS_W} AS bucket
            FROM toks, (SELECT unnest([0, 1, 2]) AS seed) s
        ),
        grid AS (
            SELECT seed, bucket, count(*) AS n FROM cells GROUP BY seed, bucket
        ),
        top AS (
            SELECT token, count(*) AS n_true
            FROM toks GROUP BY token
            ORDER BY n_true DESC, token LIMIT {CMS_TOP_K}
        ),
        probes AS (
            SELECT token, n_true, s.seed,
                   ('0x' || substr(md5('cms' || s.seed || '|' || token), 1, 15))::BIGINT
                       % {CMS_W} AS bucket
            FROM top, (SELECT unnest([0, 1, 2]) AS seed) s
        )
        SELECT p.token, p.n_true, CAST(min(g.n) AS BIGINT) AS n_cms
        FROM probes p JOIN grid g ON p.seed = g.seed AND p.bucket = g.bucket
        GROUP BY p.token, p.n_true
    """,
}
