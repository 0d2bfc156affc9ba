"""Winnowing guarantee (Schleimer et al.): two documents sharing a substring
of >= w+k-1 tokens must share at least one fingerprint; disjoint texts
should (whp) share none."""

from __future__ import annotations

from pyspark.sql import functions as F

from kitkat_spark.operators.textops import WINNOW_K, WINNOW_W, winnow_fingerprints


def _fps(spark, text: str) -> set:
    df = spark.createDataFrame([(text,)], "text string").select(
        winnow_fingerprints(F.col("text")).alias("f")
    )
    return set(df.collect()[0].f)


def test_shared_substring_shares_fingerprint(spark):
    shared = " ".join(f"common{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "one two three four five " + shared + " six seven"
    fa, fb = _fps(spark, a), _fps(spark, b)
    assert fa and fb
    assert fa & fb, "shared >= w+k-1 token substring must share a fingerprint"


def test_disjoint_texts_share_nothing(spark):
    a = " ".join(f"left{i}" for i in range(30))
    b = " ".join(f"right{i}" for i in range(30))
    assert not (_fps(spark, a) & _fps(spark, b))


def test_short_text_yields_empty(spark):
    assert _fps(spark, "just three tokens") == set()
