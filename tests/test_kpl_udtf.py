"""The native UDTF deaggregation path must agree row-for-row with the
pandas-UDF + explode path on a mixed good/corrupt blob fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from kitkat_spark.functions.kpl import (
    KplDeaggUDTF,
    aggregate_records,
    kpl_deaggregate_udf,
)


def test_udtf_matches_explode_path(spark):
    good = aggregate_records(
        ["a", "b"],
        [
            {"partition_key_index": 0, "data": b"x", "tags": [("k", "v")]},
            {"partition_key_index": 1, "data": b"y"},
        ],
    )
    corrupt = good[:-1] + bytes([good[-1] ^ 0xFF])
    df = spark.createDataFrame([(1, good), (2, corrupt)], "blob_id int, blob binary")
    df.createOrReplaceTempView("kpl_blobs")
    spark.udtf.register("kpl_deagg", KplDeaggUDTF)

    via_udtf = spark.sql(
        "SELECT b.blob_id, t.partition_key, t.data, t.tags "
        "FROM kpl_blobs b, LATERAL kpl_deagg(b.blob) t"
    )
    via_explode = df.select(
        "blob_id", F.explode(kpl_deaggregate_udf(F.col("blob"))).alias("r")
    ).select("blob_id", "r.partition_key", "r.data", "r.tags")

    a = sorted(map(str, via_udtf.collect()))
    b = sorted(map(str, via_explode.collect()))
    assert a == b
    assert len(a) == 2  # corrupt blob contributed zero rows on both paths
