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


def test_md5_digest_actually_checked():
    """The digest check follows the KPL aggregation wire format (the
    envelope is magic ‖ protobuf ‖ md5(protobuf)) and is deliberately
    STRICTER than the reference consumer, which only strips the trailing
    md5.Size bytes and never compares them (consumer.go:174 slices the
    digest off; nothing verifies it), so it would happily decode a
    corrupted blob. Flipping a byte INSIDE
    a partition-key string keeps the blob structurally valid protobuf —
    magic, length, and field parsing all still succeed — so ONLY the
    digest comparison can reject it. This is the red-green discriminator:
    remove the digest check and this blob decodes "successfully" with a
    corrupted partition key."""
    import hashlib

    from kitkat_spark.functions.kpl import KPL_MAGIC, deaggregate_blob

    good = aggregate_records(
        ["alpha"], [{"partition_key_index": 0, "data": b"x"}]
    )
    assert deaggregate_blob(good), "sanity: intact blob must decode"

    proto = good[len(KPL_MAGIC) : -16]
    off = len(KPL_MAGIC) + proto.index(b"alpha")
    bad = good[:off] + b"z" + good[off + 1 :]
    # structurally-valid proto + stale digest -> rejected by the md5 gate
    assert deaggregate_blob(bad) == []

    # same corrupted body with a RECOMPUTED digest decodes fine (proving
    # the rejection above came from the digest, not from a parse failure)
    bad_proto = bad[len(KPL_MAGIC) : -16]
    refreshed = KPL_MAGIC + bad_proto + hashlib.md5(bad_proto).digest()
    recs = deaggregate_blob(refreshed)
    assert recs and recs[0]["partition_key"] == "zlpha"
