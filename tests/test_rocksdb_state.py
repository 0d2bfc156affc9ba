"""The 100 TB state-store recommendation must actually run: the watermarked
streaming dedup executes against the RocksDB state store provider (spillable
off-heap state) and produces the same result as the default provider."""

from __future__ import annotations

from kitkat_spark.sources import load_table
from kitkat_spark.streaming.analytics import stream_dedup

SF = "/root/testdata/sf0.001"

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_dedup_on_rocksdb_state_store(spark, tmp_path):
    src = str(tmp_path / "dups")
    ev = load_table(spark, SF, "events").limit(200)
    ev.union(ev).write.parquet(src)
    schema = spark.read.parquet(src).schema

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        stream = stream_dedup(spark.readStream.schema(schema).parquet(src))
        q = (
            stream.writeStream.format("memory")
            .queryName("rocks_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        assert q.awaitTermination(180)
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM rocks_dedup"
        ).collect()[0]
        assert got.n == got.d == 200
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
