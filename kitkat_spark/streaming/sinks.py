"""Sinks beyond the console: partitioned parquet append + dead-letter
quarantine.

The reference SILENTLY drops undecodable payloads (consumer.go:177-179:
failed deagg -> zero rows; 213-216: failed inflate -> passthrough). At
100 TB silent drops are unacceptable — a corrupt-blob burst must be
observable and replayable. ``consume_with_dlq`` splits the stream on
decodability: good records flow through the normal pipeline, undecodable
ones land in a quarantine table with the raw payload and a reason column.

Both paths are written by ONE foreachBatch so a micro-batch commits good
and bad rows atomically-enough for replay (checkpointed offsets + idempotent
overwrite-by-batch-id gives effectively-once on retries; exactly-once needs
a transactional table format, which is a deployment choice not taken here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kitkat_spark.functions.compression import zlib_decompress_udf
from kitkat_spark.functions.kpl import is_aggregated_col, kpl_deaggregate_udf
from kitkat_spark.streaming.pipeline import render


def classify_records(df: DataFrame, compression: str | None = None) -> DataFrame:
    """Adds ``_dlq_reason`` (null = healthy). A KPL-magic payload that decodes
    to zero records is quarantined (bad md5 / truncated / bad protobuf); a
    zlib stream that fails to inflate is quarantined when compression is on."""
    decoded_n = F.when(
        is_aggregated_col(F.col("data")), F.size(kpl_deaggregate_udf(F.col("data")))
    )
    reason = F.when(decoded_n == 0, F.lit("kpl_decode_failed"))
    if compression == "zlib":
        # inflate failure passthrough returns input unchanged; flag only
        # payloads that LOOK deflated (0x78 header) yet fail to inflate
        looks_zlib = F.startswith(F.col("data"), F.lit(b"\x78"))
        inflated = zlib_decompress_udf(F.col("data"))
        reason = reason.otherwise(
            F.when(
                (~is_aggregated_col(F.col("data"))) & looks_zlib & (inflated == F.col("data")),
                F.lit("zlib_decode_failed"),
            )
        )
    return df.withColumn("_dlq_reason", reason)


def consume_with_dlq(
    records: DataFrame,
    good_path: str,
    dlq_path: str,
    checkpoint: str,
    compression: str | None = None,
    verbose: bool = True,
) -> StreamingQuery:
    """EP2 with quarantine: decode-able records -> rendered parquet append;
    undecodable -> raw payload + reason + arrival metadata in the DLQ."""
    from kitkat_spark.streaming.pipeline import consume_transform

    classified = classify_records(records, compression)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            good = batch_df.filter(F.col("_dlq_reason").isNull()).drop("_dlq_reason")
            bad = batch_df.filter(F.col("_dlq_reason").isNotNull())
            consume_transform(good, compression=compression, verbose=verbose).write.mode(
                "append"
            ).parquet(good_path)
            if bad.limit(1).count():
                bad.select(
                    "data",
                    "partitionKey",
                    "sequenceNumber",
                    "approximateArrivalTimestamp",
                    "shardId",
                    "streamName",
                    F.col("_dlq_reason").alias("reason"),
                    F.lit(batch_id).alias("batch_id"),
                ).write.mode("append").parquet(dlq_path)
        finally:
            batch_df.unpersist()

    return (
        classified.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
