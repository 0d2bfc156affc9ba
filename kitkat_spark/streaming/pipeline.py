"""The kitkat consumer dataflow as pure DataFrame transforms.

Each function maps a reference operator (SURVEY.md §2.A) onto a narrow,
shuffle-free transformation that works identically on a batch DataFrame and a
streaming one — the whole consume pipeline is a single whole-stage-codegen
map chain plus one Arrow-batched UDF for the two binary codecs Spark SQL
lacks (protobuf, zlib).

Reference pipeline (consumer.go:148-209): GetRecords -> [aggregated? ->
deaggregate -> N records] -> [zlib? -> inflate] -> bytes->text + trim one
trailing newline -> format arrival ts -> terse/verbose projection -> print.

Scale: no shuffle anywhere. Deaggregation multiplies rows within a partition
(explode), decompression is per-row; parallelism stays 1 shard -> 1 task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kitkat_spark.functions.compression import zlib_decompress_udf
from kitkat_spark.functions.kpl import is_aggregated_col, kpl_deaggregate_udf

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"  # Go layout 2006-01-02 15:04:05 (consumer.go:193)


def deaggregate(df: DataFrame) -> DataFrame:
    """X1: expand KPL aggregates in-line; pass plain records through.

    Inner records inherit the outer record's arrival timestamp, sequence
    number, shard and encryption type (consumer.go:183-188); the partition
    key is dictionary-decoded inside the UDF (consumer.go:186). A blob that
    fails magic/md5/protobuf checks yields zero rows (consumer.go:177-179).

    Single-pass form: wrap plain payloads as a 1-element array and explode,
    so there is no filter/union plan split — one projection, one explode,
    no second scan of the source.
    """
    recs = F.when(
        is_aggregated_col(F.col("data")), kpl_deaggregate_udf(F.col("data"))
    ).otherwise(
        F.array(
            F.struct(
                F.col("partitionKey").alias("partition_key"),
                F.col("data").alias("data"),
                F.lit(None).cast("map<string,string>").alias("tags"),
            )
        )
    )
    return (
        df.withColumn("_rec", F.explode(recs))
        .withColumn("partitionKey", F.col("_rec.partition_key"))
        .withColumn("data", F.col("_rec.data"))
        .withColumn("tags", F.col("_rec.tags"))
        .drop("_rec")
    )


def decompress(df: DataFrame, compression: str | None) -> DataFrame:
    """P5: per-record zlib inflate with pass-through on decode failure
    (consumer.go:197-201,211-224). ``compression`` mirrors ``--compress``."""
    if compression is None:
        return df
    if compression != "zlib":
        raise ValueError(f"unsupported compression {compression!r} (only 'zlib')")
    return df.withColumn("data", zlib_decompress_udf(F.col("data")))


def payload_text(data: Column) -> Column:
    """P3: bytes -> UTF-8 text, trimming exactly ONE trailing newline.

    Go's strings.TrimSuffix strips at most one occurrence (consumer.go:203);
    ``rtrim`` would strip all, and Java's ``$`` also matches BEFORE a final
    line terminator (so ``\\n$`` strips two) — anchor with ``\\z``.
    """
    return F.regexp_replace(data.cast("string"), "\\n\\z", "")


def render(df: DataFrame, verbose: bool = False) -> DataFrame:
    """P2+P3+P4: format timestamp, decode payload, project terse or verbose
    columns (consumer.go:195-209; --verbose flag command/root.go:24)."""
    out = df.withColumn("timestamp", F.date_format("approximateArrivalTimestamp", TS_FORMAT)).withColumn(
        "message", payload_text(F.col("data"))
    )
    if verbose:
        return out.select(
            "timestamp",
            F.col("streamName").alias("stream"),
            F.col("shardId").alias("shard_id"),
            F.col("sequenceNumber").alias("sequence_number"),
            "message",
        )
    return out.select("timestamp", "message")


def consume_transform(
    df: DataFrame,
    compression: str | None = None,
    verbose: bool = False,
    since: Column | None = None,
) -> DataFrame:
    """The full consumer pipeline EP2 (SURVEY.md §3) as one composable
    transform; ``since`` reproduces AT_TIMESTAMP positioning on replay
    (consumer.go:125-130: F3/F4)."""
    if since is not None:
        df = df.filter(F.col("approximateArrivalTimestamp") >= since)
    return render(decompress(deaggregate(df), compression), verbose=verbose)
