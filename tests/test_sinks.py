"""DLQ sink: corrupt KPL blobs are quarantined with a reason while healthy
records flow to the good table; checkpoint resume processes late-arriving
files exactly once."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kitkat_spark.functions.kpl import aggregate_records
from kitkat_spark.streaming.records import RECORD_SCHEMA, replay_stream
from kitkat_spark.streaming.sinks import consume_with_dlq

TS = dt.datetime(2024, 1, 2, 3, 4, 5)


def _rec(payload: bytes, seq: str):
    return (payload, f"pk-{seq}", seq, TS, "shardId-0", "s1", "NONE")


def _write(spark, rows, path):
    spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_dlq_quarantines_corrupt_blobs(spark, tmp_path):
    good_blob = aggregate_records(["u"], [{"partition_key_index": 0, "data": b"inner\n"}])
    corrupt = good_blob[:-1] + bytes([good_blob[-1] ^ 0xFF])
    src = str(tmp_path / "src")
    _write(spark, [_rec(b"plain\n", "1"), _rec(good_blob, "2"), _rec(corrupt, "3")], src)

    good_p, dlq_p, ckpt = (str(tmp_path / d) for d in ("good", "dlq", "ckpt"))
    q = consume_with_dlq(replay_stream(spark, src), good_p, dlq_p, ckpt)
    assert q.awaitTermination(180)

    good = spark.read.parquet(good_p)
    assert {r.message for r in good.collect()} == {"plain", "inner"}
    dlq = spark.read.parquet(dlq_p)
    rows = dlq.collect()
    assert len(rows) == 1
    assert rows[0].reason == "kpl_decode_failed"
    assert rows[0].sequenceNumber == "3"

    # late file + SAME checkpoint -> only the new record lands, exactly once
    _write(spark, [_rec(b"late\n", "4")], src)
    q2 = consume_with_dlq(replay_stream(spark, src), good_p, dlq_p, ckpt)
    assert q2.awaitTermination(180)
    msgs = sorted(r.message for r in spark.read.parquet(good_p).collect())
    assert msgs == ["inner", "late", "plain"]
    assert spark.read.parquet(dlq_p).count() == 1  # corrupt NOT reprocessed
