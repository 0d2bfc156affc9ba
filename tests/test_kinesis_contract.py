"""Contract tests for the boto3-shaped Kinesis branches (VERDICT r5 item 7).

The container has no boto3/AWS, so these drive the REAL client-handling
code — DescribeStream pagination, shard-range extraction, closed-shard
fields, PutRecords ack extraction — through injected stub clients, the
same seam the reference tests use (consumer/consumer_test.go:20-37
mockKinesis). Only the network client is faked; everything from the API
response dict onward is the production path.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kitkat_spark.streaming.producer import kinesis_put_records
from kitkat_spark.streaming.records import describe_stream_df, open_shards


class StubKinesisDescribe:
    """Two-page DescribeStream: 3 shards, one closed, paginated at 2."""

    PAGE = 2

    def __init__(self):
        self.calls: list[dict] = []
        self._shards = [
            {
                "ShardId": "shardId-000000000000",
                "SequenceNumberRange": {"StartingSequenceNumber": "100"},
            },
            {
                "ShardId": "shardId-000000000001",
                # closed shard: has an ending sequence number
                "SequenceNumberRange": {
                    "StartingSequenceNumber": "200",
                    "EndingSequenceNumber": "299",
                },
            },
            {
                "ShardId": "shardId-000000000002",
                "SequenceNumberRange": {"StartingSequenceNumber": "300"},
            },
        ]

    def describe_stream(self, **kwargs):
        self.calls.append(dict(kwargs))
        start = 0
        if "ExclusiveStartShardId" in kwargs:
            ids = [s["ShardId"] for s in self._shards]
            start = ids.index(kwargs["ExclusiveStartShardId"]) + 1
        page = self._shards[start : start + self.PAGE]
        return {
            "StreamDescription": {
                "StreamName": kwargs["StreamName"],
                "StreamCreationTimestamp": datetime(
                    2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc
                ),
                "RetentionPeriodHours": 24,
                "Shards": page,
                "HasMoreShards": start + self.PAGE < len(self._shards),
            }
        }


def test_describe_stream_paginates_and_extracts(spark):
    stub = StubKinesisDescribe()
    meta, shards = describe_stream_df(spark, "events", client=stub)

    # pagination: first call has no ExclusiveStartShardId, second resumes
    # after the last shard of page one (the AWS DescribeStream contract)
    assert len(stub.calls) == 2
    assert "ExclusiveStartShardId" not in stub.calls[0]
    assert stub.calls[1]["ExclusiveStartShardId"] == "shardId-000000000001"

    m = meta.collect()[0]
    assert m.stream_name == "events"
    assert m.encryption_type == "NONE"  # absent in response -> default
    assert m.retention_hours == 24

    rows = {r.shard_id: r for r in shards.collect()}
    assert set(rows) == {
        "shardId-000000000000",
        "shardId-000000000001",
        "shardId-000000000002",
    }
    assert rows["shardId-000000000001"].ending_sequence_number == "299"
    assert rows["shardId-000000000000"].ending_sequence_number is None

    # F1 closed-shard filter drops exactly the closed shard
    open_ids = {r.shard_id for r in open_shards(shards).collect()}
    assert open_ids == {"shardId-000000000000", "shardId-000000000002"}


class StubKinesisPut:
    """PutRecords echoing deterministic acks; records every request."""

    def __init__(self):
        self.requests: list[dict] = []

    def put_records(self, **kwargs):
        self.requests.append(kwargs)
        return {
            "Records": [
                {"ShardId": "shardId-000000000007", "SequenceNumber": str(1000 + i)}
                for i, _ in enumerate(kwargs["Records"])
            ]
        }


def test_put_records_ack_extraction():
    stub = StubKinesisPut()
    put = kinesis_put_records("events", client=stub)
    acks = put([("k1", b"a"), ("k2", b"b")])
    assert acks == [
        ("shardId-000000000007", "1000"),
        ("shardId-000000000007", "1001"),
    ]
    (req,) = stub.requests
    assert req["StreamName"] == "events"
    assert req["Records"] == [
        {"PartitionKey": "k1", "Data": b"a"},
        {"PartitionKey": "k2", "Data": b"b"},
    ]


def test_no_client_path_gates_on_boto3(monkeypatch):
    """Without an injected client the factory needs boto3: present -> a
    real client is built (no network at construction); absent -> a
    NotImplementedError with injection instructions, never an ImportError."""
    try:
        import boto3  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            kinesis_put_records("events")
        return
    import sys

    put = kinesis_put_records("events", region="us-west-2")
    assert callable(put)
    # simulate the boto3-less container: the gate must raise the documented
    # NotImplementedError, not leak an ImportError
    monkeypatch.setitem(sys.modules, "boto3", None)
    with pytest.raises(NotImplementedError):
        kinesis_put_records("events")
