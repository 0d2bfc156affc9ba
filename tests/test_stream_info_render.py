"""Golden-render parity for the stream info table (VERDICT r5 "missing" #3).

The reference prints a 6-row two-column table on --verbose
(consumer/consumer.go:88-114) and its test asserts label + value patterns
(consumer_test.go:146-147). Same contract here, plus a full golden string
for the rendered layout.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from kitkat_spark.streaming.consumer import render_stream_info
from kitkat_spark.streaming.records import SHARD_SCHEMA, STREAM_META_SCHEMA


def _fixtures(spark):
    meta = spark.createDataFrame(
        [("events", datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc), "NONE", 24)],
        STREAM_META_SCHEMA,
    )
    shards = spark.createDataFrame(
        [
            ("shardId-000000000000", "100", None),
            ("shardId-000000000001", "200", "299"),  # closed
            ("shardId-000000000002", "300", None),
        ],
        SHARD_SCHEMA,
    )
    return meta, shards


def test_reference_test_contract(spark):
    out = render_stream_info(*_fixtures(spark))
    # the exact regexes the reference's own test asserts
    assert re.search(r"Stream name:.+events", out)
    assert re.search(r"Created at:.+Tue, 02 Jan 2024 03:04:05 UTC", out)
    assert re.search(r"Encryption:.+NONE", out)
    assert re.search(r"Retention:.+24 hours", out)
    assert re.search(r"Active:.+2 shards", out)
    assert re.search(r"Closed:.+1 shards", out)


def test_golden_render(spark):
    out = render_stream_info(*_fixtures(spark))
    assert out == "\n".join(
        [
            "+--------------+-------------------------------+",
            "| Stream name: | events                        |",
            "| Created at:  | Tue, 02 Jan 2024 03:04:05 UTC |",
            "| Encryption:  | NONE                          |",
            "| Retention:   | 24 hours                      |",
            "| Active:      | 2 shards                      |",
            "| Closed:      | 1 shards                      |",
            "+--------------+-------------------------------+",
        ]
    )
