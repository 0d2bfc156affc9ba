#!/usr/bin/env python
"""Streaming STATE-STORE stress probe: does state track the watermark
horizon (keys/minute x delay) or the total stream length?

tools/stress.py measures wall-time scaling; for the watermarked stateful
family wall time is the wrong axis — the scale risk is state-store growth.
This probe replays `events` stretched in TIME (each replica's timestamps
shifted past the previous replica's horizon, one replica per micro-batch,
chronological), so a factor-N run is an N-times-LONGER stream at the same
key rate. A correctly watermarked operator must show:

- input rows grow ~Nx,
- per-batch post-eviction state (numRowsTotal) stays ~FLAT,
- rows are actually evicted every batch (numRowsRemoved > 0).

An unbounded operator (dropDuplicates without watermark) would instead
show numRowsTotal ~ input rows — the 100 TB/day failure mode.

Shapes probed: dropDuplicatesWithinWatermark (stream_dedup),
session_window aggregation (session_counts), and the chained
dedup -> tumbling aggregation (two state stores, watermark propagated).
The dedup shape also runs on the RocksDB provider at the largest factor —
the spillable-state configuration the 100 TB design names.

Usage: python tools/stream_state_stress.py [--factors 1 10 20]
Prints one JSON line; paste the rows into SCALE_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kitkat_spark.session import get_spark
from kitkat_spark.sources import load_table
from kitkat_spark.streaming.analytics import session_counts, stream_dedup

BASE = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/kitkat_stream_stress"
FILES_PER_REPLICA = 2
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def build_stretched(spark, factor: int) -> str:
    """factor replicas of events, each shifted one full span + 2 watermark
    delays past the previous — a stream factor-x longer at the same key
    rate. Doubled rows (every event twice) so the dedup state is
    load-bearing. Written replica-by-replica (ascending mod time) so the
    file source replays chronologically at FILES_PER_REPLICA per batch."""
    out = os.path.join(OUT_ROOT, f"f{factor}")
    if os.path.exists(out):
        return out
    ev = load_table(spark, BASE, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    stats = ev.agg(
        F.max("event_id").alias("mx"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("span"),
    ).collect()[0]
    stride, shift_s = stats.mx + 1, int(stats.span) + 2 * 600
    doubled = ev.unionByName(ev)
    for i in range(factor):
        rep = doubled.withColumn("event_id", F.col("event_id") + F.lit(i * stride))
        rep = rep.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {i * shift_s} SECONDS")
        )
        rep.coalesce(FILES_PER_REPLICA).write.mode("append").parquet(out)
        time.sleep(1.1)  # distinct mtimes -> chronological file-source order
    return out


def run_shape(spark, name: str, path: str, schema, transform, provider=None):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", FILES_PER_REPLICA)
        .parquet(path)
    )
    sink = f"sss_{name}_{abs(hash(path)) % 10**8}"
    # recentProgress is a ring buffer capped at numRecentProgressUpdates
    # (default 100): a factor beyond ~100 replicas would silently drop the
    # oldest batches' metrics and undercount input_rows/total_evicted.
    # Size the buffer to the run so every micro-batch's metrics survive.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t0 = time.time()
    try:
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
        per_batch = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if ops:
                per_batch.append(
                    {
                        "rows": sum(o.get("numRowsTotal", 0) for o in ops),
                        "removed": sum(o.get("numRowsRemoved", 0) for o in ops),
                        "mem": sum(o.get("memoryUsedBytes", 0) for o in ops),
                        "in": p.get("numInputRows", 0),
                    }
                )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    spark.sql(f"DROP TABLE IF EXISTS {sink}")
    return {
        "wall_sec": wall,
        "batches": len(per_batch),
        "input_rows": sum(b["in"] for b in per_batch),
        "peak_state_rows": max((b["rows"] for b in per_batch), default=0),
        "final_state_rows": per_batch[-1]["rows"] if per_batch else 0,
        "peak_state_mb": round(
            max((b["mem"] for b in per_batch), default=0) / 1e6, 1
        ),
        "total_evicted": sum(b["removed"] for b in per_batch),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", nargs="*", type=int, default=[1, 10, 20])
    ap.add_argument("--fresh", action="store_true", help="rebuild fixtures")
    args = ap.parse_args()
    if args.fresh and os.path.exists(OUT_ROOT):
        shutil.rmtree(OUT_ROOT)

    spark = get_spark(app_name="stream_state_stress")
    schema = (
        load_table(spark, BASE, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .schema
    )

    shapes = {
        "dedup_wm": lambda s: stream_dedup(s, keys=["event_id"]).select(
            "event_id", "user_id", "event_type"
        ),
        "session_wm": lambda s: session_counts(
            s.select("event_id", "user_id", "ts")
        ),
        # single watermark, propagated through both state stores (the
        # q_stream_dedup_agg_wm chain shape — re-applying one after dedup
        # is a "redefining watermark" AnalysisException)
        "dedup_then_agg_wm": lambda s: (
            stream_dedup(s, keys=["event_id"])
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        ),
    }

    results: dict[str, dict] = {s: {} for s in shapes}
    results["dedup_wm_rocksdb"] = {}
    for factor in args.factors:
        path = build_stretched(spark, factor)
        for sname, fn in shapes.items():
            r = run_shape(spark, sname, path, schema, fn)
            results[sname][f"{factor}x"] = r
            print(f"# {sname} {factor}x: {r}", file=sys.stderr)
    # RocksDB at the largest factor only (provider parity, spillable state)
    big = max(args.factors)
    path = build_stretched(spark, big)
    r = run_shape(spark, "dedup_rocks", path, schema, shapes["dedup_wm"], ROCKSDB)
    results["dedup_wm_rocksdb"][f"{big}x"] = r
    print(f"# dedup_wm_rocksdb {big}x: {r}", file=sys.stderr)

    print(json.dumps({"watermark": "10 minutes", "shapes": results}))


if __name__ == "__main__":
    main()
