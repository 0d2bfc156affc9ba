"""CLI surface: EP2 (consume) end-to-end through a subprocess; EP1/info
error paths when boto3 is absent (graceful message, exit 1)."""

from __future__ import annotations

import datetime as dt
import subprocess
import sys

from kitkat_spark.streaming.records import RECORD_SCHEMA

REPO = "/root/repo"


def test_cli_consume_once(spark, tmp_path):
    src = str(tmp_path / "recs")
    spark.createDataFrame(
        [(b"hello-cli\n", "pk", "1", dt.datetime(2024, 1, 1), "shardId-0", "s1", "NONE")],
        RECORD_SCHEMA,
    ).write.parquet(src)
    r = subprocess.run(
        [sys.executable, "-m", "kitkat_spark.cli", "consume", "-s", src,
         "-i", "trim_horizon", "--once"],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert r.returncode == 0
    assert "hello-cli" in r.stdout


def test_cli_produce_without_boto3_fails_gracefully(tmp_path):
    (tmp_path / "lines.txt").write_text("a\nb\n")
    r = subprocess.run(
        [sys.executable, "-m", "kitkat_spark.cli", "produce", "-s", "st",
         "--source", str(tmp_path)],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert r.returncode == 1
    assert "boto3" in r.stderr
