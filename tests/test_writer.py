"""Write-path layout tests: partition directories, file sizing, row-group
sort, partition pruning on read-back, and compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kitkat_spark.sources import load_table
from kitkat_spark.sources.writer import compact, write_partitioned

SF = "/root/testdata/sf0.001"


def test_write_partitioned_layout_and_readback(spark, tmp_path):
    out = str(tmp_path / "docs")
    docs = load_table(spark, SF, "documents")
    write_partitioned(
        docs, out, partition_by=["lang"], sort_within=["doc_id"],
        max_records_per_file=50,
    )
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/lang=*")}
    assert dirs == {f"lang={l}" for l in langs}

    # file sizing: no file may exceed max_records_per_file rows
    for f in glob.glob(f"{out}/lang=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 50, f

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)

    # partition pruning: a lang filter must become a PartitionFilter, and
    # scan only that directory's files
    one = sorted(langs)[0]
    plan = (
        back.filter(F.col("lang") == one)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "lang" in plan


def test_sort_within_gives_selective_rowgroup_stats(spark, tmp_path):
    """Sorted files: per-file doc_id ranges must be disjoint-ish (each file
    covers a narrow slice), which is what makes row-group skipping work."""
    out = str(tmp_path / "sorted")
    docs = load_table(spark, SF, "documents")
    write_partitioned(
        docs, out, partition_by=["lang"], sort_within=["doc_id"],
        max_records_per_file=50,
    )
    import pyarrow.parquet as pq

    for f in glob.glob(f"{out}/lang=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "doc_id"
        )
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max


def test_compact_reduces_file_count(spark, tmp_path):
    out = str(tmp_path / "frag")
    docs = load_table(spark, SF, "documents")
    docs.repartition(20).write.parquet(out)
    before = len(glob.glob(f"{out}/*.parquet"))
    assert before >= 20
    compact(spark, out, target_file_rows=1_000_000)
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after == 1
    assert spark.read.parquet(out).count() == docs.count()
