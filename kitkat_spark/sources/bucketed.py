"""Bucketed (co-located) joins: pre-shuffled table layout so repeated joins
on the same key pay ZERO Exchange (SURVEY.md §4 / north-star scale
discipline).

``bucketize`` writes a table once with ``bucketBy(n, key)`` into the session
warehouse; any later equi-join between two tables bucketed on the same key
with the same bucket count is planned as a sort-merge join with NO shuffle on
either side — at 100 TB this converts every recurring fact-fact join from a
full-network shuffle into a local merge. The bucket count is the unit of
join parallelism; pick it so one bucket of the larger table fits in executor
memory (e.g. 100 TB / 4096 buckets ~= 25 GB input, ~a few GB columnar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kitkat_spark.sources.tables import load_table


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = 8,
    table_name: str | None = None,
) -> str:
    """Write ``table`` bucketed+sorted by ``key``; returns the table name.
    Idempotent per session (skips if the table already exists). The default
    name embeds the sf dir: one session may bucketize the same table at
    several scales (tests at sf0.001, the driver at sf0.01) and a shared
    name would silently serve the wrong data."""
    import os
    import re

    sf_tag = re.sub(r"[^A-Za-z0-9]", "_", os.path.basename(os.path.normpath(sf_dir)))
    name = table_name or f"{table}_b{n_buckets}_{key}_{sf_tag}"
    if not spark.catalog.tableExists(name):
        # a previous session may have left the managed location behind with
        # no catalog entry — saveAsTable refuses to reuse it; clear it
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if warehouse:
            shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return name


def bucketed_join(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Join two star-schema tables through bucketed layouts (shuffle-free)."""
    lt = bucketize(spark, sf_dir, left, left_key, n_buckets)
    rt = bucketize(spark, sf_dir, right, right_key, n_buckets)
    ldf, rdf = spark.table(lt), spark.table(rt)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
