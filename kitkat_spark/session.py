"""SparkSession factory.

Tuned for the test harness (local[N], one JVM) but every setting is the one
you'd want on a 1000-executor cluster too: AQE on (runtime shuffle-partition
coalescing, skew-join splitting, broadcast demotion), Arrow for the Python
boundary, UTC session timezone so timestamp semantics match the DuckDB oracle.

At 100 TB the only knobs that change are cluster-level (executor count/memory,
`spark.sql.shuffle.partitions` as a *ceiling* — AQE coalesces down), not
anything baked into operator code here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kitkat_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Local mode: shuffle partitions ≈ cores. On a real cluster this would be
    # 2-3× total cores as a ceiling; AQE coalesces small partitions either way.
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
