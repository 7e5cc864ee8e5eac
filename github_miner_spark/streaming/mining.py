"""The mining loop as a Structured Streaming source (SURVEY.md §2.10's
stated upgrade path for R5/R6).

The batch side (etl/mining.py run_mining_job) plans search partitions,
resume-filters them via ``pending_partitions``, fetches, and lands the
lake as owner-partitioned JSON. This module closes the loop
Spark-natively: the landed lake becomes a ``readStream`` file source,
and downstream ingestion drains it incrementally with
``trigger(availableNow=True)`` under a streaming checkpoint.

Two checkpoint layers, mirroring the reference's semantics
(src/miner.ts:83-86 processed-date-ranges skip):
- the MINING checkpoint (job-state parquet + pending_partitions
  anti-join) makes re-fetching idempotent — R6 on the producer side;
- the STREAMING checkpoint (checkpointLocation's file-source log)
  makes lake ingestion exactly-once — each landed JSON file is
  processed by exactly one microbatch, across any number of drain
  invocations, including after a restart.

So "mine -> drain -> mine more -> drain" lands every fetched repo row
exactly once in the downstream store with no coordination between the
two sides beyond the directory contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from github_miner_spark.etl.mining import LANDED_SCHEMA

# read-back schema: owner is a partition directory, not a JSON field
LAKE_SCHEMA = (
    ", ".join(
        f for f in LANDED_SCHEMA.split(", ") if not f.startswith("owner ")
    )
    + ", owner string"
)


def stream_landed_lake(
    spark: SparkSession, lake_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the mining lake (run_mining_job's JSON
    sink). ``maxFilesPerTrigger`` bounds per-microbatch intake — the
    streaming analog of the reference's requests/min rate cap."""
    reader = spark.readStream.schema(LAKE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format("json").load(lake_dir)


def drain_lake(
    spark: SparkSession,
    lake_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every currently-landed-but-unprocessed lake file into the
    parquet store at ``out_dir``, exactly once, then stop.

    The parquet sink's transaction log plus the source checkpoint give
    end-to-end exactly-once: re-invoking after new mining runs appends
    only the newly landed files; re-invoking with nothing new is a
    no-op. This is the Structured-Streaming form of the reference's
    'poll until all partitions processed, then exit' loop
    (src/miner.ts:167-181), with the checkpoint location playing the
    role of the Redis processed-set."""
    src = stream_landed_lake(spark, lake_dir, max_files_per_trigger)
    q = (
        src.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_drained(spark: SparkSession, out_dir: str) -> DataFrame:
    """The drained store, read through the sink's transaction log (so
    files from aborted batches are invisible — the exactly-once read
    side)."""
    return spark.read.parquet(out_dir)
