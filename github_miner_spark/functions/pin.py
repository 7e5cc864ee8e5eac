"""Lineage-cutting pin for CORPUS-SCALE frames consumed more than
once (VERDICT r12 item 4 — the durability classification of the
engine's localCheckpoint sites; plans/r13/pin_audit.md carries the
per-site sweep).

Mechanism choice, measured and reasoned this round:

- ``localCheckpoint(eager=False)`` (the local default): blocks are
  executor-local and non-replicated with lineage truncated, so on a
  real cluster a lost executor fails the query (the driver re-runs
  it) instead of recomputing the partition. Correct for local[*] and
  for bounded rollup/k-row frames anywhere; a documented durability
  trade for corpus-scale frames at 1000-executor scale.
- ``checkpoint(eager=False)`` (``SPARK_GRAFT_RELIABLE_PIN=1``): the
  production mechanism for corpus-scale pins — data lands in the
  session checkpoint dir (a replicated DFS in production; env
  ``SPARK_GRAFT_CHECKPOINT_DIR``, default /tmp/spark-graft-ckpt),
  survives executor loss, same lineage cut, same plan shape
  (ExistingRDD scan either way, so the committed plan pins hold under
  both mechanisms).
- ``persist(MEMORY_AND_DISK)`` was considered and REJECTED: Spark's
  CacheManager substitutes cached data into ANY canonically-equal
  later plan, so a persist inside a query function would silently
  serve one bench pass's intermediate to the next pass (the banned
  cross-run result-caching class) and nothing ever unpersists it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

RELIABLE = bool(os.environ.get("SPARK_GRAFT_RELIABLE_PIN"))
CHECKPOINT_DIR = os.environ.get(
    "SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/spark-graft-ckpt"
)


def pin(df: DataFrame) -> DataFrame:
    """Cut lineage and materialize-on-first-use a frame that multiple
    consumers read. Local default: localCheckpoint (non-replicated —
    fine in local mode, a durability trade at cluster scale).
    SPARK_GRAFT_RELIABLE_PIN=1: a reliable checkpoint against the
    session checkpoint dir (replicated storage in production)."""
    if RELIABLE:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(CHECKPOINT_DIR)
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
