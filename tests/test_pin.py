"""pin() mechanism contract (VERDICT r12 item 4): the local default
cuts lineage via localCheckpoint; SPARK_GRAFT_RELIABLE_PIN=1 routes
the same frame through a reliable checkpoint against the session
checkpoint dir. Both must return identical rows and a lineage-cut
plan (scan of an RDD / checkpoint, no upstream parquet scan)."""

from __future__ import annotations

import importlib

from pyspark.sql import functions as F

from github_miner_spark.functions import pin as pin_mod


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_local_pin_cuts_lineage_and_keeps_rows(spark):
    base = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    pinned = pin_mod.pin(base)
    assert _rows(pinned) == _rows(base)
    assert "LogicalRDD" in pinned._jdf.queryExecution().optimizedPlan().toString()


def test_reliable_pin_round_trips(spark, monkeypatch, tmp_path):
    monkeypatch.setattr(pin_mod, "RELIABLE", True)
    monkeypatch.setattr(pin_mod, "CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    # a fresh checkpoint dir must be adopted when none is set; if the
    # session already has one (another test), pin() must keep working
    base = spark.range(50).select(F.col("id"), (F.col("id") % 7).alias("m"))
    pinned = pin_mod.pin(base)
    assert _rows(pinned) == _rows(base)
    assert spark.sparkContext.getCheckpointDir() is not None


def test_env_controls_mechanism(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_PIN", "1")
    importlib.reload(pin_mod)
    assert pin_mod.RELIABLE is True
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_PIN")
    importlib.reload(pin_mod)
    assert pin_mod.RELIABLE is False
