"""Skew (salting) and bucketing: result-equality plus plan-shape
assertions for the scale techniques the relational layer relies on."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from github_miner_spark.functions.skew import salted_count, salted_join
from github_miner_spark.graph.store import load_graph

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_count_matches_direct(spark):
    e = load_graph(spark, SF).edges
    direct = e.groupBy("dst").agg(F.count("*").alias("n"))
    salted = salted_count(e, "dst", salts=16)
    assert _rows(direct) == _rows(salted)


def test_salted_join_matches_direct(spark):
    g = load_graph(spark, SF)
    deg = g.edges.groupBy("dst").agg(F.count("*").alias("n"))
    names = g.vertices.select(F.col("id").alias("dst"), "name")
    direct = deg.join(names, "dst").select("dst", "n", "name")
    salted = salted_join(deg, names, "dst", salts=4).select("dst", "n", "name")
    assert _rows(direct) == _rows(salted)


def test_bucketed_join_avoids_shuffle(spark):
    """Pre-bucketing both sides of a repeated equi-join on the join key
    removes the per-query shuffle: the sort-merge join reads bucketed
    scans with NO Exchange on either side. (Warehouse dir is the
    session default under /tmp, see session.py.)"""
    e = load_graph(spark, SF).edges
    deg = e.groupBy("dst").agg(F.count("*").alias("n"))
    e.write.bucketBy(8, "dst").sortBy("dst").mode("overwrite").saveAsTable("edges_b")
    deg.write.bucketBy(8, "dst").sortBy("dst").mode("overwrite").saveAsTable("deg_b")
    try:
        # disable auto-broadcast so the join planner must pick SMJ —
        # the point is the missing Exchange, not the join strategy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("edges_b").join(spark.table("deg_b"), "dst")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == e.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS edges_b")
        spark.sql("DROP TABLE IF EXISTS deg_b")


def test_spread_to_session_width(spark):
    """The tiny-scan spread must widen a single-partition input to the
    session shuffle width, preserve rows exactly, and leave an
    already-wide input untouched (the real-scale no-op path)."""
    from github_miner_spark.functions.skew import spread_to_session_width

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = spark.range(1000).coalesce(1)
    spread = spread_to_session_width(narrow)
    assert spread.rdd.getNumPartitions() == width
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))
    # already-wide, exchange-free input (range with explicit slices —
    # repartition() would introduce an Exchange and trip the contract)
    wide = spark.range(0, 1000, 1, width + 4)
    assert spread_to_session_width(wide) is wide


def test_spread_to_session_width_rejects_shuffled_input(spark):
    """The scan-only contract is enforced, not just documented: a plan
    containing an Exchange raises before the df.rdd probe, so a future
    call site on a shuffled frame fails loudly instead of silently
    materializing (then re-running) its upstream AQE stages."""
    import pytest as _pytest

    from github_miner_spark.functions.skew import spread_to_session_width

    shuffled = spark.range(1000).repartition(4)
    with _pytest.raises(ValueError, match="scan-stage-only"):
        spread_to_session_width(shuffled)
    grouped = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    with _pytest.raises(ValueError, match="scan-stage-only"):
        spread_to_session_width(grouped)
