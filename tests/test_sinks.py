"""Roundtrip tests for the file sinks (SURVEY.md §2.1 S7-S9, S11)."""

from __future__ import annotations

import tempfile

from github_miner_spark.graph.store import load_graph
from github_miner_spark.io import sinks

SF = "/root/testdata/sf0.001"


def _assert_same_rows(a, b):
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_csv_roundtrip(spark):
    deg = (
        load_graph(spark, SF)
        .edges.groupBy("rel_type")
        .count()
        .withColumnRenamed("count", "n")
    )
    with tempfile.TemporaryDirectory() as d:
        sinks.write_csv(deg, f"{d}/out", num_files=1)
        back = sinks.read_csv_back(spark, f"{d}/out", "rel_type string, n bigint")
        _assert_same_rows(deg, back)


def test_json_roundtrip(spark):
    v = load_graph(spark, SF).vertices.select("id", "label", "name")
    with tempfile.TemporaryDirectory() as d:
        sinks.write_json(v, f"{d}/lake")
        back = sinks.read_json_back(spark, f"{d}/lake", "id bigint, label string, name string")
        _assert_same_rows(v, back)


def test_snapshot_restore(spark):
    e = load_graph(spark, SF).edges
    with tempfile.TemporaryDirectory() as d:
        sinks.snapshot(e, f"{d}/edges")
        back = sinks.restore(spark, f"{d}/edges")
        assert back.count() == e.count()
        assert back.schema == e.schema


def test_training_shards_ordered_and_manifested(spark, tmp_path):
    docs = __import__("github_miner_spark.io.tables", fromlist=["load_table"]).load_table(
        spark, "documents", SF
    )
    out = str(tmp_path / "shards")
    manifest = sinks.write_training_shards(docs, out, "doc_id", num_shards=4)
    assert manifest["rows"] == docs.count()
    assert manifest["files"] >= 4
    import json
    import os

    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        assert json.load(fh) == manifest
    # range sharding: per-file key ranges must not overlap
    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    ranges = []
    for f in files:
        df = spark.read.parquet(os.path.join(out, f))
        row = df.agg({"doc_id": "min"}).collect()[0][0], df.agg({"doc_id": "max"}).collect()[0][0]
        if row[0] is not None:
            ranges.append(row)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges


def test_gephi_events_protocol(spark):
    e = spark.createDataFrame(
        [(1, 2, "DEPENDS_ON"), (2, 3, "OWNS")], "src bigint, dst bigint, rel_type string"
    )
    import json

    lines = [json.loads(r["value"]) for r in sinks.gephi_events(e).collect()]
    an = [ev["an"] for ev in lines if "an" in ev]
    ae = [ev["ae"] for ev in lines if "ae" in ev]
    assert {k for ev in an for k in ev} == {"1", "2", "3"}
    edges = {k: v for ev in ae for k, v in ev.items()}
    assert edges["1-2"] == {"source": "1", "target": "2", "directed": True, "label": "DEPENDS_ON"}
    assert edges["2-3"]["label"] == "OWNS"


def test_gephi_stream_sink_drains_batches(spark):
    """S10: streaming edges -> foreachBatch -> Gephi event lines
    (apoc.gephi.add analog, reference documentation/queries.md:200-210;
    file transport stands in for the HTTP POST, SURVEY.md §7)."""
    import json

    e = spark.createDataFrame(
        [(1, 2, "DEPENDS_ON"), (1, 3, "DEPENDS_ON"), (3, 4, "PEER_DEPENDS_ON")],
        "src bigint, dst bigint, rel_type string",
    )
    with tempfile.TemporaryDirectory() as d:
        e.write.parquet(f"{d}/edges")
        stream = spark.readStream.schema("src bigint, dst bigint, rel_type string").parquet(
            f"{d}/edges"
        )
        q = sinks.gephi_stream_sink(stream, f"{d}/gephi", f"{d}/ckpt")
        q.awaitTermination(120)
        lines = [json.loads(r["value"]) for r in spark.read.text(f"{d}/gephi").collect()]
        node_ids = {k for ev in lines if "an" in ev for k in ev["an"]}
        edge_ids = {k for ev in lines if "ae" in ev for k in ev["ae"]}
        assert node_ids == {"1", "2", "3", "4"}
        assert edge_ids == {"1-2", "1-3", "3-4"}
