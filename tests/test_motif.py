"""Motif matcher: grammar, join semantics, negation, multiplicity."""

from __future__ import annotations

import pytest

from github_miner_spark.graph.model import PropertyGraph
from github_miner_spark.graph.motif import find, parse_motif


@pytest.fixture()
def tiny_graph(spark):
    edges = spark.createDataFrame(
        [
            (1, 10, "DEPENDS_ON", "GitRepo", "NodeModule", "^1.0.0"),
            (2, 10, "DEPENDS_ON", "GitRepo", "NodeModule", "^2.0.0"),
            (10, 20, "DEPENDS_ON", "NodeModule", "NodeModule", "~1.0.0"),
            (10, 21, "DEV_DEPENDS_ON", "NodeModule", "NodeModule", "~2.0.0"),
            (20, 1, "HOSTED_ON", "NodeModule", "GitRepo", None),
        ],
        "src bigint, dst bigint, rel_type string, src_label string, dst_label string, version string",
    )
    vertices = spark.createDataFrame(
        [(i, "X", f"n{i}", None, None) for i in (1, 2, 10, 20, 21)],
        "id bigint, label string, name string, score double, created_at timestamp",
    )
    return PropertyGraph(vertices, edges)


def test_parse_rejects_bad_terms():
    with pytest.raises(ValueError):
        parse_motif("(a)-[e]-(b)")  # undirected not supported
    with pytest.raises(ValueError):
        parse_motif("!()-[x:DEPENDS_ON]->(b)")  # negation binding an edge
    with pytest.raises(ValueError):
        parse_motif("!(a)-[]->(b)")  # all-negative pattern


def test_two_hop_with_rel_union(tiny_graph):
    rows = find(
        tiny_graph, "(a)-[:DEPENDS_ON]->(b); (b)-[:DEPENDS_ON|DEV_DEPENDS_ON]->(c)"
    ).collect()
    got = sorted((r["a_id"], r["b_id"], r["c_id"]) for r in rows)
    assert got == [(1, 10, 20), (1, 10, 21), (2, 10, 20), (2, 10, 21)]


def test_edge_variable_binds_attributes(tiny_graph):
    rows = find(tiny_graph, "(a)-[e:DEPENDS_ON]->(b)").collect()
    versions = {(r["a_id"], r["e_version"]) for r in rows}
    assert (1, "^1.0.0") in versions and (2, "^2.0.0") in versions
    assert all(r["e_rel_type"] == "DEPENDS_ON" for r in rows)


def test_negation_is_anti_join(tiny_graph):
    # modules depended on by someone but hosted nowhere
    rows = find(tiny_graph, "(r)-[:DEPENDS_ON]->(m); !(m)-[:HOSTED_ON]->()").collect()
    assert sorted({r["m_id"] for r in rows}) == [10]  # 20 is hosted, 10 is not


def test_multiplicity_preserved(tiny_graph):
    # two repos reach module 20 through 10: two rows, not one
    rows = find(tiny_graph, "(a)-[:DEPENDS_ON]->(b); (b)-[:DEPENDS_ON]->(c)").collect()
    assert len(rows) == 2
