"""Reference-corpus shape fixtures (BASELINE.md anchors, miniature).

The reference's published numbers pin three structural invariants of
its real 56k-module corpus:

- SCC profile: 56,291 components, max size 9, top-10 partition sizes
  [9, 6, 5, 5, 5, 4, 4, 4, 3, 3] (documentation/queries.md:133-167) —
  a near-DAG with a few small cycles.
- Hub skew: lodash has in-degree 5,931 while the median module has a
  handful (analysis/degree-centrality-(dependencies-dependants).csv:2).
- Path multiplicity: 321,265 matched paths vs 347 distinct nodes from
  one anchor (documentation/queries.md:306-311) — paths >> nodes.

These tests replay each invariant at 1/10-ish scale on deterministic
synthetic graphs, tying the engine's operators to the corpus shapes the
reference actually measured (round-1 verdict item 10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# the reference's top-10 SCC partition sizes, verbatim
REF_TOP10_SCC_SIZES = [9, 6, 5, 5, 5, 4, 4, 4, 3, 3]


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


def test_scc_profile_matches_reference_shape(spark):
    """Near-DAG + planted cycles of the reference's exact top-10 sizes:
    SCC must recover every planted partition size and make everything
    else a singleton (max component size 9, like the real corpus)."""
    from github_miner_spark.graph.algorithms import strongly_connected_components

    pairs = []
    nid = 0
    planted_members = []
    for size in REF_TOP10_SCC_SIZES:
        members = list(range(nid, nid + size))
        # a simple cycle through the members = one SCC of that size
        pairs += [(members[i], members[(i + 1) % size]) for i in range(size)]
        planted_members.append(members)
        nid += size
    # acyclic fringe: a binary out-tree of 200 extra nodes hanging off
    # the first cycle (all singletons after trim)
    base = nid
    for i in range(200):
        parent = base + (i - 1) // 2 if i > 0 else planted_members[0][0]
        pairs.append((parent, base + i))
    comp = strongly_connected_components(_df(spark, pairs))
    sizes = sorted(
        (
            r["n"]
            for r in comp.groupBy("component").agg(F.count("*").alias("n")).collect()
        ),
        reverse=True,
    )
    assert sizes[:10] == REF_TOP10_SCC_SIZES
    assert all(s == 1 for s in sizes[10:])
    n_nodes = sum(REF_TOP10_SCC_SIZES) + 200
    assert sum(sizes) == n_nodes
    assert len(sizes) == n_nodes - sum(REF_TOP10_SCC_SIZES) + 10


def test_hub_skew_degree_anchor(spark):
    """A lodash-like hub: one module with in-degree 593 (1/10 the real
    5,931) in a low-degree background. The degree top-k must isolate it
    exactly — the skew shape AQE's skew-join handling exists for."""
    HUB = 10_000
    pairs = [(i, HUB) for i in range(593)]
    # background: modest chain with in-degree 1
    pairs += [(i, i + 1) for i in range(20_000, 20_050)]
    e = _df(spark, pairs)
    indeg = (
        e.groupBy("dst").agg(F.count("*").alias("dependants"))
        .orderBy(F.desc("dependants"), F.asc("dst"))
    )
    top = indeg.limit(3).collect()
    assert top[0]["dst"] == HUB and top[0]["dependants"] == 593
    assert top[1]["dependants"] == 1


def test_path_multiplicity_far_exceeds_distinct_nodes(spark):
    """Diamond chain: 12 stacked diamonds give 2^12 = 4,096 paths over
    only 25 distinct nodes from the anchor — the paths >> distinct
    invariant behind the reference's 321,265 / 347 measurement, with
    both multiplicity semantics computed by the same operator."""
    from github_miner_spark.graph.paths import closure_path_counts

    pairs = []
    for d in range(12):
        a, left, right, b = 3 * d, 3 * d + 1, 3 * d + 2, 3 * (d + 1)
        pairs += [(a, left), (a, right), (left, b), (right, b)]
    closure = closure_path_counts(_df(spark, pairs), roots=[0], broadcast_frontier=True)
    row = closure.agg(
        F.sum("paths").alias("paths"), F.count("node").alias("distinct_nodes")
    ).collect()[0]
    # paths: each full diamond multiplies by 2; partial sums along the way
    # distinct: 3 per diamond + final sink, minus the anchor itself
    assert row["distinct_nodes"] == 36
    # paths to the final sink alone must be exactly 2^12
    sink = closure.filter(F.col("node") == 36).collect()[0]
    assert sink["paths"] == 4096
