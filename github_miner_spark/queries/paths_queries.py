"""Variable-length path queries (SURVEY.md §2.3 J6-J8, §2.4 A4,
§2.7 G6-G8) — the reference's ``-[:DEPENDS_ON*]->`` Cypher surface.

Oracles use DuckDB ``WITH RECURSIVE`` over the same graph derivation;
the Spark side runs the frontier-BFS operators in graph/paths.py. The
module->module DEPENDS_ON relation is acyclic by construction
(graph/model.py), so UNION ALL recursion terminates; cycle-safety of
the engine itself is unit-tested on cyclic fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_miner_spark.graph.model import (
    DEPENDS_ON,
    DEV_DEPENDS_ON,
    GRAPH_ORACLE_CTES,
    NODE_MODULE,
)
from github_miner_spark.graph.store import load_graph
from github_miner_spark.graph.paths import (
    all_shortest_paths_multi,
    bfs_depths,
    closure_path_counts,
    k_hop,
)
from github_miner_spark.registry import register

# module id 2 == p_partkey 0: the root of the binary-tree DAG — the
# analog of the reference's "paths from rossanthony/github-miner" probe
# (documentation/queries.md:280-339).
ANCHOR_MODULE = 2


@register(
    "closure_counts_from_anchor",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , walk(node) AS (
        SELECT dst FROM mm_edges WHERE src = {ANCHOR_MODULE}
        UNION ALL
        SELECT e.dst FROM walk w JOIN mm_edges e ON e.src = w.node
    )
    SELECT count(*) AS paths, count(DISTINCT node) AS distinct_nodes FROM walk
    """,
    description="Unbounded closure from one module: total paths vs distinct "
    "nodes — BOTH multiplicity semantics, reference documentation/queries.md:280-311",
    tags=("graph", "paths", "iterative"),
)
def closure_counts_from_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    closure = closure_path_counts(
        g.module_dep_edges(), roots=[ANCHOR_MODULE], broadcast_frontier=True
    )
    return closure.agg(
        F.sum("paths").alias("paths"),
        F.count("node").alias("distinct_nodes"),
    )


@register(
    "closure_per_root",
    oracle=GRAPH_ORACLE_CTES
    + """
    , roots AS (SELECT DISTINCT src FROM mm_edges WHERE src < 100),
    walk(root, node) AS (
        SELECT e.src, e.dst FROM mm_edges e JOIN roots r ON e.src = r.src
        UNION ALL
        SELECT w.root, e.dst FROM walk w JOIN mm_edges e ON e.src = w.node
    )
    SELECT root AS root, count(*) AS paths, count(DISTINCT node) AS distinct_nodes
    FROM walk GROUP BY root ORDER BY root
    """,
    description="Per-root path/distinct counts over the closure — the per-module "
    "breakdown table of reference documentation/queries.md:306-338",
    tags=("graph", "paths", "iterative"),
)
def closure_per_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    roots = mm.filter(F.col("src") < 100).select(F.col("src").alias("root")).distinct()
    closure = closure_path_counts(mm, roots=roots, broadcast_frontier=True)
    return (
        closure.groupBy("root")
        .agg(F.sum("paths").alias("paths"), F.count("node").alias("distinct_nodes"))
        .orderBy("root")
    )


@register(
    "bfs_depth_profile",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , walk(node, depth) AS (
        SELECT dst, 1 FROM mm_edges WHERE src = {ANCHOR_MODULE}
        UNION ALL
        SELECT e.dst, w.depth + 1 FROM walk w JOIN mm_edges e ON e.src = w.node
    )
    SELECT node AS node, min(depth) AS depth FROM walk GROUP BY node ORDER BY node
    """,
    description="BFS min-depth per reachable node from the anchor — depth "
    "profile of reference analysis/export.csv (OutDepth)",
    tags=("graph", "paths", "iterative"),
)
def bfs_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    # per_root_task_threshold (VERDICT r7 item 6): the anchored probe
    # over the scan-backed module edge set fits an executor task at any
    # bench SF, so the BFS runs task-locally (3 stages, no per-level
    # barriers) — the closeness opt-in, applied family-wide; past the
    # threshold bfs_depths falls back to its windowed loop unchanged
    depths = bfs_depths(
        g.module_dep_edges(),
        roots=[ANCHOR_MODULE],
        broadcast_frontier=True,
        per_root_task_threshold=5_000_000,
    )
    return depths.select("node", "depth").orderBy("node")


@register(
    "depth_extremes_per_root",
    oracle=GRAPH_ORACLE_CTES
    + """
    , roots AS (SELECT DISTINCT src FROM mm_edges WHERE src < 200),
    walk(root, node, depth) AS (
        SELECT e.src, e.dst, 1 FROM mm_edges e JOIN roots r ON e.src = r.src
        UNION ALL
        SELECT w.root, e.dst, w.depth + 1 FROM walk w JOIN mm_edges e ON e.src = w.node
    ),
    mind AS (SELECT root, node, min(depth) AS d FROM walk GROUP BY root, node)
    SELECT root AS root, min(d) AS min_out_depth, max(d) AS max_out_depth,
           count(*) AS reachable
    FROM mind GROUP BY root ORDER BY root
    """,
    description="Per-root min/max BFS out-depth + reachable count — "
    "reference analysis/export.csv header (min/max In/OutDepth)",
    tags=("graph", "paths", "iterative"),
)
def depth_extremes_per_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    roots = mm.filter(F.col("src") < 200).select(F.col("src").alias("root")).distinct()
    # per-root task opt-in (VERDICT r7 item 6): bfs_depths collapses
    # the DataFrame root set to an explicit list when it is
    # broadcast-sized, then runs each root's BFS inside one
    # applyInPandas task — the closeness floor cut, applied here
    depths = bfs_depths(
        mm, roots=roots, broadcast_frontier=True, per_root_task_threshold=5_000_000
    )
    return (
        depths.groupBy("root")
        .agg(
            F.min("depth").alias("min_out_depth"),
            F.max("depth").alias("max_out_depth"),
            F.count("*").alias("reachable"),
        )
        .orderBy("root")
    )


@register(
    "two_hop_dependencies",
    oracle=GRAPH_ORACLE_CTES
    + """
    , rels AS (
        SELECT src, dst FROM edges
        WHERE rel_type IN ('DEPENDS_ON', 'DEV_DEPENDS_ON')
          AND src <> dst
    ),
    hop1 AS (SELECT src AS root, dst AS node, 1 AS depth FROM rels WHERE root = 421),
    hop2 AS (SELECT h.root, r.dst AS node, 2 AS depth
             FROM hop1 h JOIN rels r ON r.src = h.node)
    SELECT node AS node, min(depth) AS depth
    FROM (SELECT * FROM hop1 UNION ALL SELECT * FROM hop2)
    GROUP BY node ORDER BY node
    """,
    description="Bounded 2-hop expansion over DEPENDS_ON|DEV_DEPENDS_ON from a "
    "repo — reference src/insertData.ts:60 ([*..2] multi-rel union)",
    tags=("graph", "paths", "k-hop"),
)
def two_hop_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_graph(spark, sf_dir).edges
    rels = e.filter(
        e.rel_type.isin(DEPENDS_ON, DEV_DEPENDS_ON) & (e.src != e.dst)
    ).select("src", "dst")
    out = k_hop(rels, [421], k=2, distinct_nodes=True)
    return out.select("node", "depth").orderBy("node")


@register(
    "dependency_chains",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , walk(node, chain) AS (
        SELECT dst, [CAST({ANCHOR_MODULE} AS BIGINT), dst] FROM mm_edges
        WHERE src = {ANCHOR_MODULE}
        UNION ALL
        SELECT e.dst, list_append(w.chain, e.dst)
        FROM walk w JOIN mm_edges e ON e.src = w.node
        WHERE len(w.chain) <= 4
    )
    SELECT array_to_string(chain, '|') AS chain
    FROM walk WHERE len(chain) = 5 ORDER BY chain
    """,
    description="Path enumeration with node-id chains (bounded depth 4->5 "
    "nodes) — reference documentation/queries.md:360-365 depsChain. Chain "
    "serialized '|'-joined so the driver's row canonicalizer can hash it.",
    tags=("graph", "paths", "enumeration"),
)
def dependency_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    # accumulate the id chain as an array column over 4 expansion steps
    frontier = (
        mm.filter(F.col("src") == ANCHOR_MODULE)
        .select(
            F.col("dst").alias("node"),
            F.array(F.lit(ANCHOR_MODULE).cast("bigint"), F.col("dst")).alias("chain"),
        )
    )
    for _ in range(3):  # chains grow 2 -> 5 ids (4 hops)
        frontier = frontier.join(mm, frontier.node == mm.src).select(
            F.col("dst").alias("node"),
            F.concat(F.col("chain"), F.array(F.col("dst"))).alias("chain"),
        )
    return (
        frontier.filter(F.size("chain") == 5)
        .select(F.concat_ws("|", F.col("chain").cast("array<string>")).alias("chain"))
        .orderBy("chain")
    )


@register(
    "all_shortest_paths_pairs",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , walk AS (
        SELECT CAST({ANCHOR_MODULE} AS BIGINT) AS node,
               [CAST({ANCHOR_MODULE} AS BIGINT)] AS path, 0 AS len
        UNION ALL
        SELECT e.dst, list_append(w.path, e.dst), w.len + 1
        FROM walk w JOIN mm_edges e ON e.src = w.node
        WHERE w.len < 6
    ),
    targets AS (
        SELECT (SELECT max(p_partkey) - 1 FROM part) * 10 + 2 AS t
        UNION ALL SELECT 132
    ),
    sp AS (
        SELECT w.node, w.path, w.len FROM walk w JOIN targets ON w.node = targets.t
    )
    SELECT node AS dst, array_to_string(path, '|') AS path, CAST(len AS INT) AS length
    FROM sp s WHERE len = (SELECT min(len) FROM sp s2 WHERE s2.node = s.node)
    """,
    description="allShortestPaths((a)-[:DEPENDS_ON*]->(b)) for two "
    "(anchor, target) pairs — hub module mk-1 and module 13 — enumerated "
    "inside the shortest-path DAG (reference documentation/queries.md:74-79) "
    "in ONE batched multi-target pass (2 BFS sweeps total, no per-target "
    "driver loop). Paths '|'-serialized so the driver canonicalizer hashes.",
    tags=("graph", "paths", "iterative"),
)
def all_shortest_paths_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    # hub target: module id of max(p_partkey)-1 — huge in-degree by
    # construction; scalar fetched driver-side for loop control only
    hub = mm.agg(((F.floor(F.max("dst") / 10) - 1) * 10 + 2).alias("h")).collect()[0]["h"]
    out = all_shortest_paths_multi(mm, ANCHOR_MODULE, [int(hub), 132])
    return out.select(
        F.col("target").alias("dst"),
        F.concat_ws("|", F.col("path").cast("array<string>")).alias("path"),
        F.col("length").cast("int").alias("length"),
    )


@register(
    "harmonic_centrality_roots",
    oracle=GRAPH_ORACLE_CTES
    + """
    , hroots AS (SELECT DISTINCT src FROM mm_edges WHERE src < 200),
    hwalk(root, node, depth) AS (
        SELECT e.src, e.dst, 1 FROM mm_edges e JOIN hroots r ON e.src = r.src
        UNION ALL
        SELECT w.root, e.dst, w.depth + 1 FROM hwalk w JOIN mm_edges e ON e.src = w.node
    ),
    hmind AS (SELECT root, node, min(depth) AS d FROM hwalk GROUP BY root, node)
    SELECT root AS root,
           CAST(count(*) AS BIGINT) AS reachable,
           round(sum(1.0 / d), 6) AS harmonic
    FROM hmind GROUP BY root
    ORDER BY round(sum(1.0 / d), 6) DESC, root
    LIMIT 20
    """,
    description="Outbound harmonic centrality for the anchored root set "
    "(the closeness-family member of the plugin set the reference "
    "installs that is defined on disconnected graphs): H(r) = sum of "
    "1/min_depth over every node reachable from r. Reuses the batched "
    "multi-root BFS (one frontier loop for ALL roots, root-keyed "
    "state) plus one aggregate — no per-root sweeps; top 20 by the "
    "6dp-rounded score with the root tiebreak.",
    tags=("graph", "paths", "centrality", "iterative"),
)
def harmonic_centrality_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    roots = mm.filter(F.col("src") < 200).select(F.col("src").alias("root")).distinct()
    # per-root task opt-in (VERDICT r7 item 6): same floor cut as
    # closeness — the root set is broadcast-sized by construction
    depths = bfs_depths(
        mm, roots=roots, broadcast_frontier=True, per_root_task_threshold=5_000_000
    )
    h = F.round(F.sum(1.0 / F.col("depth")), 6)
    return (
        depths.groupBy("root")
        .agg(F.count("*").alias("reachable"), h.alias("harmonic"))
        .orderBy(F.col("harmonic").desc(), "root")
        .limit(20)
    )


@register(
    "dependency_graph_paths",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , pwalk(node, chain) AS (
        SELECT dst, [CAST({ANCHOR_MODULE} AS BIGINT), dst] FROM mm_edges
        WHERE src = {ANCHOR_MODULE}
        UNION ALL
        SELECT e.dst, list_append(w.chain, e.dst)
        FROM pwalk w JOIN mm_edges e ON e.src = w.node
        WHERE NOT list_contains(w.chain, e.dst)
    )
    SELECT array_to_string(chain, '|') AS chain,
           CAST(len(chain) - 1 AS INT) AS length
    FROM pwalk ORDER BY chain
    """,
    description="The reference's FIRST documented query (MATCH "
    "dependencyGraph=(a)-[:DEPENDS_ON*]->(child) RETURN dependencyGraph, "
    "documentation/queries.md:25-28): EVERY simple path of length >= 1 "
    "out of the anchor — each reachable prefix is a row, the "
    "output-proportional enumeration behind the corpus's 321k-path "
    "statistics. Engine = graph.paths.enumerate_simple_paths (frontier "
    "loop, array-containment guard, one checkpoint per level); chains "
    "'|'-serialized for the driver canonicalizer.",
    tags=("graph", "paths", "enumeration", "iterative"),
)
def dependency_graph_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_miner_spark.graph.paths import enumerate_simple_paths

    g = load_graph(spark, sf_dir)
    paths = enumerate_simple_paths(g.module_dep_edges(), ANCHOR_MODULE)
    return paths.select(
        F.concat_ws("|", F.col("path").cast("array<string>")).alias("chain"),
        F.col("length").cast("int").alias("length"),
    ).orderBy("chain")


@register(
    "weighted_shortest_distances",
    oracle=GRAPH_ORACLE_CTES
    + f"""
    , wedges AS (
        SELECT src, dst, 1.0 + (dst % 7) / 4.0 AS w FROM mm_edges
    ),
    walk(node, cost) AS (
        SELECT dst, w FROM wedges WHERE src = {ANCHOR_MODULE}
        UNION ALL
        SELECT e.dst, wk.cost + e.w
        FROM walk wk JOIN wedges e ON e.src = wk.node
    )
    SELECT node AS node, min(cost) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
    description="Weighted single-source shortest distances from the "
    "anchor (algo.dijkstra / weighted algo.shortestPath of the plugin "
    "set the reference installs): per reachable module, the minimum "
    "path cost under a deterministic per-edge weight "
    "w = 1 + (dst mod 7)/4 — quarter-valued doubles, so every path "
    "sum is exact in binary and min() is engine-stable without "
    "rounding. Hybrid on the closure family's shared gate: heap "
    "Dijkstra in-driver under the edge threshold, level-synchronous "
    "Bellman-Ford relaxation (one keyed min-merge per round, rounds "
    "bounded by optimal-path hop length, non-convergence raises) "
    "distributed; the anchored probe runs broadcast-frontier. Oracle "
    "enumerates every path via the recursive CTE and takes the min — "
    "a structurally different formulation than either engine path.",
    tags=("graph", "paths", "iterative", "weighted"),
)
def weighted_shortest_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_miner_spark.graph.paths import weighted_sssp

    g = load_graph(spark, sf_dir)
    wedges = g.module_dep_edges().select(
        "src",
        "dst",
        (F.lit(1.0) + (F.col("dst") % 7) / F.lit(4.0)).alias("w"),
    )
    dists = weighted_sssp(wedges, ANCHOR_MODULE, broadcast_frontier=True)
    return dists.select("node", "dist").orderBy("node")
