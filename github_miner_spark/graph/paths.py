"""Iterative path operators: bounded k-hop, transitive closure with
path multiplicity, BFS reachability/depths (SURVEY.md §2.7 G6-G8,
§2.3 J6-J8, §2.4 A4).

The reference expands variable-length Cypher patterns inside Neo4j
(``-[:DEPENDS_ON*]->``, documentation/queries.md:280-339) and its jest
corpus pins BOTH semantics: 321,265 matched *paths* vs 347 *distinct*
nodes. Here both are driver-orchestrated frontier loops over
DataFrames — set-at-a-time BFS replacing Neo4j's row-at-a-time DFS
(reference src/Neo4jClient.ts:264-332):

- ``closure_path_counts``: per-(root, node) PATH-COUNT closure. Each
  level aggregates (root, node) -> sum(paths), so the state size is
  bounded by |roots| x |nodes| per level, never by the (potentially
  exponential) number of paths. Requires an acyclic edge relation or a
  depth bound — exactly Cypher's termination condition modulo its
  relationship-uniqueness rule, which only matters on cyclic inputs.
- ``reachable_set`` / ``bfs_depths``: DISTINCT-node closure with a
  visited-set anti-join per level (the set-at-a-time analog of the
  reference's "only recurse on first creation" cycle guard,
  src/Neo4jClient.ts:321-327). Cycle-safe on any input.

Scale notes:
- Every iteration ends in ``localCheckpoint(eager=True)`` to truncate
  lineage (without it, iteration N replays all N-1 prior shuffles and
  the plan tree grows quadratically). On a production cluster with a
  checkpoint dir configured, swap for reliable ``checkpoint()``.
- The frontier-edges join shuffles on the frontier node; hub-skew is
  handled by AQE skew-join splitting (enabled in session defaults).
- Iteration count is O(graph depth): the derived module DAG has
  logarithmic depth (tree edges p->2p+1), so closures finish in ~15-25
  rounds at any scale factor.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_root_df(edges: DataFrame, roots) -> DataFrame:
    """Normalize roots into a 1-column DataFrame named ``root``."""
    if roots is None:
        return edges.select(F.col("src").alias("root")).distinct()
    if isinstance(roots, DataFrame):
        cols = roots.columns
        return roots.select(F.col(cols[0]).alias("root")).distinct()
    spark = edges.sparkSession
    return spark.createDataFrame([(int(r),) for r in roots], "root bigint")


def closure_path_counts(
    edges: DataFrame,
    roots=None,
    max_iter: int = 100,
    checkpoint_every: int = 1,
    broadcast_frontier: bool = False,
) -> DataFrame:
    """Transitive closure preserving path multiplicity.

    edges: (src, dst). roots: iterable of ids, a DataFrame, or None for
    all source nodes. Returns (root, node, paths) where ``paths`` is the
    number of distinct paths root ->* node of length >= 1.

    Raises RuntimeError if the frontier is still non-empty after
    ``max_iter`` levels (cyclic input without a depth bound).

    ``broadcast_frontier``: hint the per-level join to broadcast the
    frontier instead of shuffling the edge table every round — 2x
    faster when the root set is small (measured at sf0.1); leave off
    for many-root closures whose frontier may not fit in memory.
    """
    edges = edges.select("src", "dst")
    root_df = _as_root_df(edges, roots)
    frontier = (
        edges.join(root_df, edges.src == root_df.root)
        .groupBy("root", F.col("dst").alias("node"))
        .agg(F.count("*").cast("long").alias("paths"))
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    for it in range(1, max_iter + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            f.join(edges, frontier.node == edges.src)
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.sum("paths").alias("paths"))
        )
        if it % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    else:
        raise RuntimeError(
            f"closure did not converge within {max_iter} levels — cyclic input? "
            "use reachable_set/bfs_depths (cycle-safe) or pass a depth bound"
        )
    all_levels = reduce(lambda a, b: a.unionByName(b), levels)
    return all_levels.groupBy("root", "node").agg(F.sum("paths").alias("paths"))


def bfs_depths(
    edges: DataFrame,
    roots=None,
    max_iter: int = 1000,
    until: int | None = None,
    broadcast_frontier: bool = False,
) -> DataFrame:
    """Min-depth BFS: (root, node, depth) with the smallest hop count
    root ->* node (depth >= 1). Cycle-safe via per-root visited sets.

    ``until``: stop expanding once this node id has been reached (its
    min depth is already final when it first enters the frontier) —
    point-to-point searches then cost O(dist) rounds, not O(diameter)."""
    edges = edges.select("src", "dst")
    root_df = _as_root_df(edges, roots)
    frontier = (
        edges.join(root_df, edges.src == root_df.root)
        .select("root", F.col("dst").alias("node"))
        .distinct()
        .withColumn("depth", F.lit(1))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for depth in range(2, max_iter + 2):
        if until is not None and not frontier.filter(F.col("node") == until).isEmpty():
            break
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            f.join(edges, frontier.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def reachable_set(
    edges: DataFrame, roots=None, max_iter: int = 1000, broadcast_frontier: bool = False
) -> DataFrame:
    """Distinct-node transitive closure: (root, node). Cycle-safe."""
    return bfs_depths(
        edges, roots, max_iter, broadcast_frontier=broadcast_frontier
    ).select("root", "node")


def k_hop(
    edges: DataFrame,
    roots,
    k: int,
    distinct_nodes: bool = True,
) -> DataFrame:
    """Bounded variable-length expansion ``*..k`` as k unrolled joins
    (reference src/insertData.ts:60 uses *..2). Returns (root, node
    [, depth]) for nodes reachable within 1..k hops."""
    edges = edges.select("src", "dst")
    root_df = _as_root_df(edges, roots)
    frontier = (
        edges.join(root_df, edges.src == root_df.root)
        .select("root", F.col("dst").alias("node"))
        .withColumn("depth", F.lit(1))
    )
    levels = [frontier]
    for depth in range(2, k + 1):
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .withColumn("depth", F.lit(depth))
        )
        levels.append(frontier)
    out = reduce(lambda a, b: a.unionByName(b), levels)
    if distinct_nodes:
        return out.groupBy("root", "node").agg(F.min("depth").alias("depth"))
    return out


def shortest_path_length(edges: DataFrame, src: int, dst: int, max_iter: int = 1000):
    """Length of the shortest src ->* dst path, or None if unreachable
    (GraphFrames bfs analog, reference documentation/queries.md:74-79)."""
    depths = bfs_depths(edges, [src], max_iter)
    row = depths.filter(F.col("node") == dst).agg(F.min("depth").alias("d")).collect()[0]
    return row["d"]


def all_shortest_paths(edges: DataFrame, src: int, dst: int, max_iter: int = 1000) -> DataFrame:
    """ALL shortest src ->* dst paths as node-id arrays: (path, length).

    Cypher's ``allShortestPaths((a)-[:DEPENDS_ON*]->(b))`` (reference
    documentation/queries.md:74-79), Spark-first: rather than enumerate
    every walk, run a forward BFS from ``src`` and a reverse BFS from
    ``dst``, keep only nodes with fwd_depth + rev_depth == L (the
    shortest-path DAG), and enumerate paths inside that DAG alone —
    the enumeration touches exactly the edges that appear on some
    shortest path, so work is proportional to the OUTPUT, not to the
    (exponential) walk space. Cycle-safe (BFS visited sets).
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst")
    empty = spark.createDataFrame([], "path array<bigint>, length int")
    fwd = bfs_depths(edges, [src], max_iter, until=dst, broadcast_frontier=True).select(
        "node", F.col("depth").alias("fd")
    )
    lrow = fwd.filter(F.col("node") == dst).agg(F.min("fd").alias("d")).collect()[0]
    length = lrow["d"]
    if length is None:
        return empty
    fwd0 = fwd.unionByName(spark.createDataFrame([(src, 0)], "node bigint, fd int"))
    rev_edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rev = bfs_depths(rev_edges, [dst], max_iter=length, broadcast_frontier=True).select(
        "node", F.col("depth").alias("rd")
    )
    rev0 = rev.unionByName(spark.createDataFrame([(dst, 0)], "node bigint, rd int"))
    onpath = (
        fwd0.join(rev0, "node")
        .filter(F.col("fd") + F.col("rd") == F.lit(length))
        .select("node", "fd")
    )
    s = onpath.select(F.col("node").alias("s_node"), F.col("fd").alias("s_fd"))
    t = onpath.select(F.col("node").alias("t_node"), F.col("fd").alias("t_fd"))
    sp_edges = (
        edges.join(F.broadcast(s), edges.src == s.s_node)
        .join(F.broadcast(t), edges.dst == t.t_node)
        .filter(F.col("t_fd") == F.col("s_fd") + 1)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    frontier = spark.createDataFrame([(src, [src])], "node bigint, path array<bigint>")
    for _ in range(length):
        frontier = (
            F.broadcast(frontier).join(sp_edges, frontier.node == sp_edges.src)
            .select(
                F.col("dst").alias("node"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
    return frontier.filter(F.col("node") == dst).select(
        "path", F.lit(length).cast("int").alias("length")
    )
