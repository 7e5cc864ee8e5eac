"""Central query registry.

Every operator from SURVEY.md §2 is registered here exactly once with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine), and
- optionally an ANSI-SQL oracle string for DuckDB (the correctness twin).

``__spark_entry__.py`` re-exports this registry through the driver
contract (queries() / oracle_sql()). Column names are aliased
identically on both sides — the driver's hash-compare sorts columns by
name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query with its optional DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import github_miner_spark.queries.relational  # noqa: F401
    import github_miner_spark.queries.graph_queries  # noqa: F401
    import github_miner_spark.queries.paths_queries  # noqa: F401
    import github_miner_spark.queries.algorithms_queries  # noqa: F401
    import github_miner_spark.queries.etl_queries  # noqa: F401
    import github_miner_spark.queries.text_queries  # noqa: F401
    import github_miner_spark.queries.dedup_queries  # noqa: F401
    import github_miner_spark.queries.similarity_queries  # noqa: F401
    import github_miner_spark.queries.events_queries  # noqa: F401
    import github_miner_spark.queries.cypher_queries  # noqa: F401
    import github_miner_spark.queries.curation_queries  # noqa: F401


# The driver's correctness artifact covers the FIRST 50 registry
# entries (CORRECTNESS_r01.json = exactly the first 50; the 19
# LLM-pipeline queries registered past that point got no oracle verdict
# in round 1). This explicit window lists a covering set of SURVEY §2:
# every operator family has at least one oracle-backed query inside it.
#
# Round-3 rotation (VERDICT r2 item 1): rounds 1-2 drove the original
# 50-entry window fully green (CORRECTNESS_r02.json: 50/50 rows+schema+
# hash). This round leads with the queries that have never received
# a driver verdict (the 26 past the 50-slot cap, plus the 7 operators
# new in round 3), so that the union of r02 and r03 artifacts witnesses
# every registered query. The tail re-samples canaries across the
# round-2 families as a regression guard; the remaining round-2 entries
# stay registered (and locally oracle-swept by
# tests/test_oracle_parity.py) but sort past the driver cap.
CORRECTNESS_WINDOW: tuple[str, ...] = (
    # -- never driver-verified (26 from r2 + 7 new in r3) ---------
    # graph algorithms: the reference's flagship community analytics
    "louvain_communities",
    "label_propagation_summary",
    "louvain_per_reltype",
    "scc_size_histogram",
    # relational headliners
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "customer_order_stats_outer",
    "sql_supplier_nation_rollup",
    # graph: histograms / hops / motifs
    "label_histogram",
    "rel_type_histogram",
    "modules_used_by_repo",
    "repos_depending_on_module",
    "users_by_repos_owned",
    "motif_shared_module_pairs",
    "motif_unhosted_dependencies",
    "version_range_profile",
    # paths
    "closure_per_root",
    "depth_extremes_per_root",
    # LLM-pipeline: text / dedup / similarity
    "doc_tfidf_top_terms",
    "simhash_values",
    "dedup_clusters",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    # events
    "events_session_windows",
    # cypher front-end (cypher_hosted_on_outer is new in round 3:
    # OPTIONAL MATCH compiled to a left-outer motif join)
    "cypher_top_used_modules",
    "cypher_unhosted_dependency_count",
    "cypher_hosted_on_outer",
    # new in round 3: curation passes + remaining plugin algorithms
    "benchmark_decontamination",
    "sequence_packing_plan",
    "stratified_sample_counts",
    "node_similarity_jaccard",
    "triangle_counts_top",
    # -- round-2 canaries (green in CORRECTNESS_r02.json) ---------
    "exact_dedup_summary",
    "minhash_lsh_dups",
    "embedding_topk_bruteforce",
    "embedding_cosine_dups",
    "multimodal_byte_features",
    "doc_token_stats",
    "corpus_filter_funnel",
    "events_sessionization",
    "manifest_edge_roundtrip",
    "idempotent_merge",
    "top_dependants_modules",
    "degree_breakdown",
    "closure_counts_from_anchor",
    "all_shortest_paths_pairs",
    "scc_summary",
    "pagerank_top20",
    "orders_running_rank",
    # (dropped-to-fit canaries — all r02-green, still in the local
    # oracle sweep: simhash_near_dups (simhash family witnessed this
    # round by simhash_values), events_daily_active_users,
    # hosted_on_outer (same semantics as cypher_hosted_on_outer),
    # revenue_rollup, one_hop_neighborhood)
)


def all_specs() -> dict[str, QuerySpec]:
    load_all()
    missing = [n for n in CORRECTNESS_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"CORRECTNESS_WINDOW names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in CORRECTNESS_WINDOW}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
