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
# entries. This explicit window lists a covering set of SURVEY §2:
# every operator family has at least one oracle-backed query inside it.
#
# Rotation policy (refined each round; r8 adds the freshness guard):
# (a) queries whose implementation changed AFTER the previous window
# was pinned (they have no post-change driver witness), then (b) the
# queries NEW this round, then (c) re-greens for every implementation
# this round touched, then (d) the oldest driver witnesses — rows age
# as implementations around them move, so the rotation re-earns them
# a round at a time. The rotation commit must be the round's LAST
# code-touching commit (tools/check_window_freshness.py verifies the
# net diff from it to HEAD), so (c) can never silently rot. The full
# registry stays pinned by the local every-query oracle sweep
# (tests/test_oracle_parity.py) regardless of window membership.
CORRECTNESS_WINDOW: tuple[str, ...] = (
    # Round-8 window (VERDICT r7 item 1; re-pinned after each late
    # engine commit). Rotation discipline: this
    # rotation is the round's LAST code-touching commit, verified by
    # tools/check_window_freshness.py (net-diff from this commit to
    # HEAD must touch no engine/query code), so every re-green below
    # witnesses the shipped implementation — the r7 race class is
    # mechanically closed.
    # -- (a) r7 task-kernel family (ce85fdc landed AFTER the r7 window
    #        was pinned; these ten had no post-change driver witness) --
    "louvain_communities",
    "louvain_per_reltype",
    "cypher_community_readback",
    "all_shortest_paths_pairs",
    "k_core_decomposition",
    "closure_counts_from_anchor",
    "closure_per_root",
    "cypher_closure_from_anchor",
    "dependency_graph_paths",
    "dependency_chains",
    # -- (b) new this round ---------------------------------------------
    "bpe_vocab_induction",
    "bpe_segmentation_stats",
    "skipgram_negative_samples",
    "anf_neighborhood_function",
    # -- (c) re-greens for round-8-touched implementations: the walk
    #        store (3 queries), the depth-profile task opt-in (3), the
    #        betweenness replication gate, the weighted-SSSP conditional
    #        checkpoint, the SCC whole-core shortcut (3), the CC
    #        star-forest probe + whole-graph union-find kernel's
    #        consumers (4), and the skew-guard / store-key refactor
    #        representatives (2) ------------------------------------------
    "deterministic_random_walks",
    "node2vec_biased_walks",
    "walk_skipgram_pairs",
    "bfs_depth_profile",
    "depth_extremes_per_root",
    "harmonic_centrality_roots",
    "betweenness_centrality_sample",
    "weighted_shortest_distances",
    "scc_summary",
    "scc_size_histogram",
    "cypher_scc_readback",
    "connected_components_summary",
    "dedup_clusters",
    "leakage_free_split_assignment",
    "corpus_filter_funnel",
    "simhash_values",
    "simhash_near_dups",
    # -- (d) witness backlog: all 16 remaining r03 rows -------------------
    "label_histogram",
    "manifest_edge_roundtrip",
    "minhash_lsh_dups",
    "modules_used_by_repo",
    "motif_shared_module_pairs",
    "motif_unhosted_dependencies",
    "multimodal_byte_features",
    "orders_running_rank",
    "pricing_summary",
    "rel_type_histogram",
    "repos_depending_on_module",
    "sql_supplier_nation_rollup",
    "stratified_sample_counts",
    "triangle_counts_top",
    "users_by_repos_owned",
    "version_range_profile",
    # -- (e) oldest r04 rows to fill the 50 -------------------------------
    "embedding_int8_topk",
    "embedding_ivf_int8_topk",
    "bpe_merge_candidates",
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
