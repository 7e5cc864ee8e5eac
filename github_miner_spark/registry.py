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
    import github_miner_spark.queries.clustered_eval  # noqa: F401
    import github_miner_spark.queries.rag_queries  # noqa: F401


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
    # Round-13 window, rotated as the round's LAST code-touching
    # commit (re-pinned after the bench witness-lane isolation). Composition, per tools/check_window_freshness.py and
    # VERDICT r12 items 3 (debt first) + the r8 rotation policy:
    # (a) the 14 queries the round-13 optimization touched (every
    #     touched query gets a post-change driver witness),
    # (b) the 14-row priority witness debt VERDICT r12 item 3 ordered
    #     seated FIRST among non-touched rows: the 13-query cypher
    #     family (last witnessed r11; their round-12 write-back/
    #     escaped-quote fixes were pinned only by the local 41-block
    #     corpus sweep until now) + item_cooccurrence_topk,
    # (c) the 10-row r06 witness tail (oldest driver witnesses, all
    #     carried explicitly since the r12 rotation),
    # (d) 12 of the 27-row r07 drain, alphabetically first; the
    #     remaining 15 r07 rows (hosted_on_outer, kll_quantile_merge,
    #     lineitem_describe, manifest_dependency_totals, meta_graph,
    #     modules_per_repo_list, ngram_jaccard_dups,
    #     one_hop_neighborhood, parts_never_ordered,
    #     preferential_attachment, quantity_histogram, revenue_rollup,
    #     scalar_function_showcase, schema_histograms, self_loops —
    #     the drain continues next round) are the explicit
    #     witness debt carried forward, every one locally pinned each
    #     round by tests/test_oracle_parity.py.
    # -- (a) round-13 optimization-touched --------------------------
    "anf_neighborhood_function",
    "ccnet_perplexity_buckets",
    "clustered_ivf_recall_at_k",
    "clustered_ivfpq_recall_at_k",
    "clustered_lsh_recall_at_k",
    "clustered_opq_recall_at_k",
    "clustered_pq_recall_at_k",
    "clustered_pq_rerank_recall_at_k",
    "doc_kneser_ney_scores",
    "embedding_pq_rerank_topk",
    "events_funnel",
    "kn_perplexity_filter_rates",
    "pq_rerank_recall_at_k",
    "suppliers_kept_waiting",
    # -- (b) priority witness debt (VERDICT r12 item 3) -------------
    "cypher_closure_from_anchor",
    "cypher_collect_unwind_roundtrip",
    "cypher_community_readback",
    "cypher_delete_counters",
    "cypher_hosted_on_outer",
    "cypher_meta_graph_call",
    "cypher_pagerank_readback",
    "cypher_scc_readback",
    "cypher_subdeps_per_devdep",
    "cypher_top_used_modules",
    "cypher_unhosted_dependency_count",
    "cypher_with_chain_fanout",
    "cypher_with_topk_pipeline",
    "item_cooccurrence_topk",
    # -- (c) r06 witness tail ----------------------------------------
    "priority_sample_summary",
    "profit_by_nation_year",
    "promo_revenue_share",
    "regional_revenue",
    "returned_item_customers",
    "shipping_priority",
    "span_corruption_plan",
    "top_dependants_modules",
    "top_supplier_revenue",
    "top_value_part_types",
    # -- (d) r07 drain, alphabetically first -------------------------
    "benchmark_decontamination",
    "brand_discount_revenue",
    "closeness_centrality_sample",
    "customer_order_stats_outer",
    "customers_with_open_orders",
    "degree_breakdown",
    "dependants_by_endpoint_label",
    "detach_delete_impact",
    "distinct_order_profiles",
    "embedding_similarity_buckets",
    "embedding_topk_bruteforce",
    "exact_dedup_summary",
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
