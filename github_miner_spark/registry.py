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
# Round-6 rotation (VERDICT r5 item 2): leads with (a) the 3 queries
# registered after round 5's window filled plus the one never-green
# query (late_shipment_priority_counts — red in r05 on an oracle
# HUGEINT-vs-BIGINT typing bug, fixed this round); then (b) the
# queries NEW this round — every name in the (b) block below, from
# kn_perplexity_filter_rates through kmv_set_operation_estimates
# (the block's last entry); then (c)
# re-greens for every
# implementation or oracle the round touched: the KN model now joins
# on hashed keys (doc_kneser_ney_scores — also in (a)),
# boilerplate_ngram_stats' corpus count folded into the plan, the
# SF-scaling broadcast hints dropped from ten TPC-H shapes, and the
# SCC family rewired through the per-WCC task-local Tarjan path
# (scc_summary / scc_size_histogram / cypher_scc_readback). The tail
# (d) refreshes driver witnesses for queries whose newest green row
# dates to r02/r03 — correctness rows age as implementations around
# them move, so the rotation re-earns them a round at a time. The full
# registry stays pinned by the local every-query oracle sweep
# (tests/test_oracle_parity.py) regardless of window membership.
CORRECTNESS_WINDOW: tuple[str, ...] = (
    # -- (a) never driver-witnessed / never driver-green ---------------
    "customer_spend_deciles",
    "doc_kneser_ney_scores",
    "events_trending_topk",
    "late_shipment_priority_counts",
    # -- (b) new this round --------------------------------------------
    "kn_perplexity_filter_rates",
    "ivf_recall_at_k",
    "order_priority_checking",
    "incremental_minhash_dedup",
    "source_overlap_matrix",
    "closeness_centrality_sample",
    "betweenness_centrality_sample",
    "parts_supplier_relationship",
    "potential_part_promotion",
    "embedding_pq_topk",
    "pq_recall_at_k",
    "min_cost_supplier",
    "important_stock_by_nation",
    "bigram_pmi_collocations",
    "events_gap_filled_hourly",
    "weighted_shortest_distances",
    "span_corruption_plan",
    "vocab_coverage_stats",
    "hll_vocab_estimates",
    "source_unigram_kl",
    "events_ks_drift",
    "deterministic_random_walks",
    "cms_heavy_hitter_estimates",
    "binned_quantile_estimates",
    "bloom_decontamination_prefilter",
    "node2vec_biased_walks",
    "priority_sample_summary",
    "hll_shingle_estimates",
    "kmv_set_operation_estimates",
    # -- (c) re-greens for round-6-touched implementations -------------
    "boilerplate_ngram_stats",
    "scc_summary",
    "scc_size_histogram",
    "cypher_scc_readback",
    "shipping_priority",
    "regional_revenue",
    "nation_volume_shipping",
    "returned_item_customers",
    "top_supplier_revenue",
    "market_share_by_year",
    "profit_by_nation_year",
    "suppliers_kept_waiting",
    "promo_revenue_share",
    "top_value_part_types",
    # -- (d) witness refresh: oldest green rows (r02/r03) + one rep ----
    #    per family not already covered above
    # (scalar_function_showcase / label_histogram / degree_breakdown /
    # events_sessionization / minhash_lsh_dups / embedding_topk_bruteforce /
    # exact_dedup_summary / one_hop_neighborhood / bfs_depth_profile /
    # pricing_summary / cypher_top_used_modules rotated out to make room
    # for the eleven closing registrations — their implementations are
    # untouched this round and their families keep other rows in this
    # window (relational via the ten TPC-H re-greens, cypher via
    # cypher_scc_readback)
    "top_dependants_modules",
    "closure_counts_from_anchor",
    "idempotent_merge",
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
