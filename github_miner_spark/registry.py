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
    # Round-12 FINAL window, re-rotated after the optimization pass.
    # The optimization waves (corpus-pass collapses, Q16/Q21 distinct
    # elisions, DSIR/PMI union form, KMV scale gate, KL totals fold)
    # touch 39 registered queries per tools/check_window_freshness.py's
    # AST coverage map — every one holds a slot below (sections a-d),
    # witnessing each post-change. The 11 remaining slots go to the 3
    # round-12 registrations that have NEVER had a driver witness
    # (section e) and the 8 alphabetically-first of the remaining r06-
    # witness-tail rows (section f — VERDICT r11 item 1). Explicit
    # witness debt carried to round 13, in priority order:
    # top_supplier_revenue + top_value_part_types (the last two r06
    # rows), the 13-query cypher family (r11 witnesses; the round-12
    # escaped-quote/overwrite fixes are pinned by the 41-block corpus
    # sweep in tests/test_cypher.py), and the 14-row r07 alphabetical
    # drain. Rotation discipline unchanged: this rotation is the
    # round's LAST code-touching commit; tools/check_window_freshness
    # verifies ordering AND touched-query coverage.
    # -- (a) optimization-touched: text/KN/perplexity family ----------
    "bigram_pmi_collocations",
    "boilerplate_ngram_stats",
    "ccnet_perplexity_buckets",
    "cms_heavy_hitter_estimates",
    "corpus_zipf_fit",
    "distinct_ngram_diversity",
    "doc_bigram_surprisal",
    "doc_kneser_ney_scores",
    "doc_token_stats",
    "doc_unigram_surprisal",
    "duplicated_span_stats",
    "gopher_repetition_stats",
    "hll_shingle_estimates",
    "hll_vocab_estimates",
    "kmv_set_operation_estimates",
    "kn_perplexity_filter_rates",
    "language_id_confusion",
    "source_unigram_kl",
    "vocab_coverage_stats",
    # -- (b) optimization-touched: tokenizer-store consumers ----------
    "bpe_merge_candidates",
    "bpe_segmentation_stats",
    "bpe_vocab_induction",
    "unigram_lm_segmentation_stats",
    "unigram_lm_vocab_induction",
    "wordpiece_segmentation_stats",
    "wordpiece_vocab_induction",
    # -- (c) optimization-touched: retrieval/dedup/curation/walks -----
    "bm25_retrieval_topk",
    "corpus_filter_funnel",
    "doc_bpe_token_counts",
    "doc_fingerprints",
    "doc_quality_scores",
    "doc_shingle_profile",
    "doc_tfidf_top_terms",
    "dsir_importance_weights",
    "hybrid_retrieval_rrf_topk",
    "skipgram_negative_samples",
    "walk_skipgram_pairs",
    # -- (d) optimization-touched: relational -------------------------
    "parts_supplier_relationship",
    "suppliers_kept_waiting",
    # -- (d2) second-optimization-session touches: the Q2 pushdown,
    #        the bounds-pin, and the graph-topology scan collapses
    #        (every touched query must hold a slot; these five were
    #        new touches this session) --------------------------------
    "min_cost_supplier",
    "binned_quantile_estimates",
    "triangle_counts_top",
    "clustering_coefficient_summary",
    "degree_assortativity",
    "link_prediction_scores",
    # -- (d3) third-optimization-session touches: the two remaining
    #        slot-affordable repeated-derivation collapses (every
    #        touched query must hold a slot) --------------------------
    "mixture_temperature_resample",
    "node_similarity_jaccard",
    # -- (e) round-12 registrations with no driver witness yet; the
    #        fourth optimization session touched the first of them
    #        (the fused-counting rewrite of the hybrid grader), so its
    #        slot now doubles as that touch's witness slot ------------
    "hybrid_fusion_relevance_at_k",
    "incremental_ivf_topk",
    "bitext_mining_margin_topk",
    # -- (f) r06-witness tail: emptied this session — seating the d3
    #        pair displaced its last two rows (promo_revenue_share,
    #        span_corruption_plan), which join the explicit witness
    #        debt carried to round 13, alongside the five evicted for
    #        section d2 (priority_sample_summary, regional_revenue,
    #        returned_item_customers, shipping_priority,
    #        top_dependants_modules — all driver-bench-timed every
    #        round, top_dependants additionally the entry() smoke
    #        query), profit_by_nation_year (evicted for the late
    #        link_prediction touch), top_supplier_revenue +
    #        top_value_part_types, the r11-witnessed cypher family
    #        (its round-12 fixes are pinned by the 41-block corpus
    #        sweep in tests/test_cypher.py), and the 14-row r07
    #        alphabetical drain. Every debt row stays locally pinned
    #        each round by tests/test_oracle_parity.py. --------------
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
