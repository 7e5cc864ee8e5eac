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
    # Round-10 window — the deliberately LOW-CHURN witness-hygiene
    # round VERDICT r9 item 1 prescribed: the r9 equilibrium (48
    # diff-touched rows/round) left no aging capacity, so round 10
    # capped code churn at 15 touched queries and spends the other 35
    # slots draining the witness backlog. Rotation discipline
    # unchanged: this rotation is the round's LAST code-touching
    # commit; tools/check_window_freshness.py verifies the ordering
    # AND that every diff-touched query (AST coverage map) holds a
    # slot below. 15 touched + 4 carried store-key debt + all 23 r04
    # rows + the 8 alphabetically-first free r05 rows = 50 exactly;
    # after this round the oldest driver witness is r05 (11 rows),
    # meeting the verdict's "oldest >= r05" done-criterion.
    # Re-pinned with the clustered-LSH literal-signs fix (the md5
    # sign-expression form cost ~3.5s of Catalyst folding per plan;
    # clustered_lsh_recall_at_k already holds its slot below), and
    # again with the round-10 review fixes: the integer-literal regex
    # gate for malformed co-occurrence item props (ANSI cast throws,
    # DuckDB TRY_CAST rounds — both now drop identically), the
    # text-keyed first-occurrence window in the removal plan (a hash
    # collision must never plan a cut of unique text), and the
    # ADC_SCALE single-definition import — every touched query
    # already holds a slot above. Final re-pin: the regex gate
    # measured 1.66x on the co-occurrence scan (A/B), so the engine
    # side moved to try_cast (one JSON parse, no per-row regex) with
    # the oracle replicating Spark's exact try_cast semantics.
    # -- (a) new this round: the exact-substring removal plan and the
    #        clustered ANN evaluation corpus + its recall ladder
    #        (VERDICT r9 items 2 and 4) -----------------------------
    "duplicated_span_removal_plan",
    "clustered_corpus_profile",
    "clustered_lsh_recall_at_k",
    "clustered_pq_recall_at_k",
    "clustered_opq_recall_at_k",
    "clustered_ivf_recall_at_k",
    "clustered_ivfpq_recall_at_k",
    "clustered_pq_rerank_recall_at_k",
    # -- (b) touched by the ADVICE r9 fixes: the ADC integer
    #        quantization re-touches the whole PQ/IVFADC family
    #        (pq_store/ivfpq_store score paths + their oracles), and
    #        the TRY_CAST oracle hardening touches the co-occurrence
    #        query ------------------------------------------------
    "embedding_pq_topk",
    "pq_recall_at_k",
    "embedding_pq_rerank_topk",
    "pq_rerank_recall_at_k",
    "embedding_ivfpq_topk",
    "ivfpq_recall_at_k",
    "item_cooccurrence_topk",
    # -- (c) VERDICT r9 item "What's missing #2": the store-key ANN/
    #        dedup consumers carried two rounds — they lead the
    #        backlog drain --------------------------------------------
    "embedding_ivf_topk",
    "ivf_recall_at_k",
    "embedding_ivf_lloyd_topk",
    "semantic_dedup_candidates",
    # -- (d) the full r04 witness tail (23 rows — every query whose
    #        latest driver witness is CORRECTNESS_r04; untouched since,
    #        locally green in every all-registry sweep) ----------------
    "clustering_coefficient_summary",
    "corpus_mixture_report",
    "degree_assortativity",
    "doc_repetition_signals",
    "doc_unigram_surprisal",
    "events_asof_last_purchase",
    "events_daily_active_users",
    "events_error_anomaly_scores",
    "events_funnel",
    "events_json_extract",
    "events_purchase_attribution",
    "events_session_windows",
    "events_sessionization",
    "events_sliding_windows",
    "events_top_purchasers",
    "events_tumbling_hourly",
    "events_weekly_retention",
    "lineitem_price_quantiles",
    "minhash_decontamination",
    "multimodal_frame_stats",
    "priority_order_counts",
    "sequence_packing_plan",
    "two_hop_dependencies",
    # -- (e) the oldest r05 rows (8 of the 19; the debt rows in (c)
    #        cover 2 more; the remaining 11 r05 rows lead round 11's
    #        aging section) -------------------------------------------
    "corpus_zipf_fit",
    "customer_order_distribution",
    "doc_bigram_surprisal",
    "doc_chunk_plan",
    "doc_classifier_scores",
    "dormant_rich_customers",
    "duplicated_span_stats",
    "embedding_decontamination",
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
