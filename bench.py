#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + collect-to-count).
The headline set is curated to cover every operator family: relational
joins/aggs, graph degree/top-k, iterative closure, and the
LLM-pipeline ops, so a regression anywhere shows up here.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Curated headline queries (name must exist in the registry), one or two
# per operator family: relational, graph join/agg/top-k, iterative
# closure, dedup (exact + LSH), similarity search, text analysis,
# event-time analytics — plus (round 3) the iterative graph algorithms
# and the store-served IVF ANN path, so their latency is under
# regression watch like everything else. r2 local baselines: pagerank
# ~1.9s, scc ~1.1s, louvain ~8s, all-shortest-paths ~1.5s.
HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "customer_order_stats_outer",
    "orders_running_rank",
    "top_dependants_modules",
    "degree_breakdown",
    "users_by_repos_owned",
    "closure_counts_from_anchor",
    "exact_dedup_summary",
    "minhash_lsh_dups",
    "embedding_topk_bruteforce",
    "embedding_ivf_topk",
    "doc_token_stats",
    "events_sessionization",
    "pagerank_top20",
    "scc_summary",
    "louvain_communities",
    "all_shortest_paths_pairs",
    # round 4: k-core + the curation additions, under the same
    # regression watch as the rest
    "k_core_decomposition",
    "leakage_free_split_assignment",
    "events_funnel",
    "dependency_graph_paths",
    # round 4 close-out: span dedup (O(corpus tokens) explode+agg),
    # SemDeDup over IVF lists, the Lloyd-refined IVF search, and the
    # Cypher delete script (filter-compiled teardown)
    "duplicated_span_stats",
    "semantic_dedup_candidates",
    "embedding_ivf_lloyd_topk",
    "cypher_delete_counters",
]


def main() -> None:
    from github_miner_spark import registry
    from github_miner_spark.session import get_spark

    spark = get_spark(
        app_name="github-miner-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")),
    )
    specs = registry.all_specs()
    names = [n for n in HEADLINE if n in specs]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        requested = [n.strip() for n in extra.split(",") if n.strip()]
        unknown = [n for n in requested if n not in specs]
        if unknown:
            raise SystemExit(
                f"unknown bench queries {unknown}; known: {sorted(specs)}"
            )
        names = requested

    # Warmup: materialize the graph store (the derivation is ETL, paid
    # once — queries read the columnar store; see graph/store.py), then
    # one untimed pass of every headline query so the timed pass
    # measures steady-state execution, not JVM/codegen warmup.
    from github_miner_spark.graph.store import materialize_graph

    materialize_graph(spark, SF_DIR)
    for name in names:
        specs[name].spark(spark, SF_DIR).count()

    # median of 3 timed passes per query: single-pass numbers on this
    # box swing up to 3x on identical plans (ambient load / GC — the
    # round-3 "regression" was exactly this), so the recorded number is
    # the median, with per-pass samples kept for transparency
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            df = specs[name].spark(spark, SF_DIR)
            df.count()
            samples[name].append(round(time.perf_counter() - t0, 3))
    timings = {
        name: sorted(ts)[len(ts) // 2] for name, ts in samples.items()
    }

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "timing": f"median of {passes} timed passes per query",
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
