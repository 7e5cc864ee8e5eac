"""Iterative graph algorithms as DataFrame jobs (SURVEY.md §2.7).

The reference invokes these as Neo4j plugin procedures
(documentation/queries.md: PageRank :177-190, SCC :120-141, Louvain
:82-98, degree :55-64, link prediction :100-118). Here each is a
driver-orchestrated loop over (vertices, edges) DataFrames — the
GraphFrames shapes, implemented directly so no external package is
needed and every step stays in Catalyst-planned joins/aggregations.

Scale notes:
- All loops localCheckpoint per iteration to truncate lineage.
- PageRank: contributions are one shuffle per iteration
  (join on src + groupBy dst); out-degrees computed once and reused;
  hub skew handled by AQE skew join.
- SCC: trim -> per-WCC split with task-local Tarjan finish
  (applyInPandas, executor-side) -> Orzan forward-coloring +
  backward-pruning only for components too big for one task —
  set-at-a-time, no per-node recursion, no driver collect.
- Connected components / label propagation are min-label propagation
  loops, O(diameter) rounds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Effective driver-collect gate for the hybrid fast paths: one shared
# definition (graph/paths.py) so the bench's forced-distributed lane
# can never desynchronize between the paths and algorithms families.
from github_miner_spark.graph.paths import _gate  # noqa: F401

# Cap on the per-root task kernels' replication volume (|roots| x E
# rows). The kernels replicate the edge list once per root through a
# single shuffle — the broadcast join's copies-per-task analog — and
# that is only a win while the total replicated row count stays in
# ordinary-shuffle territory. 512M rows of (src, dst, root) bigints is
# ~12 GB of shuffle cluster-wide: routine for any real cluster, while
# still rejecting the all-vertices-as-roots blow-up (|V| x E) that the
# exact-betweenness contract would otherwise send down this path.
ROOT_REPLICATION_BUDGET = 512_000_000


def _vertex_ids(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _pagerank_driver(
    weighted: DataFrame,
    verts: DataFrame,
    iterations: int,
    damping: float,
    sources: list[int] | None,
) -> DataFrame:
    """In-driver twin of the power-iteration loop: the collected
    (src, dst, w) list becomes index arrays and each iteration is one
    deterministic numpy scatter-add — same recurrence, same dangling-
    mass decay, same personalization."""
    rows = [(r["src"], r["dst"], r["w"]) for r in weighted.collect()]
    ids = sorted(r["id"] for r in verts.collect())
    out = _pagerank_rows_numpy(rows, ids, iterations, damping, sources)
    return weighted.sparkSession.createDataFrame(out, "id bigint, rank double")


def _pagerank_rows_numpy(
    rows: list[tuple[int, int, float]],
    ids: list[int],
    iterations: int,
    damping: float,
    sources: list[int] | None,
) -> list[tuple[int, float]]:
    """The shared numpy power-iteration core: identical recurrence for
    the in-driver twin and the executor-task kernel."""
    import numpy as np

    idx = {v: i for i, v in enumerate(ids)}
    src = np.fromiter((idx[a] for a, _b, _w in rows), dtype=np.int64, count=len(rows))
    dst = np.fromiter((idx[b] for _a, b, _w in rows), dtype=np.int64, count=len(rows))
    w = np.fromiter((wv for _a, _b, wv in rows), dtype=np.float64, count=len(rows))
    n = len(ids)
    if sources is None:
        rank = np.ones(n)
        base = np.full(n, 1.0 - damping)
    else:
        srcs = {int(s) for s in sources}
        # p0 is over the WHOLE source list incl. duplicates and absent
        # ids — the distributed path divides by len(list) and its
        # isin() simply never matches an absent id, no renorm
        p0 = 1.0 / len([int(s) for s in sources])
        rank = np.zeros(n)
        base = np.zeros(n)
        for s in srcs:
            if s in idx:
                rank[idx[s]] = p0
                base[idx[s]] = (1.0 - damping) * p0
    for _ in range(iterations):
        msg = np.zeros(n)
        np.add.at(msg, dst, rank[src] * w)
        rank = base + damping * msg
    return [(int(v), float(rank[i])) for v, i in idx.items()]


def _pagerank_group_factory(
    iterations: int, damping: float, sources: list[int] | None
):
    """Build the applyInPandas kernel for task-local PageRank: the
    weighted edge list arrives as one group and the shared numpy core
    runs inside the executor task. Valid only when the vertex set is
    edge-derived (vertices=None): every endpoint of e appears in the
    weighted rows (a node with no out-edges still appears as dst), so
    the kernel reconstructs exactly the ids the driver twin would."""

    def _pagerank_group(pdf):
        import pandas as pd

        rows = [
            (int(a), int(b), float(w))
            for a, b, w in zip(pdf["src"], pdf["dst"], pdf["w"])
        ]
        ids = sorted({a for a, _b, _w in rows} | {b for _a, b, _w in rows})
        out = _pagerank_rows_numpy(rows, ids, iterations, damping, sources)
        return pd.DataFrame(
            {"id": [v for v, _r in out], "rank": [r for _v, r in out]}
        )

    return _pagerank_group


def pagerank(
    edges: DataFrame,
    iterations: int = 20,
    damping: float = 0.85,
    vertices: DataFrame | None = None,
    broadcast_ranks: bool = False,
    loop_shuffle_width: int | None = None,
    barrier_every: int = 5,
    sources: list[int] | None = None,
    collect_threshold: int = 2_000_000,
    task_threshold: int = 5_000_000,
) -> DataFrame:
    """Power-iteration PageRank, OUTGOING direction, non-normalized
    Brin-Page form: rank_v = (1-d) + d * sum(rank_u / outdeg_u) — the
    formulation of the Neo4j 3.5 graph-algorithms plugin the reference
    runs with {iterations: 100, dampingFactor: 0.85}
    (documentation/queries.md:180-182). Dangling-node mass decays, as
    in the plugin. Returns (id, rank).

    ``sources``: personalized PageRank (the plugin's sourceNodes
    option): the restart mass (1-d) concentrates uniformly on the
    source set instead of every vertex — rank_v = (1-d)*p_v +
    d * sum(rank_u / outdeg_u) with p_v = 1/|S| on S, 0 elsewhere, and
    rank0 = p. Same loop, same shuffle shape; only the two vertex-local
    literals change (both precomputed driver-side so the DuckDB oracle
    starts from identical IEEE-754 constants).

    ``broadcast_ranks``: broadcast the rank vector into the per-
    iteration contribution join instead of shuffling the weighted edge
    table — ~30% faster when |V| fits in executor memory (a rank row is
    16 bytes; up to ~100M vertices is fine); leave off beyond that.

    ``loop_shuffle_width``: explicit override for the per-iteration
    groupBy shuffle width (see paths._loop_shuffle_partitions) — the
    aggregated state is one row per vertex, so the session-wide width
    sized for full-table scans only buys task-launch overhead in the
    loop. None (default) sizes it from the weighted edge count
    (paths._adaptive_loop_width): narrow at bench SF, the session
    width again at cluster scale. The INPUT materializations (degree
    join, vertex distinct) always run at session width — only the loop
    narrows."""
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    e = edges.select("src", "dst")
    verts = (vertices.select("id") if vertices is not None else _vertex_ids(e)).distinct()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-join the per-edge weight once: src -> dst with 1/outdeg(src)
    weighted = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).localCheckpoint(eager=True)
    n_w = weighted.count()

    # Hybrid fast path (README: anchored-probe hybrid execution):
    # 20 power iterations cost 4+ driver barriers distributed; under
    # the collect threshold the weighted edge list collects and the
    # same recurrence runs as a numpy matvec. Ranks are genuine
    # float sums, so the two paths agree to accumulation order —
    # i.e. to the repo-wide 6dp rounding convention every consumer
    # (and the DuckDB oracle, which sums in its own order) already
    # applies; parity at that convention is pinned in tests.
    # Task-local path FIRST (r9 flip): when the weighted edge list fits
    # one executor task AND the vertex set is edge-derived, the shared
    # numpy power-iteration core runs inside ONE applyInPandas task —
    # executor-side, no driver collect, the 4+ barrier-window jobs
    # collapse to 2 stages. The driver twin below collects ~|E| rows
    # and re-ships |V| ranks through the pickle createDataFrame path,
    # which MEASURES 2x the kernel at bench SF (2.0-3.1s vs 1.0-1.4s
    # same-session) — so the kernel outranks it whenever both apply;
    # the twin remains for explicit-vertices callers and as the pinned
    # parity anchor. Past the thresholds the distributed loop below is
    # the at-scale path.
    if vertices is None and task_threshold > 0 and n_w <= task_threshold:
        return (
            weighted.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(
                _pagerank_group_factory(iterations, damping, sources),
                schema="id bigint, rank double",
            )
        )

    thr = _gate(collect_threshold)
    if thr > 0 and n_w <= thr:
        return _pagerank_driver(
            weighted, verts, iterations, damping, sources
        )

    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(e.sparkSession, n_w)
    # Eager HERE, after the driver/task dispatches (which never read
    # verts distributed — the twin collects it, the kernel derives the
    # ids itself) and BEFORE the narrowed loop scope: left lazy, the
    # corpus-sized vertex distinct would first execute inside
    # _loop_shuffle_partitions at the adaptive loop width (ADVICE r6).
    verts = verts.localCheckpoint(eager=True)
    # fixed-cadence loop with uniform vertex-sized state: AQE's
    # per-stage re-plan is pure overhead here (see _loop_shuffle_partitions)
    with _loop_shuffle_partitions(
        e.sparkSession,
        enabled=True,
        width=loop_shuffle_width,
        aqe_off=True,
    ):
        if sources is None:
            init_col = F.lit(1.0)
            base_col = F.lit(1.0 - damping)
        else:
            srcs = [int(s) for s in sources]
            p0 = 1.0 / len(srcs)
            c0 = (1.0 - damping) * p0
            init_col = F.when(F.col("id").isin(srcs), F.lit(p0)).otherwise(F.lit(0.0))
            base_col = F.when(F.col("id").isin(srcs), F.lit(c0)).otherwise(F.lit(0.0))
        ranks = verts.withColumn("rank", init_col)
        for it in range(1, iterations + 1):
            r = F.broadcast(ranks) if broadcast_ranks else ranks
            contribs = (
                weighted.join(r, weighted.src == ranks.id)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("msg"))
            )
            ranks = verts.join(contribs, verts.id == contribs.dst, "left_outer").select(
                "id",
                (base_col + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            # one barrier per 5 iterations: the in-window iterations
            # chain lazily and execute as ONE job at the checkpoint (5
            # shuffles in one DAG), instead of paying a driver barrier
            # per iteration — power iteration has no per-step
            # convergence probe, so nothing needs the intermediate
            # ranks materialized. Lineage stays bounded by the window.
            # A/B at sf0.1/local[32]: windows of 4/5/8/10 ran
            # 4.3-6.2 / 4.6-5.0 / 6.3-6.5 / 6.3-6.5 s — 5 is the knee
            # (4 barriers for 20 iterations); wider windows lose to
            # codegen over the deeper unmaterialized plan.
            if it % barrier_every == 0 or it == iterations:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _union_find_components(nodes: list[int], pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Path-compressed union-find; labels canonicalized to the min
    member id — the same contract as the star-contraction loop."""
    parent = {v: v for v in nodes}

    def root(v: int) -> int:
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in pairs:
        ra, rb = root(a), root(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for v in nodes:
        comps.setdefault(root(v), []).append(v)
    out = {}
    for members in comps.values():
        canon = min(members)
        for v in members:
            out[v] = canon
    return out


def _union_find_group(pdf):
    """applyInPandas kernel: the whole deduped pair list arrives as
    one group and path-compressed union-find labels it task-locally —
    executor-side, no driver collect, the SCC whole-core pattern
    applied to WCC. Isolated vertices are the caller's left-join
    concern (same contract as the distributed tail)."""
    import pandas as pd

    pairs = list(zip(pdf["a"].astype(int), pdf["b"].astype(int)))
    nodes = sorted({v for p in pairs for v in p})
    comp = _union_find_components(nodes, pairs)
    return pd.DataFrame(
        {"id": list(comp.keys()), "component": list(comp.values())}
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    loop_shuffle_width: int | None = None,
    collect_threshold: int = 2_000_000,
    task_threshold: int = 5_000_000,
) -> DataFrame:
    """Weakly-connected components via alternating large-star/small-star
    pointer doubling (the MapReduce CC algorithm of Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14). Returns
    (id, component) with component = the smallest vertex id in the
    component.

    Round-1 ran min-label propagation here: O(diameter) rounds, which
    silently returned wrong labels on path-shaped components longer than
    the iteration cap. Star contraction converges in O(log^2 n) rounds
    regardless of diameter — the 100 TB-safe shape — and this version
    RAISES instead of returning non-converged labels if ``max_iter`` is
    ever exhausted.
    """
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    # materialize the input selection ONCE: verts and pairs both derive
    # from it, and callers routinely pass expensive derived plans (e.g.
    # dedup_clusters feeds the whole Jaccard pair pipeline in) — without
    # this checkpoint the vertex side re-executes that plan
    base = edges.select("src", "dst").localCheckpoint(eager=True)
    verts = _vertex_ids(base)
    pairs = (
        base.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()
    # Hybrid fast path (README: anchored-probe hybrid execution):
    # under the collect threshold the deduped pair list collects and
    # path-compressed union-find labels the graph exactly —
    # integer work, bit-identical to the star-contraction result.
    # The distributed O(log^2 n) loop engages unchanged beyond it.
    thr = _gate(collect_threshold)
    if thr > 0 and n_pairs <= thr:
        nodes = [r["id"] for r in verts.collect()]
        comp = _union_find_components(
            nodes, [(r["a"], r["b"]) for r in pairs.collect()]
        )
        return edges.sparkSession.createDataFrame(
            list(comp.items()), "id bigint, component bigint"
        )
    # Whole-graph task shortcut (the SCC whole-core pattern): a pair
    # set that fits one executor task is labeled by path-compressed
    # union-find inside ONE applyInPandas group — one job instead of
    # O(log^2 n) star-contraction barriers. Executor-side compute,
    # deliberately NOT behind the driver-collect _gate; callers that
    # need the distributed rounds timed (the SCC scaling lane) pass
    # task_threshold=0, and a pair set above the threshold takes the
    # star contraction unchanged — the 100 TB path. Isolated and
    # self-loop-only vertices come back via the same left-join tail
    # the distributed loop uses.
    if task_threshold > 0 and n_pairs <= task_threshold:
        roots = (
            pairs.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(_union_find_group, "id bigint, component bigint")
        )
        return verts.join(roots, "id", "left_outer").select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
        )
    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(base.sparkSession, n_pairs)
    with _loop_shuffle_partitions(
        base.sparkSession,
        enabled=True,
        width=loop_shuffle_width,
    ):
        converged = pairs.isEmpty()
        for _ in range(max_iter):
            if converged:
                break
            # large-star: every neighbor v > u links to u's minimum
            # (over neighbors and u itself)
            nb = pairs.unionByName(
                pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            mins = (
                nb.groupBy("a")
                .agg(F.min("b").alias("mb"))
                .select("a", F.least(F.col("mb"), F.col("a")).alias("m"))
            )
            large = (
                nb.join(mins, "a")
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            # small-star: orient each edge big->small; every small
            # neighbor (and the center) links to the center's minimum
            d = large.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            ).filter(F.col("a") != F.col("b"))
            smins = d.groupBy("a").agg(F.min("b").alias("m"))
            small = (
                d.join(smins, "a")
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .unionByName(smins.select(F.col("a"), F.col("m").alias("b")))
                .filter(F.col("a") != F.col("b"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            # fixpoint probe (ONE job, VERDICT r7 item 2 — the old
            # count + exceptAll pair was two jobs, the exceptAll a
            # full set-compare shuffle): alternating LS/SS converges
            # exactly when the edge set is a STAR FOREST — every
            # member node points to exactly one root and no root is
            # itself a member. Star forests are verifiably stable
            # under LS+SS (each star maps to itself), and any stable
            # edge set is a star forest (a chain a>b>c rewrites under
            # LS), so "is a star forest" == "is the fixpoint" — and
            # it can be read off ONE role aggregation: a node in
            # violation either carries >1 distinct root or appears on
            # both sides.
            roles = small.select(
                F.col("a").alias("n"), F.col("b").alias("root")
            ).unionByName(
                small.select(
                    F.col("b").alias("n"),
                    F.lit(None).cast("bigint").alias("root"),
                )
            )
            probe = roles.groupBy("n").agg(
                F.count_distinct("root").alias("n_roots"),
                F.max(F.col("root").isNull().cast("int")).alias("is_root"),
            )
            converged = probe.filter(
                (F.col("n_roots") > 1)
                | ((F.col("is_root") == 1) & (F.col("n_roots") > 0))
            ).isEmpty()
            pairs = small
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                "star-contraction rounds — this should be impossible for "
                f"any graph with < 2^{max_iter // 2} vertices; refusing to "
                "return wrong labels"
            )
    roots = pairs.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return (
        verts.join(roots, "id", "left_outer")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


def _tarjan_component_group(pdf):
    """applyInPandas kernel: one weakly-connected component's edge list
    arrives as a pandas frame (src, dst[, wcc]); iterative Tarjan labels
    it task-locally. Runs INSIDE an executor task — no driver collect,
    memory bounded by the component-size threshold the caller enforces."""
    import pandas as pd

    pairs = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    nodes = sorted({v for p in pairs for v in p})
    comp = _tarjan_components(pairs, nodes)
    return pd.DataFrame(
        {"id": list(comp.keys()), "component": list(comp.values())}
    )


def _tarjan_components(edge_list: list[tuple[int, int]], nodes: list[int]) -> dict[int, int]:
    """Iterative (explicit-stack) Tarjan SCC over an in-memory edge
    list; returns {node: component} with component = min member id.
    Used only on the post-trim cyclic core, never the full graph."""
    adj: dict[int, list[int]] = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            neighbors = adj.get(v, ())
            while pi < len(neighbors):
                w = neighbors[pi]
                pi += 1
                work[-1] = (v, pi)
                if w not in index:
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                canon = min(members)
                for w in members:
                    comp[w] = canon
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def strongly_connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    core_collect_threshold: int = 5_000_000,
    loop_shuffle_width: int | None = None,
    component_task_threshold: int = 5_000_000,
    whole_core_task_threshold: int | None = None,
) -> DataFrame:
    """SCC, hybrid two-level (the set-at-a-time analog of the
    reference's algo.scc 'huge' graph run,
    documentation/queries.md:120-141):

      0. TRIM (distributed): iteratively peel vertices with zero
         in-degree or zero out-degree in the remaining subgraph — such
         vertices can never sit on a cycle, so they are singleton SCCs.
         On DAG-heavy inputs (the common shape: dependency graphs are
         mostly acyclic) this removes almost everything in O(depth)
         rounds of one degree-flags shuffle each, leaving only the
         cyclic core. Trim engages only when the deduped edge set
         exceeds component_task_threshold: its job is shrinking a
         too-big graph, and a graph that already fits one executor
         task goes straight to the WCC split instead of paying
         O(fringe depth) peeling barriers.
      1a. If the core is small (<= core_collect_threshold edges —
         the usual outcome: the reference's real corpus has max SCC
         size 9), finish with iterative Tarjan on the driver. A 100 TB
         near-DAG trims to a core that fits comfortably in driver
         memory; paying 30+ distributed rounds of driver-loop latency
         to color a few thousand nodes is the wrong trade.
      1b'. If the whole core fits ONE executor task
         (<= ``whole_core_task_threshold`` edges, default =
         ``component_task_threshold``), skip the WCC split and label
         the core task-locally as a single applyInPandas group — the
         split's only job is carving a too-big core into task-sized
         pieces, and its star-contraction barriers were the dominant
         distributed-floor cost at bench SF.
      1b. Otherwise, split the core by WEAKLY-connected component
         (star contraction, O(log^2 n) rounds; every SCC is inside one
         WCC), shuffle the edges BY COMPONENT, and label each component
         that fits an executor task (<= component_task_threshold edges)
         task-locally with iterative Tarjan via applyInPandas — all
         components in parallel, no driver collect, memory bounded per
         task. Cycles in real dependency graphs are local, so this
         finishes almost every core in one shuffle instead of an
         O(core diameter) coloring fixpoint.
      1c. Components too big for one task fall through to Orzan-style
         forward min-coloring (with pointer jumping) to fixpoint +
         backward pruning + FW-BW-Trim re-trim per round, fully
         distributed — the path for a genuinely huge entangled core.

    Returns (id, component) with component = min member id.

    ``loop_shuffle_width``: explicit override for the trim/coloring
    loops' shuffle width. None (default) sizes it from the deduped edge
    count at ~250k rows per partition (min 2, capped at the session's
    shuffle width): the loop state is vertex/edge-sized, so at bench SF
    a handful of partitions removes per-round task-scheduling overhead
    the session's full width would pay ~70 times over, while a 100-TB
    core gets the session width back automatically."""
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    # One lineage traversal: dedup (self-loops kept) is the single
    # materialization of the input; everything else derives from the
    # checkpoint, not from re-running the input plan. Done BEFORE the
    # loop-width context so the adaptive width can read its size.
    dedup = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    n_edges = dedup.count()
    spark = edges.sparkSession
    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(spark, n_edges)
    with _loop_shuffle_partitions(
        spark, enabled=True, width=loop_shuffle_width
    ):
        return _scc_impl(
            dedup, n_edges, max_iter, core_collect_threshold,
            component_task_threshold,
            component_task_threshold
            if whole_core_task_threshold is None
            else whole_core_task_threshold,
        )


def _scc_impl(
    dedup: DataFrame,
    n_edges: int,
    max_iter: int,
    core_collect_threshold: int,
    component_task_threshold: int,
    whole_core_task_threshold: int,
) -> DataFrame:

    # Fast path: if the WHOLE deduped edge set already fits under the
    # collect threshold, the distributed trim is pure barrier latency —
    # its only job is to shrink a too-big-to-collect graph down to a
    # collectable cyclic core. One collect supplies the edge list and
    # the vertex universe (incl. self-loop-only vertices) for driver
    # Tarjan (~5s -> <2s at sf0.1; at 100 TB the count exceeds the
    # threshold and the trim path below engages unchanged).
    thr0 = _gate(core_collect_threshold)
    if thr0 > 0 and n_edges <= thr0:
        rows = dedup.collect()
        nodes = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
        comp = _tarjan_components(
            [(r["src"], r["dst"]) for r in rows if r["src"] != r["dst"]], nodes
        )
        return dedup.sparkSession.createDataFrame(
            list(comp.items()), "id bigint, component bigint"
        )

    remaining_edges = (
        dedup.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    )
    all_verts = _vertex_ids(dedup).localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []

    def _peel_once(e: DataFrame) -> DataFrame:
        """One lazy peel: drop vertices lacking an in- or out-edge in
        the current subgraph (they cannot sit on a cycle)."""
        flags = (
            e.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionByName(
                e.select(F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i"))
            )
            .groupBy("id")
            .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
        )
        core = flags.filter(
            (F.col("has_out") == 1) & (F.col("has_in") == 1)
        ).select("id")
        return e.join(core.withColumnRenamed("id", "src"), ["src"], "left_semi").join(
            core.withColumnRenamed("id", "dst"), ["dst"], "left_semi"
        )

    def _trim(edges_in: DataFrame, max_rounds: int) -> tuple[DataFrame, DataFrame]:
        """Peel the acyclic fringe to a fixpoint; returns (core_verts,
        core_edges), both checkpointed. One edge checkpoint + one cheap
        count per round: the degree-flags aggregation stays LAZY inside
        that single job, and convergence is detected on the edge count
        (edges stable <=> core stable, core being a pure function of the
        edge set). One peel per checkpoint is deliberate — folding
        several lazy peels into one job was measured 3-8x SLOWER here
        (the deepened join tree multiplies shuffle stages and AQE
        re-planning without removing any barrier that matters; the real
        per-round cost is shuffle width, handled by the adaptive loop
        width). Peeled vertices are not tracked per round — callers
        diff against their vertex universe once at the end."""
        e = edges_in
        prev_e = e.count()
        for _ in range(max_rounds):
            e = _peel_once(e).localCheckpoint(eager=True)
            n_e = e.count()
            if n_e == prev_e:
                break
            prev_e = n_e
        final_flags = (
            e.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionByName(
                e.select(F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i"))
            )
            .groupBy("id")
            .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
        )
        core = (
            final_flags.filter((F.col("has_out") == 1) & (F.col("has_in") == 1))
            .select("id")
            .localCheckpoint(eager=True)
        )
        return core, e

    # phase 0: trim the acyclic fringe. On DAG-heavy inputs (dependency
    # graphs are mostly acyclic) this removes almost everything in
    # O(depth) rounds of one degree-flags-derived edge checkpoint each,
    # leaving only the cyclic core. Trim's ONLY job is shrinking a
    # too-big graph below the task/collect thresholds, so when the
    # whole deduped edge set ALREADY fits one executor task the
    # O(fringe depth) peeling barriers buy nothing — phase 1's WCC
    # split labels the untrimmed graph task-locally either way. Above
    # the threshold (any real corpus) the fixpoint trim engages
    # unchanged.
    if n_edges > component_task_threshold:
        remaining_verts, remaining_edges = _trim(remaining_edges, max_iter)
    else:
        remaining_verts = _vertex_ids(remaining_edges).localCheckpoint(eager=True)
    singletons = all_verts.join(remaining_verts, "id", "left_anti")
    assigned_parts.append(
        singletons.select("id", F.col("id").alias("component")).localCheckpoint(eager=True)
    )

    core_edge_count = remaining_edges.count()
    thr0 = _gate(core_collect_threshold)
    if thr0 > 0 and core_edge_count <= thr0:
        if core_edge_count > 0:
            comp = _tarjan_components(
                [(r["src"], r["dst"]) for r in remaining_edges.collect()],
                [r["id"] for r in remaining_verts.collect()],
            )
            spark = dedup.sparkSession
            assigned_parts.append(
                spark.createDataFrame(
                    list(comp.items()), "id bigint, component bigint"
                )
            )
        out = assigned_parts[0]
        for part in assigned_parts[1:]:
            out = out.unionByName(part)
        return out

    # Whole-core task shortcut (VERDICT r7 item 2): when the ENTIRE
    # cyclic core fits one executor task, the WCC split below buys
    # nothing — its only job is carving a too-big-for-one-task core
    # into task-sized groups, and its star-contraction rounds were
    # the dominant cost of the distributed floor (~7s of ~11s at
    # bench SF, all barrier latency on a 31k-edge core). Run the
    # per-component Tarjan kernel on the core as ONE group instead:
    # executor-side compute with the same per-task memory budget the
    # per-WCC path already accepts, deliberately NOT behind the
    # driver-collect _gate (the established task-kernel precedent).
    # ``whole_core_task_threshold=0`` disables the shortcut alone
    # (the scaling lane's pin: WCC split + per-WCC kernels stay
    # timed); a core above the threshold takes the WCC split
    # unchanged — the 100 TB path.
    if whole_core_task_threshold > 0 and core_edge_count <= whole_core_task_threshold:
        if core_edge_count > 0:
            scc_core = (
                remaining_edges.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(
                    _tarjan_component_group, "id bigint, component bigint"
                )
            )
            assigned_parts.append(scc_core)
        out = assigned_parts[0]
        for part in assigned_parts[1:]:
            out = out.unionByName(part)
        return out

    # Phase 1: split the cyclic core by WEAKLY-connected component
    # (every SCC is inside one WCC) and finish each component where it
    # is cheapest:
    #   - components whose edge list fits one executor task (the
    #     overwhelmingly common case for a trimmed core — cycles are
    #     local) shuffle BY COMPONENT into applyInPandas and are labeled
    #     task-locally by iterative Tarjan, all components in parallel,
    #     no driver collect anywhere (this is executor-side compute,
    #     deliberately NOT behind the driver-collect _gate);
    #   - components above ``component_task_threshold`` edges fall
    #     through to the distributed FW-BW-Trim coloring loop below,
    #     which then runs on those components only.
    # WCC uses star contraction (O(log^2 n) rounds regardless of
    # diameter), so the whole split costs ~log rounds + one shuffle —
    # replacing a per-core O(diameter) coloring fixpoint whenever the
    # core has no task-sized-exceeding component.
    # WCC inherits the caller's driver-collect bound: a caller that
    # lowered core_collect_threshold to cap driver memory must not get
    # a larger pair collect through connected_components' own gate
    # (and with the gate forced to 0, the star contraction runs fully
    # distributed here too)
    # WCC's own task shortcut inherits the whole-core knob: a caller
    # pinning the distributed split machinery (the scaling lane's
    # whole_core_task_threshold=0) must get the star-contraction
    # rounds it came to measure, not a union-find kernel
    wcc = connected_components(
        remaining_edges,
        max_iter=max_iter,
        collect_threshold=min(core_collect_threshold, 2_000_000),
        task_threshold=whole_core_task_threshold,
    )
    edges_w = remaining_edges.join(
        wcc.select(F.col("id").alias("src"), F.col("component").alias("wcc")),
        "src",
    ).localCheckpoint(eager=True)
    big_ids = (
        edges_w.groupBy("wcc")
        .agg(F.count("*").alias("n_e"))
        .filter(F.col("n_e") > component_task_threshold)
        .select("wcc")
        .localCheckpoint(eager=True)
    )
    small = edges_w.join(big_ids, ["wcc"], "left_anti")
    scc_small = small.groupBy("wcc").applyInPandas(
        _tarjan_component_group, "id bigint, component bigint"
    )
    assigned_parts.append(scc_small)
    if big_ids.isEmpty():
        out = assigned_parts[0]
        for part in assigned_parts[1:]:
            out = out.unionByName(part)
        return out
    remaining_edges = (
        edges_w.join(big_ids, ["wcc"], "left_semi")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    remaining_verts = _vertex_ids(remaining_edges).localCheckpoint(eager=True)

    for _round in range(max_iter):
        if remaining_verts.isEmpty():
            break
        # 1. forward min-color propagation to fixpoint, with POINTER
        # JUMPING: besides pulling min color over in-edges, each round
        # also pulls color(color(v)) — valid because color(v) is always
        # a vertex that REACHES v, and reachability is transitive, so
        # anything that reaches color(v) also reaches v. The shortcut
        # spreads a root's color along already-discovered reach chains
        # geometrically, making the fixpoint O(log diameter) rounds
        # instead of O(diameter) (the classic label-doubling trick from
        # parallel connectivity, applied to the min-ancestor
        # semilattice; final colors are unchanged — the fixpoint of the
        # combined operator is the same min-reachable-ancestor map).
        # The changed flag stays FUSED into the color update, so the
        # stability probe is a filter scan over the just-checkpointed
        # frame instead of a second shuffle join (colors only ever
        # decrease, so changed <=> new color < old color).
        colors = remaining_verts.select("id", F.col("id").alias("color"))
        for _ in range(max_iter):
            prop = (
                remaining_edges.join(colors, remaining_edges.src == colors.id)
                .groupBy(F.col("dst").alias("nid"))
                .agg(F.min("color").alias("cmin"))
            )
            jump = colors.select(
                F.col("id").alias("jid"), F.col("color").alias("jcolor")
            )
            newc = F.least(
                F.col("color"),
                F.coalesce(F.col("cmin"), F.col("color")),
                F.coalesce(F.col("jcolor"), F.col("color")),
            )
            new_colors = (
                colors.join(prop, colors.id == prop.nid, "left_outer")
                .join(jump, colors.color == F.col("jid"), "left_outer")
                .select(
                    "id",
                    newc.alias("color"),
                    (newc < F.col("color")).alias("changed"),
                )
                .localCheckpoint(eager=True)
            )
            stable = new_colors.filter(F.col("changed")).isEmpty()
            colors = new_colors.select("id", "color")
            if stable:
                break
        else:
            raise RuntimeError(
                f"SCC forward coloring did not reach a fixpoint within {max_iter} "
                "rounds (cyclic core diameter exceeds the cap) — refusing to "
                "return wrong components; raise max_iter"
            )
        # 2. backward BFS from each color root within its color class
        scc = colors.filter(F.col("id") == F.col("color")).select("id", "color")
        frontier = scc
        colored_edges = (
            remaining_edges.join(colors.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("color", "src_color")
        )
        while True:
            preds = (
                colored_edges.join(frontier, colored_edges.dst == frontier.id)
                .filter(F.col("src_color") == F.col("color"))
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(scc, ["id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if preds.isEmpty():
                break
            scc = scc.unionByName(preds).localCheckpoint(eager=True)
            frontier = preds
        assigned_parts.append(scc.select("id", F.col("color").alias("component")))
        # 3. drop assigned vertices, then RE-TRIM the fringe their
        # removal exposes (the Trim step of the FW-BW-Trim recursion,
        # Hong et al.): vertices that were only "cyclic" through a
        # removed SCC peel off as singleton components here instead of
        # paying another full coloring fixpoint — this is what bounds
        # the outer round count by the SCC-condensation depth rather
        # than the number of color classes. The shrunken core then
        # re-checks the driver-Tarjan gate.
        prev_remaining = remaining_verts.join(scc, ["id"], "left_anti").localCheckpoint(
            eager=True
        )
        scc_ids = scc.select("id")
        remaining_edges = (
            remaining_edges.join(scc_ids.withColumnRenamed("id", "src"), ["src"], "left_anti")
            .join(scc_ids.withColumnRenamed("id", "dst"), ["dst"], "left_anti")
            .localCheckpoint(eager=True)
        )
        remaining_verts, remaining_edges = _trim(remaining_edges, max_iter)
        peeled = prev_remaining.join(remaining_verts, "id", "left_anti")
        assigned_parts.append(
            peeled.select("id", F.col("id").alias("component")).localCheckpoint(eager=True)
        )
        core_edge_count = remaining_edges.count()
        thr_r = _gate(core_collect_threshold)
        if thr_r > 0 and core_edge_count <= thr_r:
            if core_edge_count > 0:
                comp = _tarjan_components(
                    [(r["src"], r["dst"]) for r in remaining_edges.collect()],
                    [r["id"] for r in remaining_verts.collect()],
                )
                spark = dedup.sparkSession
                assigned_parts.append(
                    spark.createDataFrame(
                        list(comp.items()), "id bigint, component bigint"
                    )
                )
                remaining_verts = remaining_verts.limit(0).localCheckpoint(eager=True)
            break

    if not remaining_verts.isEmpty():
        raise RuntimeError(
            f"SCC decomposition still has unassigned vertices after {max_iter} "
            "peel rounds — refusing to return a partial labeling; raise max_iter"
        )
    if not assigned_parts:
        spark = dedup.sparkSession
        return spark.createDataFrame([], "id bigint, component bigint")
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out


def _symmetrize_weighted(edges: DataFrame) -> DataFrame:
    """Distinct directed pairs in both directions, weight 1.0 each,
    self-loops dropped: the undirected-graph representation used by
    louvain/modularity. (src, dst, w)."""
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumn("w", F.lit(1.0))
        .localCheckpoint(eager=True)
    )


# temp-view namespace for concurrent/nested phase1/modularity calls:
# itertools.count.__next__ is atomic under the GIL, so two threads on
# one SparkSession can never draw the same view tag (a bare integer
# += would race and cross-contaminate loop state through the shared
# temp-view names)
import itertools as _itertools

_LV_SEQ = _itertools.count(1)


def _louvain_phase1(
    sym: DataFrame, m2: float, max_sweeps: int, early_exit: bool = True
) -> DataFrame:
    """Louvain local-moving phase over a weighted symmetric edge set
    (src, dst, w); self-rows (src==dst) carry intra-node weight from
    prior aggregation levels. Returns (id, community).

    Semi-synchronous: each sweep moves even-hash nodes then odd-hash
    nodes (two half-sweeps), which prevents the two-coloring
    oscillation that plain synchronous moving exhibits, while staying
    set-at-a-time. Ties break to the smallest community id, so runs
    are deterministic.

    Shape (r9 floor work, two independent cuts):

    - The loop state is ONE checkpointed frame (id, community, k) —
      carrying the degree kills the two per-sweep k-joins of the r8
      shape — and each half-sweep is ~6 exchanges: sum_tot aggregates
      the state by community and joins straight back (same key,
      exchange reused), the neighbour side carries tot INTO the k_in
      aggregation (max of the functionally-dependent value, no
      opt-keyed join afterwards), and the stay-with-current candidate
      merges against the best neighbour option via one least() on the
      shared (‑score, opt) order struct instead of a union + second
      aggregation.
    - Each half-sweep is ONE ``spark.sql`` statement over temp views
      of the checkpointed state: building the same plan through the
      Column API costs ~500 py4j round trips (~1.4 ms each on this
      box — measured at 1.5-1.7 s of pure driver-side chatter per
      half-sweep, more than the execution itself), where the SQL form
      is 3 calls. The physical plan is identical; this changes WHERE
      the plan is written down, not what runs.

    Every float lands from the identical expression tree as the r8
    shape (k/tot/k_in are integer-valued-double sums, order exact), so
    the driver twin, the task kernel, and the unrolled CTE oracle stay
    bit-identical — pinned by the 4-way parity tests.
    """
    spark = sym.sparkSession
    tag = f"lv{next(_LV_SEQ)}"
    sym.createOrReplaceTempView(f"{tag}_sym")
    m2_sql = f"CAST({m2!r} AS DOUBLE)"
    # state = (id, community, k); k includes self-row weight (level-2
    # super nodes carry intra-community mass as self-rows)
    state = spark.sql(
        f"SELECT src AS id, src AS community, sum(w) AS k "
        f"FROM {tag}_sym GROUP BY src"
    ).localCheckpoint(eager=True)
    half_sweep_sql = f"""
    WITH sum_tot AS (
      SELECT community, sum(k) AS tot FROM {tag}_state GROUP BY community
    ),
    joined AS (
      SELECT s.id, s.community, s.k, t.tot
      FROM {tag}_state s JOIN sum_tot t USING (community)
    ),
    -- neighbour-community weights exclude self-rows (edges to the
    -- moving node travel with it); tot rides the aggregation as a
    -- max() of the functionally-dependent value
    k_in AS (
      SELECT e.src, n.opt, sum(e.w) AS k_in, max(n.tot) AS tot
      FROM {tag}_sym e
      JOIN (SELECT id AS dst, community AS opt, tot FROM joined) n
        USING (dst)
      WHERE e.src <> e.dst
      GROUP BY e.src, n.opt
    ),
    cand AS (
      SELECT c.src, s.cur, s.k, c.opt,
             c.k_in - s.k * (c.tot - CASE WHEN c.opt = s.cur
                                          THEN s.k ELSE 0.0 END) / {m2_sql}
               AS score
      FROM k_in c
      JOIN (SELECT id AS src, community AS cur, k FROM {tag}_state) s
        USING (src)
    ),
    best_nb AS (
      SELECT src, min(struct(-score AS ns, opt)) AS b FROM cand GROUP BY src
    ),
    -- staying put scores the identical expression with k_in=0 and
    -- opt=cur; least() on the shared order struct is the old
    -- union+max-then-argmin, one aggregation cheaper. The left join
    -- keeps isolated / self-loop-only nodes, whose b is null —
    -- least() skips nulls.
    stay AS (
      SELECT id AS src, community AS cur, k,
             struct(-(0.0 - k * (tot - k) / {m2_sql}) AS ns,
                    community AS opt) AS stay_ord
      FROM joined
    ),
    merged AS (
      SELECT s.src AS id, s.cur, s.k,
             least(b.b, s.stay_ord).opt AS choice
      FROM stay s LEFT JOIN best_nb b ON b.src = s.src
    )
    -- hash parity, not id parity: real id spaces are often all even
    -- (ours: p*10+2), which would degenerate the half-sweep into
    -- fully-synchronous moving and oscillate on pair swaps. Portable
    -- md5 parity (functions.text.token_hash semantics) rather than
    -- xxhash64, so the DuckDB oracle can reproduce the sweep schedule
    -- bit-for-bit.
    SELECT id,
           CASE WHEN pmod(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8),
                                    16, 10) AS BIGINT), 2) = {{parity}}
                THEN choice ELSE cur END AS community,
           k,
           (pmod(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8),
                           16, 10) AS BIGINT), 2) = {{parity}}
            AND choice <> cur) AS moved
    FROM merged
    """
    try:
        for _ in range(max_sweeps):
            moved_any = False
            for parity in (0, 1):
                state.createOrReplaceTempView(f"{tag}_state")
                new_state = spark.sql(
                    half_sweep_sql.format(parity=parity)
                ).localCheckpoint(eager=True)
                # the convergence probe is one driver job per
                # half-sweep; fixed-schedule callers (whose oracle
                # unrolls exactly max_sweeps sweeps — extra sweeps past
                # convergence are identity) skip it and save 2 jobs x
                # sweeps x levels
                if early_exit:
                    changed = not new_state.filter(F.col("moved")).isEmpty()
                    moved_any = moved_any or changed
                # the extra `moved` column rides along — the next
                # half-sweep's SQL picks columns by name
                state = new_state
            if early_exit and not moved_any:
                break
    finally:
        spark.catalog.dropTempView(f"{tag}_sym")
        spark.catalog.dropTempView(f"{tag}_state")
    return state.select("id", "community")


def _md5_parity(v: int) -> int:
    """Driver twin of pmod(functions.text.token_hash(id), 2): first 8
    hex chars of md5 of the decimal string, as an int, mod 2."""
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 2


def _louvain_phase1_driver(
    sym: list[tuple[int, int, float]], m2: float, max_sweeps: int, early_exit: bool
) -> dict[int, int]:
    """In-driver twin of _louvain_phase1 over a collected symmetric
    weighted edge list. Bit-parity argument (same as the unrolled
    oracle's): every aggregate is a sum of integer-valued doubles —
    exact in IEEE-754 regardless of accumulation order — and the score
    expression k_in - k * adj_tot / m2 is evaluated with the identical
    operation tree, so every comparison (score DESC, community ASC)
    resolves exactly as the distributed half-sweep does."""
    from collections import defaultdict

    k: dict[int, float] = defaultdict(float)
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for s, d, w in sym:
        k[s] += w
        if s != d:
            adj[s].append((d, w))
    comm = {v: v for v in k}
    parity_of = {v: _md5_parity(v) for v in k}
    for _ in range(max_sweeps):
        moved_any = False
        for parity in (0, 1):
            tot: dict[int, float] = defaultdict(float)
            for v, c in comm.items():
                tot[c] += k[v]
            new_comm = {}
            for v, kv in k.items():
                cur = comm[v]
                kin: dict[int, float] = defaultdict(float)
                for d, w in adj.get(v, ()):
                    kin[comm[d]] += w
                if cur not in kin:
                    kin[cur] = 0.0
                best_key = None
                choice = cur
                for opt, ki in kin.items():
                    adj_tot = tot[opt] - (kv if opt == cur else 0.0)
                    score = ki - kv * adj_tot / m2
                    key = (-score, opt)
                    if best_key is None or key < best_key:
                        best_key, choice = key, opt
                if parity_of[v] == parity and choice != cur:
                    new_comm[v] = choice
                    moved_any = True
                else:
                    new_comm[v] = cur
            comm = new_comm
        if early_exit and not moved_any:
            break
    return comm


def _louvain_driver(
    sym: list[tuple[int, int, float]],
    m2: float,
    max_sweeps: int,
    levels: int,
    early_exit: bool,
) -> dict[int, int]:
    """In-driver twin of _louvain_inner's level loop: aggregate
    communities into super-nodes (weights summed, intra-community mass
    as self-rows), re-run local moving with the ORIGINAL m2, map back,
    then canonicalize community ids to the min member id."""
    from collections import defaultdict

    assignment = _louvain_phase1_driver(sym, m2, max_sweeps, early_exit)
    cur_sym = sym
    for _ in range(1, levels):
        agg: dict[tuple[int, int], float] = defaultdict(float)
        for s, d, w in cur_sym:
            agg[(assignment[s], assignment[d])] += w
        super_sym = [(s, d, w) for (s, d), w in agg.items()]
        if not any(s != d for s, d, _ in super_sym):
            break
        super_assignment = _louvain_phase1_driver(super_sym, m2, max_sweeps, early_exit)
        assignment = {v: super_assignment[c] for v, c in assignment.items()}
        cur_sym = super_sym
    members: dict[int, list[int]] = defaultdict(list)
    for v, c in assignment.items():
        members[c].append(v)
    out = {}
    for vs in members.values():
        canon = min(vs)
        for v in vs:
            out[v] = canon
    return out


def louvain(
    edges: DataFrame,
    max_sweeps: int = 5,
    levels: int = 2,
    loop_shuffle_width: int | None = None,
    early_exit: bool = True,
    collect_threshold: int = 2_000_000,
    task_threshold: int = 5_000_000,
    sym: DataFrame | None = None,
    sym_stats: tuple[float, int] | None = None,
) -> DataFrame:
    """Louvain community detection as DataFrame iteration — the real
    modularity-optimizing algorithm, not a label-propagation stand-in
    (reference runs algo.louvain.stream per rel-type,
    documentation/queries.md:82-98).

    Level 1 runs local moving on the input graph; each further level
    aggregates communities into super-nodes (edge weights summed,
    intra-community weight becoming self-rows) and re-runs local moving,
    then maps assignments back. Returns (id, community) with community =
    min member id (canonical, deterministic).

    ``loop_shuffle_width``: explicit override for the sweep loops'
    shuffle width; None (default) sizes it from the symmetric edge
    count (paths._adaptive_loop_width) — the per-sweep aggregations
    are vertex/edge-sized, so the session width only buys task-launch
    overhead at bench SF while a huge graph gets it back."""
    return _louvain_inner(
        edges, max_sweeps, levels, early_exit, collect_threshold,
        loop_shuffle_width, task_threshold, sym, sym_stats,
    )


def _louvain_group_factory(
    m2: float, max_sweeps: int, levels: int, early_exit: bool
):
    """Build the applyInPandas kernel for task-local Louvain: the
    symmetric weighted edge list arrives as one group and the SAME
    ``_louvain_driver`` twin runs inside the executor task. The twin's
    bit-parity argument (integer-valued-double sums are order-exact,
    identical score operation tree) makes task-vs-distributed equality
    exact, not approximate — the same guarantee the hybrid driver gate
    already relies on, now without any driver collect."""

    def _louvain_group(pdf):
        import pandas as pd

        rows = [
            (int(s), int(d), float(w))
            for s, d, w in zip(pdf["src"], pdf["dst"], pdf["w"])
        ]
        comm = _louvain_driver(rows, m2, max_sweeps, levels, early_exit)
        return pd.DataFrame(
            {"id": list(comm.keys()), "community": list(comm.values())}
        )

    return _louvain_group


def _louvain_inner(
    edges: DataFrame,
    max_sweeps: int,
    levels: int,
    early_exit: bool = True,
    collect_threshold: int = 2_000_000,
    loop_shuffle_width: int | None = None,
    task_threshold: int = 5_000_000,
    sym: DataFrame | None = None,
    sym_stats: tuple[float, int] | None = None,
) -> DataFrame:
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    if sym is None:
        sym = _symmetrize_weighted(edges)
    # ONE action for both loop constants (2m and the edge count) — the
    # r8 shape paid a collect plus a count per call; callers that
    # already aggregated the shared sym pass (m2, n_sym) straight in
    if sym_stats is not None:
        m2, n_sym = sym_stats
    else:
        m2, n_sym = sym.agg(F.sum("w"), F.count(F.lit(1))).collect()[0]
    if not m2:
        return edges.sparkSession.createDataFrame([], "id bigint, community bigint")

    # Hybrid fast path (README: anchored-probe hybrid execution): the
    # sweep loop pays 2 driver barriers per sweep per level, so under
    # the collect threshold the symmetric edge list collects (it is
    # already materialized for m2) and the exact same semi-synchronous
    # schedule runs in-driver — bit-identical moves, see
    # _louvain_phase1_driver. Beyond the threshold the distributed
    # sweeps below engage unchanged; parity between the two paths is
    # pinned by tests on the bench slice and randomized graphs.
    thr = _gate(collect_threshold)
    if thr > 0 and n_sym <= thr:
        rows = sym.collect()
        comm = _louvain_driver(
            [(r["src"], r["dst"], r["w"]) for r in rows],
            float(m2),
            max_sweeps,
            levels,
            early_exit,
        )
        return edges.sparkSession.createDataFrame(
            list(comm.items()), "id bigint, community bigint"
        )

    # Task-local path (the SCC/betweenness pattern): when the symmetric
    # edge list fits one executor task, the whole two-level schedule
    # runs inside ONE applyInPandas task via the bit-parity driver twin
    # — executor-side, no driver collect, ~12 sweep barriers -> 2
    # stages. Past the threshold the distributed sweeps below are the
    # at-scale path; equality is exact (see _louvain_group_factory).
    if task_threshold > 0 and n_sym <= task_threshold:
        return (
            sym.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(
                _louvain_group_factory(float(m2), max_sweeps, levels, early_exit),
                schema="id bigint, community bigint",
            )
            # consumers reference the assignment several times
            # (modularity joins it twice, size histograms once);
            # without this pin each reference re-runs the kernel task
            .localCheckpoint(eager=True)
        )

    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(edges.sparkSession, n_sym)
    with _loop_shuffle_partitions(
        edges.sparkSession, enabled=True, width=loop_shuffle_width
    ):
        return _louvain_distributed(
            edges, sym, float(m2), max_sweeps, levels, early_exit
        )


def _louvain_distributed(
    edges: DataFrame,
    sym: DataFrame,
    m2: float,
    max_sweeps: int,
    levels: int,
    early_exit: bool,
) -> DataFrame:
    assignment = _louvain_phase1(sym, float(m2), max_sweeps, early_exit)
    for _ in range(1, levels):
        # aggregate: super-node per community, weights summed (self-rows
        # keep the intra-community mass so super-level degrees are right)
        cmap_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("csrc"))
        cmap_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("cdst"))
        super_sym = (
            sym.join(cmap_src, "src")
            .join(cmap_dst, "dst")
            .groupBy(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        if super_sym.filter(F.col("src") != F.col("dst")).isEmpty():
            break
        super_assignment = _louvain_phase1(super_sym, float(m2), max_sweeps, early_exit)
        assignment = (
            assignment.join(
                super_assignment.select(
                    F.col("id").alias("community"), F.col("community").alias("super_c")
                ),
                "community",
            )
            .select("id", F.col("super_c").alias("community"))
            .localCheckpoint(eager=True)
        )
        sym = super_sym
    # canonicalize community ids to the min member id
    canon = assignment.groupBy("community").agg(F.min("id").alias("canon"))
    return assignment.join(canon, "community").select("id", F.col("canon").alias("community"))


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    collect_threshold: int = 2_000_000,
    sym: DataFrame | None = None,
    sym_stats: tuple[float, int] | None = None,
) -> float:
    """Newman modularity Q of ``assignment`` (id, community) on the
    undirected simple graph induced by ``edges``. Under
    ``collect_threshold`` symmetric edges the sums run in-driver (all
    are sums of integer-valued doubles — exact in IEEE-754 in any
    order — so the two paths return the identical float).

    ``sym`` / ``sym_stats``: optionally the precomputed
    ``_symmetrize_weighted(edges)`` frame and its (m2, n_sym)
    aggregate — queries that run louvain + modularity over the same
    graph pass them to both so the symmetrization is checkpointed and
    aggregated once."""
    if sym is None:
        sym = _symmetrize_weighted(edges)
    if sym_stats is not None:
        m2, n_sym = sym_stats
    else:
        m2, n_sym = sym.agg(F.sum("w"), F.count(F.lit(1))).collect()[0]
    if not m2:
        return 0.0
    thr = _gate(collect_threshold)
    if thr > 0 and n_sym <= thr:
        comm = {r["id"]: r["community"] for r in assignment.collect()}
        internal = 0.0
        k: dict[int, float] = {}
        for r in sym.collect():
            s, d, w = r["src"], r["dst"], r["w"]
            k[s] = k.get(s, 0.0) + w
            if comm.get(s) == comm.get(d):
                internal += w
        tot: dict[int, float] = {}
        for v, kv in k.items():
            c = comm.get(v)
            tot[c] = tot.get(c, 0.0) + kv
        sq = sum(t * t for t in tot.values())
        return float(internal) / m2 - sq / (m2 * m2)
    # distributed path: BOTH sums in one SQL statement / one action
    # (the r8 shape paid two collects and ~40 py4j column calls — on
    # this box driver-side plan chatter is ~7 ms per column op, a real
    # slice of an iterative query's floor). The two 1-row aggregates
    # cross-join into a single row — scalar-by-scalar, not a cartesian.
    tag = f"mq{next(_LV_SEQ)}"
    spark = sym.sparkSession
    sym.createOrReplaceTempView(f"{tag}_sym")
    assignment.createOrReplaceTempView(f"{tag}_comm")
    try:
        internal, sq = spark.sql(f"""
        WITH internal AS (
          SELECT sum(e.w) AS v
          FROM {tag}_sym e
          JOIN {tag}_comm cs ON cs.id = e.src
          JOIN {tag}_comm cd ON cd.id = e.dst
          WHERE cs.community = cd.community
        ),
        ksum AS (SELECT src, sum(w) AS k FROM {tag}_sym GROUP BY src),
        tots AS (
          SELECT c.community, sum(k.k) AS tot
          FROM ksum k JOIN {tag}_comm c ON c.id = k.src
          GROUP BY c.community
        ),
        sq AS (SELECT sum(tot * tot) AS v FROM tots)
        SELECT coalesce(internal.v, 0.0) AS internal,
               coalesce(sq.v, 0.0) AS sq
        FROM internal CROSS JOIN sq
        """).collect()[0]
    finally:
        spark.catalog.dropTempView(f"{tag}_sym")
        spark.catalog.dropTempView(f"{tag}_comm")
    return float(internal) / m2 - sq / (m2 * m2)


def _label_propagation_driver(
    vertices: list[int], sym: list[tuple[int, int]], iterations: int
) -> dict[int, int]:
    """In-driver twin of the synchronous label-propagation sweep: votes
    are integer counts and the tie-break (votes DESC, label ASC) is
    exact, so the two paths agree move-for-move."""
    from collections import defaultdict

    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in sym:
        adj[s].append(d)
    labels = {v: v for v in vertices}
    for _ in range(iterations):
        new_labels = {}
        for v in vertices:
            # votes arrive at v from its neighbors' labels (sym holds
            # both directions, so adj[v] is the full neighborhood)
            votes: dict[int, int] = defaultdict(int)
            for u in adj.get(v, ()):
                votes[labels[u]] += 1
            if votes:
                new_labels[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            else:
                new_labels[v] = labels[v]
        labels = new_labels
    return labels


def label_propagation(
    edges: DataFrame, iterations: int = 10, collect_threshold: int = 2_000_000
) -> DataFrame:
    """Community detection via synchronous label propagation with a
    deterministic tie-break (most frequent neighbor label, ties -> min
    label) — the GraphFrames-style stand-in for the reference's Louvain
    procedure (documentation/queries.md:82-98; SURVEY.md §7 notes the
    deviation). Returns (id, community). Under ``collect_threshold``
    symmetric edges the sweep runs in-driver (the hybrid policy shared
    by SCC/closure/Louvain); the distributed loop engages unchanged
    beyond it."""
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = _vertex_ids(edges)
    thr = _gate(collect_threshold)
    if thr > 0 and sym.count() <= thr:
        vs = [r["id"] for r in verts.collect()]
        labels_map = _label_propagation_driver(
            vs, [(r["src"], r["dst"]) for r in sym.collect()], iterations
        )
        return edges.sparkSession.createDataFrame(
            list(labels_map.items()), "id bigint, community bigint"
        )
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    with _loop_shuffle_partitions(
        edges.sparkSession,
        enabled=True,
        width=_adaptive_loop_width(edges.sparkSession, sym.count()),
    ):
        labels = verts.select("id", F.col("id").alias("community"))
        for _ in range(iterations):
            neighbor_labels = sym.join(labels, sym.src == labels.id).select(
                F.col("dst").alias("nid"), "community"
            )
            counted = neighbor_labels.groupBy("nid", "community").agg(F.count("*").alias("votes"))
            # max votes with min-label tie-break: order by (-votes, community)
            best = (
                counted.withColumn("ord", F.struct((-F.col("votes")).alias("nv"), F.col("community")))
                .groupBy("nid")
                .agg(F.min("ord").alias("b"))
                .select(F.col("nid"), F.col("b.community").alias("new_community"))
            )
            labels = (
                labels.join(best, labels.id == best.nid, "left_outer")
                .select("id", F.coalesce(F.col("new_community"), F.col("community")).alias("community"))
                .localCheckpoint(eager=True)
            )
    return labels


def _matula_beck_coreness(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    """Exact core numbers via the Matula-Beck O(E) bucket peel over an
    in-memory undirected simple edge list (self-loops excluded by the
    caller). Used only under the collect threshold — the driver twin of
    the distributed h-index fixpoint, and the independent reference the
    property tests pin it against."""
    adj: dict[int, set[int]] = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    if not deg:
        return {}
    maxdeg = max(deg.values())
    buckets: list[set[int]] = [set() for _ in range(maxdeg + 1)]
    for v, d in deg.items():
        buckets[d].add(v)
    core: dict[int, int] = {}
    k = 0
    start = 0
    for _ in range(len(deg)):
        # smallest non-empty bucket; a peel can only lower a neighbor's
        # degree by one, so the scan restarts at d-1, never 0 — the
        # classic trick that keeps the whole peel O(E)
        d = next(i for i in range(start, maxdeg + 1) if buckets[i])
        k = max(k, d)
        start = max(0, d - 1)
        v = buckets[d].pop()
        core[v] = k
        for u in adj[v]:
            if u in core:
                continue
            buckets[deg[u]].discard(u)
            deg[u] -= 1
            buckets[deg[u]].add(u)
            adj[u].discard(v)
    return core


def _coreness_group(pdf):
    """applyInPandas kernel: the deduped undirected edge list arrives
    as one group and the exact Matula-Beck bucket peel — the SAME twin
    the parity tests pin — runs inside the executor task. No driver
    collect, no h-index fixpoint barriers; memory bounded by the
    edge-count threshold the caller enforces."""
    import pandas as pd

    core = _matula_beck_coreness(
        list(zip(pdf["u"].astype(int), pdf["v"].astype(int)))
    )
    return pd.DataFrame(
        {"id": list(core.keys()), "core": list(core.values())}
    )


def coreness(
    edges: DataFrame,
    max_iter: int = 100,
    loop_shuffle_width: int | None = None,
    collect_threshold: int = 5_000_000,
    task_threshold: int = 5_000_000,
) -> DataFrame:
    """k-core decomposition: core number per vertex of the UNDIRECTED
    simple graph underlying ``edges`` (self-loops dropped). Returns
    (id, core). The reference's plugin set ships algo.kcore alongside
    the centrality procedures (bin/install_neo4j_plugins.sh:4).

    Distributed path: the neighborhood h-index fixpoint (Lu, Zhang,
    Yeung & Zhou, "The H-index of a network node and its relation to
    degree and coreness", Nat. Commun. 2016): start c0(v) = degree(v),
    iterate c(v) <- H({c(u) : u ~ v}); the sequence is monotone
    non-increasing and its fixpoint is exactly the core number. Each
    round is one equi-join + one per-vertex window + one aggregate, all
    partitioned on the vertex id — no cartesian, state is one row per
    vertex, so the shape survives any scale. Extra rounds past the
    fixpoint are no-ops, which is what lets the DuckDB oracle unroll a
    fixed round count and still hash-match exactly.

    Under ``collect_threshold`` edges the slice collects and the exact
    Matula-Beck bucket peel runs in-driver — the same hybrid policy as
    SCC's driver-Tarjan (README: anchored-probe hybrid execution);
    parity between the two paths is property-tested. RAISES if the
    distributed fixpoint is not reached within ``max_iter`` rounds
    rather than returning wrong numbers (the CC convergence contract).
    """
    from pyspark.sql import Window

    from github_miner_spark.graph.paths import _loop_shuffle_partitions

    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    if n_edges == 0:
        return edges.sparkSession.createDataFrame([], "id bigint, core bigint")
    thr = _gate(collect_threshold)
    if thr > 0 and n_edges <= thr:
        rows = und.collect()
        core = _matula_beck_coreness([(r["u"], r["v"]) for r in rows])
        return edges.sparkSession.createDataFrame(
            list(core.items()), "id bigint, core bigint"
        )
    # Task-local path (the SCC/betweenness/louvain/pagerank pattern):
    # an undirected edge set that fits one executor task runs the exact
    # Matula-Beck peel inside ONE applyInPandas task — executor-side,
    # no driver collect, the O(iterations) h-index barriers collapse to
    # 2 stages. Past the threshold the fixpoint loop below is the
    # at-scale path.
    if task_threshold > 0 and n_edges <= task_threshold:
        return (
            und.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(_coreness_group, schema="id bigint, core bigint")
        )

    from github_miner_spark.graph.paths import _adaptive_loop_width

    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(edges.sparkSession, n_edges)
    with _loop_shuffle_partitions(
        edges.sparkSession,
        enabled=True,
        width=loop_shuffle_width,
        aqe_off=True,
    ):
        adj = und.select(F.col("u").alias("id"), F.col("v").alias("nb")).unionByName(
            und.select(F.col("v").alias("id"), F.col("u").alias("nb"))
        ).localCheckpoint(eager=True)
        cur = adj.groupBy("id").agg(F.count("*").alias("core")).localCheckpoint(eager=True)
        w = Window.partitionBy("id").orderBy(F.desc("cn"))
        for _ in range(max_iter):
            # the previous-value join rides INSIDE the checkpoint job
            # (one job per round, not two) and the stability probe is a
            # filter scan over the checkpointed result — the h-index
            # sequence is monotone non-increasing, so changed <=>
            # core < prev
            nxt = (
                adj.join(
                    cur.select(F.col("id").alias("nb"), F.col("core").alias("cn")), "nb"
                )
                .withColumn("rn", F.row_number().over(w))
                .groupBy("id")
                # H-index of the neighbor multiset: with values sorted
                # descending, H = max_i min(value_i, i)
                .agg(F.max(F.least(F.col("cn"), F.col("rn"))).alias("core"))
                .join(cur.withColumnRenamed("core", "prev"), "id")
                .select(
                    "id", "core", (F.col("core") != F.col("prev")).alias("changed")
                )
                .localCheckpoint(eager=True)
            )
            stable = nxt.filter(F.col("changed")).isEmpty()
            cur = nxt.select("id", "core")
            if stable:
                return cur
    raise RuntimeError(
        f"coreness did not reach the h-index fixpoint within {max_iter} rounds; "
        "refusing to return non-converged core numbers"
    )


def _brandes_betweenness(
    edge_list: list[tuple[int, int]], roots: list[int]
) -> dict[int, float]:
    """Exact source-sampled betweenness via Brandes' accumulation
    (Brandes 2001, "A faster algorithm for betweenness centrality")
    over an in-memory directed edge list: bc(v) = sum over sampled
    sources s and targets t of sigma_st(v)/sigma_st. Parallel edges
    count as distinct shortest paths (multigraph semantics), matching
    the enumeration oracle and the distributed loop, neither of which
    dedups the edge multiset. Used only under the collect threshold —
    the driver twin the property tests pin the distributed path
    against."""
    from collections import defaultdict, deque

    adj: dict[int, list[int]] = defaultdict(list)
    for a, b in edge_list:
        adj[a].append(b)
    bc: dict[int, float] = defaultdict(float)
    for s in roots:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds: dict[int, list[int]] = defaultdict(list)
        order: list[int] = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta: dict[int, float] = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s and delta[w] > 0.0:
                bc[w] += delta[w]
    return dict(bc)


def _brandes_backward_group(pdf):
    """applyInPandas kernel: ONE root's shortest-path DAG arrives as a
    pandas frame (root, node, depth, sigma, w, sigma_w) and the whole
    backward dependency accumulation runs task-locally, deepest depth
    first — delta(v) = sum_w sigma_v/sigma_w * (1 + delta(w)). Runs
    INSIDE an executor task (the SCC task-local-Tarjan pattern): the
    per-root DAG is root-keyed by construction, so this replaces
    O(depth) sequential driver barriers with ONE shuffle + one stage.
    Memory is bounded by the per-root DAG size threshold the caller
    enforces."""
    import pandas as pd

    delta: dict[int, float] = {}
    root = int(pdf["root"].iloc[0])
    for d in sorted(pdf["depth"].unique(), reverse=True):
        rows = pdf[pdf["depth"] == d]
        contrib = (rows["sigma"] / rows["sigma_w"]) * (
            1.0 + rows["w"].map(delta).fillna(0.0)
        )
        # a node has exactly one BFS depth per root, so per-depth
        # updates are disjoint and plain dict.update is the correct
        # accumulation
        delta.update(
            {int(k): float(v) for k, v in contrib.groupby(rows["node"]).sum().items()}
        )
    return pd.DataFrame(
        {
            "root": [root] * len(delta),
            "node": list(delta.keys()),
            "delta": list(delta.values()),
        }
    )


def _brandes_root_group(pdf):
    """applyInPandas kernel: ONE root's replicated edge list arrives as
    a pandas frame (root, src, dst) and the complete single-root
    Brandes (forward sigma-BFS + backward accumulation) runs
    task-locally by calling the SAME ``_brandes_betweenness`` twin the
    property tests pin — distributed-vs-driver parity by construction.
    Executor-side (no driver collect); memory bounded by the edge-count
    threshold the caller enforces."""
    import pandas as pd

    root = int(pdf["root"].iloc[0])
    pairs = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    bc = _brandes_betweenness(pairs, [root])
    return pd.DataFrame(
        {
            "node": list(bc.keys()),
            "delta": [float(v) for v in bc.values()],
        }
    )


def betweenness_centrality(
    edges: DataFrame,
    roots,
    max_iter: int = 1000,
    loop_shuffle_width: int | None = None,
    collect_threshold: int = 5_000_000,
    broadcast_frontier: bool = False,
    backward_task_threshold: int = 2_000_000,
    per_root_task_threshold: int = 5_000_000,
) -> DataFrame:
    """Source-sampled shortest-path betweenness: (id, betweenness)
    with bc(v) = sum_{s in roots, t} sigma_st(v)/sigma_st over the
    DIRECTED graph (v strictly interior, endpoints excluded). The
    reference's plugin set ships algo.betweenness alongside
    PageRank/SCC/Louvain (bin/install_neo4j_plugins.sh:4); sampled
    sources are the standard scale form (Brandes/Pich 2007) — exact
    per sampled source, and exact overall when ``roots`` is every
    vertex.

    Distributed path is Brandes' two sweeps as level-synchronous
    DataFrame loops, O(diameter) rounds each, state one row per
    (root, node):
    - forward: multi-root BFS carrying the shortest-path count
      sigma — frontier join edges, anti-join visited, groupBy
      (root, node) summing sigma. A walk reaching a node at its
      minimum depth has every prefix minimal, so per-level sigma
      summation is exact.
    - backward: dependency accumulation delta(v) = sum_w
      sigma_v/sigma_w * (1 + delta(w)) over the shortest-path-DAG
      edges (depth(w) = depth(v)+1), walked from the deepest level
      up — each round one join of two level-sized frames, no
      cartesian.
    The shortest-path DAG is materialized ONCE after the forward
    sweep (one two-sided equi-join of the depth map with the edge
    set), so each backward round is a filter over that checkpointed
    frame plus one level-sized join — not a fresh join against the
    full edge set per level.

    The sampled root set is small by contract (broadcast-sized);
    per-level work is O(|roots| * E) worst case, the same shape as
    the multi-root BFS the closure family already runs at scale.
    ``broadcast_frontier`` is the closure family's small-probe mode:
    frontier/visited/delta frames (all bounded by |roots| x frontier
    width) ride broadcast joins so only the per-level groupBy
    shuffles — right for anchored/sampled probes, wrong for
    all-sources runs.
    Under ``collect_threshold`` edges the slice collects and exact
    in-driver Brandes runs — the same hybrid policy as SCC's
    driver-Tarjan; parity between the two paths is property-tested.
    RAISES if either sweep exceeds ``max_iter`` rounds rather than
    returning truncated centralities.
    """
    from github_miner_spark.graph.paths import (
        _adaptive_loop_width,
        _loop_shuffle_partitions,
    )

    spark = edges.sparkSession
    # dedup at entry: a repeated sampled source contributes ONCE on
    # every path (the task kernel's groupBy and the distributed sweeps
    # both merge duplicates; the driver twin iterates the list, so
    # without this it would be the odd one out and the gate would leak)
    roots = sorted({int(r) for r in roots})
    out_schema = "id bigint, betweenness double"
    if not roots:
        return spark.createDataFrame([], out_schema)
    # One lineage traversal (the SCC discipline): checkpoint the edge
    # projection first, then count/collect the checkpoint — never
    # re-run the input derivation.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    n_edges = edges.count()
    thr = _gate(collect_threshold)
    if thr > 0 and n_edges <= thr:
        rows = [(r["src"], r["dst"]) for r in edges.collect()]
        bc = _brandes_betweenness(rows, roots)
        return spark.createDataFrame(
            [(k, float(v)) for k, v in bc.items()], out_schema
        )
    root_df = spark.createDataFrame([(r,) for r in roots], "root bigint")
    # ---- per-root task-local path ------------------------------------
    # When the edge set fits an executor task, each sampled root's
    # ENTIRE Brandes run is one applyInPandas group (the SCC task-local
    # Tarjan pattern): replicate the checkpointed edge list per root
    # with a broadcast cross join (|roots| is a broadcast-sized sample
    # by contract, so replication volume is |roots| x E rows, shuffled
    # once), run the pinned driver twin inside the task, sum. Three
    # stages total instead of O(diameter) sequential barriers —
    # measured 7.6-8.8s -> ~1.5s at sf0.1 forced-distributed. No
    # driver collect anywhere, so this IS a 100 TB code path for any
    # graph whose edge set fits task memory; beyond the threshold the
    # windowed level-synchronous sweeps below take over (exact at any
    # size, parity property-tested against this path and the driver).
    # The ROOT SET must also be bounded for this path to be the
    # broadcast-join analog it claims: the docstring blesses roots =
    # every vertex (exact betweenness), and replicating |V| x E rows
    # for a large V would be the all-pairs blow-up, not a broadcast.
    # The binding quantity is the replication volume |roots| x E (the
    # broadcast join's build-side-copies analog), so gate on that
    # product rather than a flat root cap — a flat cap would reject
    # legitimate wide-sample/small-graph calls that replicate less
    # than a narrow sample over a threshold-sized graph. Oversized
    # calls fall through to the windowed level-synchronous sweeps,
    # whose per-level state is frontier-sized at any |roots|.
    if (
        per_root_task_threshold > 0
        and n_edges <= per_root_task_threshold
        and len(roots) * max(n_edges, 1) <= ROOT_REPLICATION_BUDGET
    ):
        rep = edges.crossJoin(F.broadcast(root_df))
        deltas = rep.groupBy("root").applyInPandas(
            _brandes_root_group, schema="node bigint, delta double"
        )
        return (
            deltas.groupBy("node")
            .agg(F.sum("delta").alias("betweenness"))
            .select(F.col("node").alias("id"), "betweenness")
        )
    if loop_shuffle_width is None:
        loop_shuffle_width = _adaptive_loop_width(spark, n_edges)
    with _loop_shuffle_partitions(
        spark, enabled=True, width=loop_shuffle_width, aqe_off=True
    ):
        # ---- forward sweep: windowed sigma-BFS ------------------------
        # ``forward_window`` levels expand LAZILY between barriers:
        # each intra-window level keeps its own per-level groupBy (so
        # sigma stays node-aggregated — chaining the groupBys lazily
        # plans the window as ONE job with k sequential shuffles, the
        # pagerank barrier_every pattern) and anti-joins only against
        # the WINDOW-START visited set (a fixed checkpointed frame —
        # single-reference chain, so no exponential unroll). Nodes
        # re-reached at a deeper depth INSIDE the window survive until
        # window close, where one min-depth-per-(root,node) filter
        # drops them. This post-hoc filter is EXACT for sigma: every
        # prefix of a shortest path is itself minimal, so no fragment
        # expanded from a non-minimal row can ever land at a node's
        # minimal depth — the rows surviving the filter are exactly
        # the per-level-barrier rows. Cuts the forward sweep from
        # O(depth) barriers to O(depth / window): measured 18 -> 5
        # jobs, 6.4-11.6s -> ~2-3s at sf0.1 forced-distributed.
        # (The earlier windowed attempt the r6 code warned about
        # double-referenced the lazy window union in its min-depth
        # join-back; the window-function filter below references the
        # materialized frame once.)
        from pyspark.sql.window import Window as _W

        frontier = (
            root_df.select(
                "root", F.col("root").alias("node"), F.lit(1.0).alias("sigma")
            )
            .localCheckpoint(eager=True)
        )
        win_levels: list[DataFrame] = []  # exact (root, node, depth, sigma)
        visited_frames = [frontier.select("root", "node")]
        depth = 0
        forward_window = 4
        for _ in range(max_iter):
            base_visited = reduce(lambda a, b: a.unionByName(b), visited_frames)
            anti = F.broadcast(base_visited) if broadcast_frontier else base_visited
            lazy: list[DataFrame] = []
            cur = frontier
            for j in range(1, forward_window + 1):
                # small-probe mode keeps the frontier side broadcast so
                # the big edge table never re-shuffles per level (the
                # broadcast builds lazily inside the window's one job —
                # no extra driver barrier)
                f_side = F.broadcast(cur) if broadcast_frontier else cur
                cur = (
                    f_side.join(edges, cur.node == edges.src)
                    .select("root", F.col("dst").alias("node"), "sigma")
                    .join(anti, ["root", "node"], "left_anti")
                    .groupBy("root", "node")
                    .agg(F.sum("sigma").alias("sigma"))
                )
                lazy.append(cur.withColumn("depth", F.lit(depth + j)))
            closed = (
                reduce(lambda a, b: a.unionByName(b), lazy)
                .withColumn(
                    "_mind", F.min("depth").over(_W.partitionBy("root", "node"))
                )
                .filter(F.col("depth") == F.col("_mind"))
                .drop("_mind")
                .localCheckpoint(eager=False)
            )
            # the window's ONE materializing barrier: persists the
            # lazy checkpoint and reads back row count, deepest-slice
            # count (the next frontier's emptiness probe) and the max
            # depth reached — no separate isEmpty/max jobs
            stats = closed.agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("depth") == depth + forward_window).cast("bigint")
                ).alias("tail"),
                F.max("depth").alias("maxd"),
            ).collect()[0]
            if stats["n"] == 0:
                break
            win_levels.append(closed)
            visited_frames.append(closed.select("root", "node"))
            max_depth = int(stats["maxd"])
            if stats["tail"] == 0:
                break  # BFS exhausted inside this window
            frontier = closed.filter(F.col("depth") == depth + forward_window)
            depth += forward_window
        else:
            raise RuntimeError(
                f"betweenness forward sweep exceeded {max_iter} rounds; "
                "refusing to return truncated centralities"
            )
        depth_map = reduce(
            lambda a, b: a.unionByName(b),
            [
                root_df.select(
                    "root",
                    F.col("root").alias("node"),
                    F.lit(1.0).alias("sigma"),
                    F.lit(0).alias("depth"),
                )
            ]
            + [lv.select("root", "node", "sigma", "depth") for lv in win_levels],
        )
        n_levels = (max_depth + 1) if win_levels else 1
        if n_levels < 3:
            return spark.createDataFrame([], out_schema)
        # ---- SP-DAG, materialized once -------------------------------
        # (root, v, depth, sigma_v, w, sigma_w) with depth(w) =
        # depth(v)+1: the depth map (union of checkpointed window
        # closes) joined to the edge set and back to itself shifted one
        # level — two equi-joins total, after which the backward sweep
        # reads only this checkpointed frame.
        hi_side = depth_map.select(
            "root",
            F.col("node").alias("w"),
            (F.col("depth") - 1).alias("depth"),
            F.col("sigma").alias("sigma_w"),
        )
        spd = (
            depth_map.filter(F.col("depth") < n_levels - 1)
            .join(edges, depth_map.node == edges.src)
            .select("root", "node", "depth", "sigma", F.col("dst").alias("w"))
            .join(hi_side, ["root", "w", "depth"])
            .localCheckpoint(eager=True)
        )
        # ---- backward sweep --------------------------------------------
        # Preferred path: the SP-DAG is root-keyed by construction, so
        # when every root's DAG fits one executor task the ENTIRE
        # accumulation is one shuffle + one applyInPandas stage (the
        # SCC task-local-Tarjan pattern) — replacing O(depth)
        # sequential driver barriers. The threshold probe is one
        # aggregate over the already-checkpointed frame; at 100 TB a
        # root whose reachable DAG exceeds task memory falls back to
        # the level-synchronous loop below, which is exact at any size.
        if backward_task_threshold > 0:
            mx = spd.groupBy("root").count().agg(F.max("count")).collect()[0][0]
            if mx is not None and mx <= backward_task_threshold:
                deltas = spd.groupBy("root").applyInPandas(
                    _brandes_backward_group,
                    schema="root bigint, node bigint, delta double",
                )
                return (
                    deltas.filter(F.col("node") != F.col("root"))
                    .groupBy("node")
                    .agg(F.sum("delta").alias("betweenness"))
                    .select(F.col("node").alias("id"), "betweenness")
                )
        # Fallback: delta per level, deepest first — delta at the
        # deepest level is 0 (no successors); walking up, each round is
        # one filter over spd plus one level-sized join against the
        # previously-computed delta.
        bc_parts: list[DataFrame] = []
        delta_next: DataFrame | None = None
        for d in range(n_levels - 2, 0, -1):
            spe = spd.filter(F.col("depth") == d)
            if delta_next is not None:
                dn = delta_next.select(
                    "root", F.col("node").alias("w"), F.col("delta").alias("delta_w")
                )
                spe = spe.join(
                    F.broadcast(dn) if broadcast_frontier else dn,
                    ["root", "w"],
                    "left",
                )
            else:
                spe = spe.withColumn("delta_w", F.lit(None).cast("double"))
            delta_d = (
                spe.groupBy("root", "node")
                .agg(
                    F.sum(
                        F.col("sigma")
                        / F.col("sigma_w")
                        * (F.lit(1.0) + F.coalesce(F.col("delta_w"), F.lit(0.0)))
                    ).alias("delta")
                )
                .localCheckpoint(eager=True)
            )
            bc_parts.append(delta_d)
            delta_next = delta_d
        return (
            reduce(lambda a, b: a.unionByName(b), bc_parts)
            .filter(F.col("node") != F.col("root"))
            .groupBy("node")
            .agg(F.sum("delta").alias("betweenness"))
            .select(F.col("node").alias("id"), "betweenness")
        )
