"""End-to-end curation pipeline: funnel counts, dedup composition, and
export integrity over the fixture corpus."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from github_miner_spark.functions.pipeline import curate_and_export
from github_miner_spark.io.tables import load_table

SF = "/root/testdata/sf0.001"


def test_curate_and_export_funnel_monotone_and_export_matches(spark):
    docs = load_table(spark, "documents", SF)
    with tempfile.TemporaryDirectory() as d:
        report = curate_and_export(docs, f"{d}/shards", num_shards=3)
        # funnel counts are monotone non-increasing
        seq = [
            report["n_total"],
            report["n_lang"],
            report["n_quality"],
            report["n_tokens"],
            report["n_exact_kept"],
            report["n_near_kept"],
        ]
        assert seq == sorted(seq, reverse=True), seq
        assert report["n_total"] == docs.count()
        assert report["n_near_kept"] > 0
        # the export holds exactly the final survivor set
        back = spark.read.parquet(f"{d}/shards")
        assert back.count() == report["n_near_kept"]
        assert report["manifest"]["rows"] == report["n_near_kept"]
        # doc_ids unique after dedup
        assert back.select("doc_id").distinct().count() == back.count()


def test_curate_funnel_matches_registered_funnel_query(spark):
    """The pipeline's first four stages must agree with the
    corpus_filter_funnel query (same operators, same thresholds)."""
    from github_miner_spark.queries.text_queries import corpus_filter_funnel

    docs = load_table(spark, "documents", SF)
    with tempfile.TemporaryDirectory() as d:
        report = curate_and_export(docs, f"{d}/shards", num_shards=2)
    row = corpus_filter_funnel(spark, SF).collect()[0]
    assert report["n_total"] == row["n_total"]
    assert report["n_lang"] == row["n_lang"]
    assert report["n_quality"] == row["n_quality"]
    assert report["n_tokens"] == row["n_tokens"]


def test_streaming_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark keeps the FIRST occurrence of each
    event_id across micro-batches while the key is inside the
    watermark horizon."""
    import tempfile as _tf

    from github_miner_spark.streaming.events import dedup_stream

    base_ns = 1700000000 * 1_000_000_000
    with _tf.TemporaryDirectory() as d:
        src, out, ckpt = f"{d}/in", f"{d}/out", f"{d}/ckpt"

        def write(rows):
            spark.createDataFrame(
                rows,
                "event_id bigint, event_type string, user_id bigint, ts bigint, value double",
            ).coalesce(1).write.mode("append").parquet(src)

        def drain():
            stream = (
                spark.readStream.schema(
                    "event_id bigint, event_type string, user_id bigint, ts bigint, value double"
                )
                .parquet(src)
                .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            )
            q = (
                dedup_stream(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        write([(1, "a", 1, base_ns, 1.0), (2, "b", 1, base_ns + 10**9, 2.0)])
        drain()
        # batch 2 replays id 1 (duplicate, within watermark) + new id 3
        write([(1, "a", 1, base_ns, 9.9), (3, "c", 2, base_ns + 2 * 10**9, 3.0)])
        drain()
        got = sorted(
            (r["event_id"], r["value"]) for r in spark.read.parquet(out).collect()
        )
        assert got == [(1, 1.0), (2, 2.0), (3, 3.0)], got


def test_text_store_content_addressing(spark, tmp_path):
    """The materialized shingle index must key on the documents file's
    identity: same content -> reused store; changed content -> a
    DIFFERENT store dir (never a stale index served for new data)."""
    import shutil

    from github_miner_spark.functions import text_store

    src = tmp_path / "corpus"
    src.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src / "documents.parquet")
    p1 = text_store.materialize_text_index(spark, str(src))
    p2 = text_store.materialize_text_index(spark, str(src))
    assert p1 == p2  # idempotent reuse

    # regenerate the file (content may be identical; mtime/size change
    # is what the key watches, matching the graph store's contract)
    docs = spark.read.parquet(str(src / "documents.parquet"))
    sub = docs.limit(5)
    shutil.rmtree(src / "documents.parquet", ignore_errors=True)
    sub.toPandas().to_parquet(src / "documents.parquet")
    p3 = text_store.materialize_text_index(spark, str(src))
    assert p3 != p1
    idx = text_store.load_shingle_index(spark, str(src))
    assert idx.select("doc_id").distinct().count() <= 5


def test_dup_pair_store_idempotent_and_matches_inline(spark, tmp_path, monkeypatch):
    """The materialized near-dup pair set must (a) reuse its store on a
    second call, (b) key on the Jaccard threshold, and (c) contain
    exactly the pairs the inline candidate join detects."""
    import shutil

    from github_miner_spark.functions import text_store
    from github_miner_spark.functions.dedup import jaccard_pairs
    from github_miner_spark.io.tables import load_table

    monkeypatch.setattr(text_store, "STORE_ROOT", str(tmp_path))
    src = tmp_path / "corpus"
    src.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src / "documents.parquet")

    p1 = text_store.materialize_dup_pairs(spark, str(src), threshold=0.8)
    p2 = text_store.materialize_dup_pairs(spark, str(src), threshold=0.8)
    assert p1 == p2
    p_low = text_store.materialize_dup_pairs(spark, str(src), threshold=0.5)
    assert p_low != p1

    stored = sorted(
        map(tuple, text_store.load_dup_pairs(spark, str(src), 0.8).collect())
    )
    docs = load_table(spark, "documents", str(src))
    idx = text_store.load_shingle_index(spark, str(src))
    inline = sorted(
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.8, index=idx).collect()
    )
    assert stored == inline and len(stored) > 0


def test_redact_pii_crafted(spark):
    """redact_pii rewrites exactly the spans pii_counts counts."""
    from pyspark.sql import functions as F

    from github_miner_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@example.co.uk and ops@corp.io now", 2, 0),
            ("server at 10.0.0.1 and 192.168.1.255", 0, 2),
            ("version 1.2.3 is not an address", 0, 0),
            ("no pii at all", 0, 0),
        ],
        "text string, want_e int, want_i int",
    )
    e, i = pii_counts(F.col("text"))
    rows = df.select(
        "text", "want_e", "want_i", e.alias("e"), i.alias("i"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()
    for r in rows:
        assert (r["e"], r["i"]) == (r["want_e"], r["want_i"]), r
        assert ("<EMAIL>" in r["red"]) == (r["want_e"] > 0)
        assert ("<IP>" in r["red"]) == (r["want_i"] > 0)
        assert "@" not in r["red"]


def test_token_windows_short_and_exact(spark):
    """token_windows: empty below w (sequence(1,0) would be [1,0]!),
    one window at exactly w, sliding count above."""
    from pyspark.sql import functions as F

    from github_miner_spark.functions.text import token_windows

    df = spark.createDataFrame(
        [("a b",), ("a b c",), ("a b c d e",)], "text string"
    )
    out = df.select(
        token_windows(F.split(F.col("text"), " "), 3).alias("w")
    ).collect()
    assert list(out[0]["w"]) == []
    assert list(out[1]["w"]) == ["a b c"]
    assert list(out[2]["w"]) == ["a b c", "b c d", "c d e"]


def test_logreg_gd_learns_separable_labels(spark):
    """Full-batch GD on a linearly separable toy set: training
    accuracy beats the majority class and more iterations do not hurt
    (the loss is convex; with a fixed lr the 3->6 iteration accuracy
    is monotone non-decreasing on this data)."""
    from pyspark.sql import functions as F

    from github_miner_spark.functions.ml import (
        logistic_regression_gd,
        score_logistic,
    )

    rows = [(float(i), 1.0 if i >= 10 else 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, "x double, y double").withColumn(
        "x", F.col("x") / 10.0
    )

    def acc(iters):
        w = logistic_regression_gd(df, ["x"], "y", iterations=iters, lr=2.0)
        p = score_logistic(df, ["x"], w)
        return (
            df.select(
                F.avg(
                    F.when((p >= 0.5) == (F.col("y") == 1.0), 1.0).otherwise(0.0)
                ).alias("a")
            ).collect()[0]["a"]
        )

    a3, a6 = acc(3), acc(6)
    assert a3 > 0.5
    assert a6 >= a3


def test_hll_estimate_within_sketch_error_band(spark):
    """m=1024 registers -> sigma ~ 1.04/sqrt(1024) ~ 3.25%; every
    per-source estimate must land within a generous 5-sigma band of
    the exact count (a both-engines-wrong guard the oracle parity
    cannot give), and the linear-counting small-range fallback must
    keep estimates strictly positive."""
    from github_miner_spark.queries.text_queries import hll_vocab_estimates

    rows = hll_vocab_estimates(spark, SF).collect()
    assert rows, "no sources"
    for r in rows:
        assert r.exact_distinct > 0
        assert r.hll_estimate > 0
        assert r.rel_error < 0.17, (r.source, r.rel_error)


def test_source_unigram_kl_information_identities(spark):
    """Gibbs: KL >= 0; cross-entropy decomposes as H(q) + KL(q||p)
    (up to the 6dp output rounding); entropy is non-negative."""
    from github_miner_spark.queries.text_queries import source_unigram_kl

    rows = source_unigram_kl(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.kl_nats >= 0, r
        assert r.entropy_nats >= 0, r
        assert abs(r.cross_entropy_nats - (r.entropy_nats + r.kl_nats)) < 1e-4, r


def test_events_ks_drift_bounds_and_totals(spark):
    """KS statistic lives in [0, 1]; the side split partitions each
    type's rows exactly (n_early + n_late == per-type count)."""
    from github_miner_spark.io.tables import load_table
    from github_miner_spark.queries.events_queries import events_ks_drift

    out = {r.event_type: r for r in events_ks_drift(spark, SF).collect()}
    assert out
    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, "events", SF)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for t, r in out.items():
        assert 0.0 <= r.ks_stat <= 1.0, r
        assert r.n_early + r.n_late == totals[t], r


def test_bpe_vocab_induction_matches_python_reference(spark):
    """Full independent reference of the BPE training loop, written
    from the spec (NOT from the engine/oracle algebra): tokenize each
    doc, then per round count adjacent symbol pairs with a Counter,
    pick argmax with (count desc, 'left|right' asc) tiebreak, and
    merge via an EXPLICIT greedy left-to-right scan over token lists —
    a different merge formulation than the string-replace both engine
    and oracle share, so a replace-semantics bug mirrored into the
    oracle fails here. Every emitted merge row must replay exactly."""
    import re
    from collections import Counter

    from github_miner_spark.queries.text_queries import (
        _BPE_MERGE_ROUNDS,
        bpe_vocab_induction,
    )

    docs = [
        r["text"]
        for r in load_table(spark, "documents", SF).select("text").collect()
    ]
    corpus = [
        [t for t in re.sub(r"[^a-z0-9]+", " ", d.lower()).split(" ") if t]
        for d in docs
    ]
    corpus = [c for c in corpus if c]
    expected = []
    for step in range(1, _BPE_MERGE_ROUNDS + 1):
        counts = Counter()
        for toks in corpus:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}"))
        (a, b), n = best
        expected.append((step, a, b, n))
        merged_corpus = []
        for toks in corpus:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(f"{a} {b}")
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            merged_corpus.append(out)
        corpus = merged_corpus
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["n_occurrences"])
        for r in bpe_vocab_induction(spark, SF).orderBy("step").collect()
    ]
    assert got == expected
    assert len(got) == _BPE_MERGE_ROUNDS


def test_random_walks_follow_real_edges(spark):
    """Every consecutive pair in every emitted path must be a real
    module-dependency edge, depth must equal len(path)-1, and the two
    seeds must produce at least one divergent walk (the determinism
    the hash provides must still be seed-sensitive)."""
    from github_miner_spark.graph.store import load_graph
    from github_miner_spark.queries.algorithms_queries import (
        deterministic_random_walks,
    )

    edges = {
        (r.src, r.dst)
        for r in load_graph(spark, SF).module_dep_edges().select("src", "dst").collect()
    }
    rows = deterministic_random_walks(spark, SF).collect()
    assert rows
    diverged = False
    by_start: dict[int, set[str]] = {}
    for r in rows:
        ids = [int(x) for x in r.path.split("->")]
        assert ids[0] == r.start_module
        assert len(ids) - 1 == r.depth, r
        assert ids[-1] == r.terminal
        for a, b in zip(ids, ids[1:]):
            assert (a, b) in edges, (a, b)
        by_start.setdefault(r.start_module, set()).add(r.path)
    diverged = any(len(paths) > 1 for paths in by_start.values())
    assert diverged, "all seed pairs produced identical walks"


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark):
    """Count-min's one-sided error guarantee: every estimate >= exact
    (overestimate >= 0); with 4x1024 counters vs a few-thousand-token
    vocabulary, top-20 estimates should also stay within 2x."""
    from github_miner_spark.queries.text_queries import cms_heavy_hitter_estimates

    rows = cms_heavy_hitter_estimates(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cms_estimate == r.exact_count + r.overestimate
        assert r.cms_estimate <= 2 * r.exact_count, r


def test_binned_quantiles_within_one_bin_of_exact(spark):
    """The equi-width sketch's error bound: each estimate must land
    within one bin width of the exact interpolated percentile."""
    from github_miner_spark.io.tables import load_table
    from github_miner_spark.queries.relational import binned_quantile_estimates

    li = load_table(spark, "lineitem", SF)
    bounds = {
        r.g: (r.mx - r.mn) / 1024.0
        for r in li.groupBy(F.col("l_returnflag").alias("g"))
        .agg(F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx"))
        .collect()
    }
    rows = binned_quantile_estimates(spark, SF).collect()
    assert rows
    for r in rows:
        w = bounds[r.l_returnflag]
        for est, exact in (
            (r.p50_est, r.p50_exact),
            (r.p95_est, r.p95_exact),
            (r.p99_est, r.p99_exact),
        ):
            assert abs(est - exact) <= w, (r.l_returnflag, est, exact, w)


def test_bloom_prefilter_no_false_negatives(spark):
    """Bloom's structural guarantee: every true member passes the
    filter (pass count >= member count, so the exact join on
    survivors loses nothing), and the false-positive rate stays far
    below the ~(fill)^4 ceiling for a 16384-bit filter."""
    from github_miner_spark.queries.curation_queries import (
        bloom_decontamination_prefilter,
    )

    r = bloom_decontamination_prefilter(spark, SF).collect()[0]
    assert r.n_bloom_pass >= r.n_true_members, r
    assert r.n_false_positives == r.n_bloom_pass - r.n_true_members
    assert 0.0 <= r.false_positive_rate < 0.2, r
    assert r.n_train_shingles > 0


def test_node2vec_walks_match_python_reference(spark):
    """Full independent reference of the second-order pick, written
    from the spec (NOT from the engine/oracle algebra): at each step
    the candidate minimizing u * factor wins, where u is the 56-bit
    md5 uniform and factor is 16 for a return move, 4 for a
    distance-1 move (edge prev->cand exists), 1 otherwise. Every
    emitted path must replay exactly — an inverted or dropped bias
    (which oracle parity cannot see, since both sides share the
    algebra) fails here. Also asserts the bias flips at least one
    pick vs an unbiased replay, so the guard is not vacuous."""
    import hashlib

    from github_miner_spark.graph.store import load_graph
    from github_miner_spark.queries.algorithms_queries import node2vec_biased_walks

    edge_rows = load_graph(spark, SF).module_dep_edges().select("src", "dst").collect()
    edges = {(r.src, r.dst) for r in edge_rows}
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)

    def u56(seed: int, step: int, start: int, cand: int) -> int:
        h = hashlib.md5(f"{seed}|{step}|{start}|{cand}".encode()).hexdigest()
        return int(h[:14], 16)

    def replay(start: int, seed: int, biased: bool) -> list[int]:
        prev, cur, path = start, start, [start]
        for step in range(1, 5):
            cands = out.get(cur)
            if not cands:
                break
            scored = []
            for cand in cands:
                if step == 1 or not biased:
                    factor = 1
                elif cand == prev:
                    factor = 16
                elif (prev, cand) in edges:
                    factor = 4
                else:
                    factor = 1
                scored.append((u56(seed, step, start, cand) * factor, cand))
            _, best = min(scored)
            prev, cur = cur, best
            path.append(best)
        return path

    rows = node2vec_biased_walks(spark, SF).collect()
    assert rows
    bias_flipped = False
    for r in rows:
        ids = [int(x) for x in r.path.split("->")]
        assert ids[0] == r.start_module and ids[-1] == r.terminal
        assert len(ids) - 1 == r.depth, r
        assert ids == replay(r.start_module, r.seed, biased=True), r
        if ids != replay(r.start_module, r.seed, biased=False):
            bias_flipped = True
    assert bias_flipped, "p/q factors never changed a pick on this graph"


def test_priority_sample_matches_python_reference(spark):
    """From-spec replay of the DLT priority sample: recompute every
    doc's priority with hashlib, take the top-20 under the same
    (priority DESC, doc_id) order, and check tau, the membership
    digest, and the exact-decomposed estimator against the query."""
    import hashlib

    from github_miner_spark.queries.curation_queries import priority_sample_summary

    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, "documents", SF).select("doc_id", "n_chars").collect()
    }

    def prio(doc_id: int, w: int) -> float:
        h = int(hashlib.md5(f"ps|{doc_id}".encode()).hexdigest()[:15], 16)
        return w / (h / 2.0**60)

    ordered = sorted(
        ((prio(d, w), d, w) for d, w in docs.items()), key=lambda t: (-t[0], t[1])
    )
    top, tau_row = ordered[:20], ordered[20]
    tau = tau_row[0]
    est = float(sum(w for _p, _d, w in top if w >= tau)) + sum(
        1 for _p, _d, w in top if w < tau
    ) * tau

    r = priority_sample_summary(spark, SF).collect()[0]
    assert r.n_sampled == 20
    assert r.sum_sampled_ids == sum(d for _p, d, _w in top)
    assert abs(r.tau - tau) < 1e-6
    assert abs(r.est_total_chars - est) < 1e-5
    assert r.true_total_chars == sum(docs.values())


def test_hll_shingle_estimates_exercise_raw_branch(spark):
    """The shingle HLL must leave linear counting: ~1.2k+ distinct
    shingles against 256 registers saturates nearly every bucket, so
    the harmonic-mean estimator is the branch under test — and its
    error must stay within a generous 5-sigma of 1.04/sqrt(256)."""
    from github_miner_spark.queries.text_queries import hll_shingle_estimates

    rows = hll_shingle_estimates(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.buckets_used >= 250, r  # raw branch, not linear counting
        assert r.rel_error < 0.33, r


def test_kmv_set_estimates_within_sketch_error(spark):
    """KMV union estimates at k=128 have sigma ~ 1/sqrt(k-2) ~ 9%:
    every pair must land within ~5 sigma and the median within ~1.5
    sigma; intersections are non-negative and bounded by the union."""
    import statistics

    from github_miner_spark.queries.text_queries import kmv_set_operation_estimates

    rows = kmv_set_operation_estimates(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.union_rel_error < 0.5, r
        assert 0.0 <= r.kmv_intersection <= r.kmv_union + 1e-9, r
        assert r.exact_union >= r.exact_intersection
    assert statistics.median(r.union_rel_error for r in rows) < 0.15


def test_kll_quantile_merge_from_spec_replay(spark):
    """FROM-SPEC replay of the deterministic KLL compaction: pure
    Python (sorted lists + odd-rank slicing, hard-coding the intended
    algebra) recomputes the sketch and every quantile estimate from the
    raw parquet rows. Catches a compaction bug mirrored into the DuckDB
    oracle, which parity cannot (the node2vec lesson). Also pins that
    the sketch is genuinely lossy (sketch_rows < exact_rows) and that
    errors are bounded by the KLL weight granularity."""
    import duckdb

    from github_miner_spark.queries.events_queries import (
        _KLL_LEVELS,
        kll_quantile_merge,
    )

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.sql(
        "SELECT event_type, CAST(round(value*100.0,0) AS BIGINT), event_id "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()

    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, v, eid in rows:
        by_type.setdefault(et, []).append((int(v), int(eid)))
    survivors: list[tuple[int, int]] = []
    for et, items in by_type.items():
        cur = sorted(items)
        for _ in range(_KLL_LEVELS):
            cur = cur[::2]  # odd ranks, 1-indexed == even indices
        survivors.extend(cur)
    survivors.sort()
    base = sorted((int(v), int(eid)) for _et, v, eid in rows)

    def order_stat(seq, qn, qd):
        # rank = ceil(qn*len/qd), 1-indexed — the query's integer form
        rank = (qn * len(seq) + qd - 1) // qd
        return seq[rank - 1][0]

    want = {}
    for q, qn, qd in [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)]:
        est = order_stat(survivors, qn, qd)
        exact = order_stat(base, qn, qd)
        want[q] = (est, exact, abs(est - exact), len(survivors), len(base))

    got = {
        r["q"]: (
            r["est_cents"],
            r["exact_cents"],
            r["abs_err_cents"],
            r["sketch_rows"],
            r["exact_rows"],
        )
        for r in kll_quantile_merge(spark, sf_dir).collect()
    }
    assert got == want
    assert all(v[3] < v[4] for v in want.values())  # genuinely compacted


def test_bm25_matches_python_reference(spark):
    """The registered BM25 top-20 must equal an independent Python
    implementation of the Robertson/Lucene formula over the same
    tokenization, with the same per-term integer quantization."""
    import math
    import re
    from collections import Counter

    from github_miner_spark.io.tables import load_table
    from github_miner_spark.queries.text_queries import (
        BM25_B,
        BM25_K1,
        BM25_SCALE,
        BM25_TERMS,
        bm25_retrieval_topk,
    )

    sf = "/root/testdata/sf0.001"
    docs = []
    for r in load_table(spark, "documents", sf).select("doc_id", "text").collect():
        toks = [
            t
            for t in re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).split(" ")
            if t
        ]
        if toks:
            docs.append((r["doc_id"], toks))
    n = len(docs)
    sdl = sum(len(t) for _, t in docs)
    avgdl = sdl / n
    df = Counter(
        term for _, toks in docs for term in set(toks) if term in BM25_TERMS
    )
    want_scores = {}
    for doc_id, toks in docs:
        tf = Counter(t for t in toks if t in BM25_TERMS)
        if not tf:
            continue
        sq = 0
        for term, f in tf.items():
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            w = (
                idf
                * (f * (BM25_K1 + 1))
                / (f + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avgdl))
            )
            sq += round(w * BM25_SCALE)
        want_scores[doc_id] = sq
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["doc_id"], r["score_q"], r["rank"])
        for r in bm25_retrieval_topk(spark, sf).collect()
    ]
    assert got == [(d, s, i + 1) for i, (d, s) in enumerate(want)]


def test_item_cooccurrence_matches_python_reference(spark):
    """The co-occurrence top-20 must equal an independent Python
    implementation: distinct user-item incidence from the props JSON,
    the power-user degree cap, pair counts, and the cosine ranking."""
    import json as _json
    import math
    from collections import Counter, defaultdict

    from github_miner_spark.io.tables import load_table
    from github_miner_spark.queries.events_queries import (
        COOC_USER_CAP,
        item_cooccurrence_topk,
    )

    sf = "/root/testdata/sf0.001"
    per_user = defaultdict(set)
    for r in load_table(spark, "events", sf).select("user_id", "props").collect():
        k = _json.loads(r["props"]).get("k")
        if k is not None:
            per_user[r["user_id"]].add(int(k))
    kept = {u: items for u, items in per_user.items() if len(items) <= COOC_USER_CAP}
    co: Counter = Counter()
    pop: Counter = Counter()
    for items in kept.values():
        s = sorted(items)
        pop.update(s)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                co[(a, b)] += 1
    scored = [
        (a, b, n, round(n / math.sqrt(pop[a] * pop[b]), 6))
        for (a, b), n in co.items()
    ]
    want = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:20]
    got = [
        (r["item_a"], r["item_b"], r["co_users"], r["cosine"], r["rank"])
        for r in item_cooccurrence_topk(spark, sf).collect()
    ]
    assert got == [(a, b, n, c, i + 1) for i, (a, b, n, c) in enumerate(want)]


def test_span_removal_plan_from_spec_replay(spark):
    """FROM-SPEC replay of the exact-substring removal plan in plain
    Python: tokenize with the same regex, enumerate 5-token windows,
    keep the corpus-first occurrence of every duplicated window
    (ordered by doc_id then position), merge later occurrences into
    maximal spans (start gap <= 5 coalesces), and compare the emitted
    extents row-for-row. Also pins the Lee et al. invariants: spans
    never overlap within a doc, every span covers >= 5 tokens, and
    every span lies inside its document."""
    import re
    from collections import defaultdict

    from github_miner_spark.queries.dedup_queries import (
        duplicated_span_removal_plan,
    )

    w = 5
    toks_by_doc = {}
    for r in load_table(spark, "documents", SF).select("doc_id", "text").collect():
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).split(" ") if t]
        toks_by_doc[r["doc_id"]] = toks
    occs = defaultdict(list)
    for doc_id in sorted(toks_by_doc):
        toks = toks_by_doc[doc_id]
        for p in range(len(toks) - w + 1):
            occs[" ".join(toks[p : p + w])].append((doc_id, p + 1))
    sites = defaultdict(list)
    for sites_of_win in occs.values():
        for doc_id, pos in sorted(sites_of_win)[1:]:  # corpus-first kept
            sites.setdefault(doc_id, []).append(pos)
    want = []
    for doc_id in sorted(sites):
        run = []
        for pos in sorted(sites[doc_id]):
            if run and pos - run[-1] > w:
                want.append((doc_id, run[0], run[-1] + w - 1, len(run)))
                run = []
            run.append(pos)
        if run:
            want.append((doc_id, run[0], run[-1] + w - 1, len(run)))
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["n_sites"])
        for r in duplicated_span_removal_plan(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0  # the planted near-dup pairs guarantee spans
    by_doc = defaultdict(list)
    for doc_id, s, e, _n in got:
        assert e - s + 1 >= w
        assert 1 <= s <= e <= len(toks_by_doc[doc_id])
        by_doc[doc_id].append((s, e))
    for spans in by_doc.values():
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 < s2  # maximal: no overlap, no touching runs left


def test_span_removal_under_planted_hot_window(spark, tmp_path):
    """SKEW fixture (VERDICT r10 item 4): one viral boilerplate 5-gram
    planted in 35% of docs — the shape that sends every occurrence of
    that window to ONE task of the first-occurrence sort at scale.
    Pins (a) plan + apply correctness against a pure-Python replay on
    the hot corpus, and (b) the apply-stage query against its own
    DuckDB oracle on the same fixture. The zero-joins window form is
    the documented plan choice (see _removal_spans); this fixture is
    the tripwire that re-opens the min(struct)+skew-join alternative
    if the sort ever binds."""
    import re
    from collections import defaultdict

    import duckdb

    from github_miner_spark.functions.dedup import apply_span_removal
    from github_miner_spark.functions.text import tokenize
    from github_miner_spark.queries.dedup_queries import (
        _removal_spans,
        span_removed_corpus_stats,
    )
    from github_miner_spark.registry import all_specs

    w = 5
    hot = "click here to subscribe now"
    rows = []
    for d in range(40):
        body = " ".join(f"u{d}w{i}" for i in range(12))
        if d % 3 == 0:  # 14/40 docs carry the hot window (35%)
            text = f"{body} {hot} tail{d} extra{d}"
        else:
            text = f"{body} tail{d} extra{d}"
        rows.append((d, f"src{d % 2}", text))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # pure-Python replay: plan
    toks_by_doc = {
        d: [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
        for d, _s, text in rows
    }
    occs = defaultdict(list)
    for d in sorted(toks_by_doc):
        toks = toks_by_doc[d]
        for p in range(len(toks) - w + 1):
            occs[" ".join(toks[p : p + w])].append((d, p + 1))
    sites = defaultdict(list)
    for sites_of_win in occs.values():
        for d, pos in sorted(sites_of_win)[1:]:
            sites[d].append(pos)
    want_spans = []
    for d in sorted(sites):
        run = []
        for pos in sorted(sites[d]):
            if run and pos - run[-1] > w:
                want_spans.append((d, run[0], run[-1] + w - 1))
                run = []
            run.append(pos)
        if run:
            want_spans.append((d, run[0], run[-1] + w - 1))
    got_spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _removal_spans(docs, w=w).collect()
    )
    assert got_spans == sorted(want_spans)
    # the hot window produced a cut in every carrier except the first
    carriers = [d for d in range(40) if d % 3 == 0]
    assert {d for d, _s, _e in got_spans} >= set(carriers[1:])

    # pure-Python replay: apply
    cut = defaultdict(set)
    for d, s, e in want_spans:
        cut[d].update(range(s, e + 1))
    want_kept = {
        d: [t for i, t in enumerate(toks, start=1) if i not in cut[d]]
        for d, toks in toks_by_doc.items()
    }
    t = docs.select("doc_id", "source", tokenize(F.col("text")).alias("toks"))
    got_kept = {
        r["doc_id"]: list(r["kt"])
        for r in apply_span_removal(t, _removal_spans(docs, w=w)).collect()
    }
    assert got_kept == want_kept

    # cross-engine on the hot fixture: the apply-stage query vs oracle
    got_stats = sorted(
        tuple(r) for r in span_removed_corpus_stats(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want_stats = sorted(
        tuple(r) for r in con.sql(all_specs()["span_removed_corpus_stats"].oracle).fetchall()
    )
    assert got_stats == want_stats


def test_item_cooccurrence_drops_malformed_k_identically(spark, tmp_path):
    """Malformed item props must be DROPPED, not crash and not round
    (ADVICE r9 / round-10 review): under the session's ANSI mode a
    bare cast throws on 'abc', and DuckDB's TRY_CAST rounds '12.5' to
    13 while Spark's try_cast nulls it — the shipped integer-literal
    regex gate must behave identically on both engines. Crafted
    events: integral k (kept, incl. negative), decimal / scientific /
    alpha / empty / null k (all dropped). ADVICE r10 classes: k with
    tab/newline padding is KEPT (Spark's try_cast trims all chars
    <= 0x20 — DuckDB's trim() strips only spaces, the oracle must
    replicate the full set), and an over-int64 digit string passes
    the integer-literal regex but must NULL out (Spark try_cast) on
    both engines, never throw (DuckDB plain CAST would)."""
    import datetime
    import json

    import duckdb

    from github_miner_spark.queries.events_queries import item_cooccurrence_topk
    from github_miner_spark.registry import all_specs

    ts = datetime.datetime(2025, 1, 1)
    rows = []
    # three users sharing items 1 and 2 (plus user-specific extras) so
    # the kept pairs produce a non-empty top-k
    for u, ks in [
        (1, ["1", "2", "-3"]),
        (2, ["1", "2", "12.5", "abc"]),
        (3, ["1", "2", "1e3", ""]),
        (4, ["7", None, "00042"]),
        # tab/newline-padded integrals KEPT (full <=0x20 trim);
        # over-int64 literal passes the digit regex but nulls out
        (5, ["\t1", "\n2", " 9223372036854775808 "]),
    ]:
        for i, k in enumerate(ks):
            # json.dumps escapes control chars (\t -> \\t) — the only
            # VALID JSON encoding; both engines decode the escape back
            # to the raw char before the trim-and-cast under test
            props = "{}" if k is None else json.dumps({"k": k})
            rows.append((len(rows), ts, u, "click", 0.0, props))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = item_cooccurrence_topk(spark, str(tmp_path)).collect()
    kept_items = {r["item_a"] for r in got} | {r["item_b"] for r in got}
    # only integral-literal k values survive; '00042' casts to 42
    assert kept_items <= {-3, 1, 2, 7, 42}
    pair_counts = {(r["item_a"], r["item_b"]): r["co_users"] for r in got}
    # co_users = 4 witnesses that user 5's '\t1' / '\n2' were KEPT
    assert pair_counts.get((1, 2)) == 4
    assert all(i not in kept_items for i in (13, 1000, 12,)), kept_items
    assert 9223372036854775807 not in kept_items  # overflow nulls, never throws

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = con.sql(all_specs()["item_cooccurrence_topk"].oracle).fetchall()
    want = sorted(
        (r["item_a"], r["item_b"], r["co_users"], r["cosine"], r["rank"])
        for r in got
    )
    assert want == sorted(tuple(r) for r in oracle)


def test_gopher_repetition_crafted_corpus(spark, tmp_path):
    """gopher_repetition_stats on a crafted corpus that exercises every
    branch the synthetic tables don't: a doc dominated by one repeated
    2-gram (top2 breach), a doc with a duplicated 5-gram run (dup5 >
    0), and a clean doc — engine vs the DuckDB oracle on the same
    parquet AND vs a from-scratch pure-Python reference (tokenize,
    per-n Counter, md5-hash tie-break, micro-unit quantization)."""
    import hashlib
    import math
    import re
    from collections import Counter

    import duckdb

    from github_miner_spark.registry import all_specs

    docs = [
        # one 2-gram "spam ham" repeated -> top2 chars = 14/21 > 0.20
        (1, "srcA", "spam ham spam ham spam ham extra"),
        # a 5-gram repeated twice among 10 5-grams -> dup5 > 0
        (2, "srcA", "a b c d e a b c d e x y z w v u t s q r"),
        # no repetition at all
        (3, "srcB", "alpha beta gamma delta epsilon zeta eta theta"),
        # too short for 5-grams (dup5 = 0 via the empty-gram guard)
        (4, "srcB", "one two three"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["source"]: r.asDict()
        for r in all_specs()["gopher_repetition_stats"]
        .spark(spark, str(tmp_path))
        .collect()
    }

    def h60(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    def py_doc(text):
        toks = [
            t
            for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
            if t
        ]
        tchars = sum(len(t) for t in toks)
        fr = {}
        for n in (2, 3, 4):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if grams and tchars:
                c = Counter(grams)
                nc, _, gc = min((-v, h60(g), len(g) - (n - 1)) for g, v in c.items())
                fr[n] = (-nc) * gc / tchars
            else:
                fr[n] = 0.0
        for n in (5, 6):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if grams:
                c = Counter(grams)
                fr[n] = sum(v for v in c.values() if v > 1) / len(grams)
            else:
                fr[n] = 0.0
        return fr

    per_source: dict[str, list[dict]] = {}
    for _, s, t in docs:
        per_source.setdefault(s, []).append(py_doc(t))
    for s, frs in per_source.items():
        row = got[s]
        assert row["docs"] == len(frs)
        for n, col in ((2, "top2_frac"), (3, "top3_frac"), (4, "top4_frac"),
                       (5, "dup5_frac"), (6, "dup6_frac")):
            want = sum(math.floor(f[n] * 1_000_000 + 0.5) for f in frs) / (
                1_000_000.0 * len(frs)
            )
            assert abs(row[col] - want) < 1e-6, (s, col, row[col], want)
        flagged = sum(
            1
            for f in frs
            if f[2] > 0.20 or f[3] > 0.18 or f[4] > 0.16
            or f[5] > 0.15 or f[6] > 0.14
        )
        assert row["flagged"] == flagged, (s, row["flagged"], flagged)
    # the crafted corpus actually exercises the branches
    assert got["srcA"]["flagged"] >= 1
    assert got["srcA"]["dup5_frac"] > 0.0

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r for r in con.sql(all_specs()["gopher_repetition_stats"].oracle).fetchall()
    }
    for s, row in got.items():
        assert tuple(row.values()) == oracle[s], (s, row, oracle[s])


def test_dsir_weights_python_replay(spark):
    """dsir_importance_weights at sf0.01 (500 docs — the Gumbel top-100
    actually selects) against a from-scratch pure-Python replay of the
    whole DSIR chain: hashed unigram+bigram bucketing, add-one
    smoothed target/raw models, micro-nat-quantized per-bucket
    log-ratios, integer doc weights, md5-uniform Gumbel noise, top-K
    by (score desc, doc_id)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from github_miner_spark.queries.curation_queries import (
        DSIR_BUCKETS,
        DSIR_KEEP_K,
        DSIR_SCALE,
        DSIR_TARGET_SOURCES,
    )
    from github_miner_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    got = {
        r["source"]: r.asDict()
        for r in all_specs()["dsir_importance_weights"].spark(spark, sf).collect()
    }

    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    import re

    def feats(text):
        toks = [
            t
            for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
            if t
        ]
        return toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    occ = []  # (doc_id, source, bucket)
    for _, r in pdf.iterrows():
        for f in feats(r["text"]):
            occ.append((int(r["doc_id"]), r["source"], bucket(f)))
    cr = Counter(b for _, _, b in occ)
    ct = Counter(b for _, s, b in occ if s in DSIR_TARGET_SOURCES)
    r_tot, t_tot = len(occ), sum(1 for _, s, _ in occ if s in DSIR_TARGET_SOURCES)

    def q(x):
        return int(math.floor(x * DSIR_SCALE + 0.5)) if x >= 0 else -int(
            math.floor(-x * DSIR_SCALE + 0.5)
        )

    lq = {
        b: q(
            math.log((ct.get(b, 0) + 1.0) / (t_tot + DSIR_BUCKETS))
            - math.log((c + 1.0) / (r_tot + DSIR_BUCKETS))
        )
        for b, c in cr.items()
    }
    w: dict[int, int] = defaultdict(int)
    src: dict[int, str] = {}
    for d, s, b in occ:
        w[d] += lq[b]
        src[d] = s
    def gum(d):
        u = (int(hashlib.md5(f"dsir:{d}".encode()).hexdigest()[:8], 16) + 1) / 4294967297.0
        return q(-math.log(-math.log(u)))
    s_by_doc = {d: w[d] + gum(d) for d in w}
    kept = set(
        d
        for d, _ in sorted(s_by_doc.items(), key=lambda kv: (-kv[1], kv[0]))[
            :DSIR_KEEP_K
        ]
    )
    per_source: dict[str, list[int]] = defaultdict(list)
    for d in w:
        per_source[src[d]].append(d)
    assert set(got) == set(per_source)
    for s, ds in per_source.items():
        row = got[s]
        assert row["docs"] == len(ds)
        assert row["kept"] == sum(1 for d in ds if d in kept), s
        want_avg = sum(w[d] for d in ds) / (DSIR_SCALE * 1.0 * len(ds))
        want_max = max(w[d] for d in ds) / (DSIR_SCALE * 1.0)
        assert abs(row["avg_weight_nats"] - want_avg) < 1e-6, s
        assert abs(row["max_weight_nats"] - want_max) < 1e-6, s
    # the target stands out: its avg importance weight is the corpus max
    tgt_avg = max(got[s]["avg_weight_nats"] for s in DSIR_TARGET_SOURCES)
    assert tgt_avg >= max(
        v["avg_weight_nats"] for s, v in got.items()
        if s not in DSIR_TARGET_SOURCES
    )


def test_ccnet_buckets_replay_from_scored_docs(spark):
    """ccnet_perplexity_buckets replayed compositionally: take the
    per-doc mean KN surprisal from the already-witnessed
    doc_kneser_ney_scores query, then re-derive the md5-gated sample,
    the fixed-bin histogram, the tercile cutoffs and the bucket
    counts in pure Python — pinning the NEW machinery (binning,
    sampling, cutoff extraction, broadcast bucketing) independently
    of the LM itself."""
    import hashlib
    from collections import Counter, defaultdict

    import pandas as pd

    from github_miner_spark.queries.text_queries import (
        PPL_BIN_MICRO_NATS,
        PPL_N_BINS,
        PPL_SAMPLE_KEEP,
        PPL_SAMPLE_MOD,
    )
    from github_miner_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    scores = {
        r["doc_id"]: r["mean_kn_surprisal"]
        for r in all_specs()["doc_kneser_ney_scores"].spark(spark, sf).collect()
    }
    langs = dict(
        pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "lang"]].values
    )

    def binof(mean6):
        mq = int(round(mean6 * 1_000_000))
        return min(PPL_N_BINS - 1, max(0, mq // PPL_BIN_MICRO_NATS))

    sb = {d: (langs[d], binof(m)) for d, m in scores.items()}
    samp = [
        d
        for d in sb
        if int(hashlib.md5(f"pplq:{d}".encode()).hexdigest()[:8], 16)
        % PPL_SAMPLE_MOD
        < PPL_SAMPLE_KEEP
    ]
    hist = defaultdict(Counter)
    for d in samp:
        lang, b = sb[d]
        hist[lang][b] += 1
    cuts = {}
    for lang, h in hist.items():
        ns = sum(h.values())
        cum = 0
        c1 = c2 = None
        for b in sorted(h):
            cum += h[b]
            if c1 is None and 3 * cum >= ns:
                c1 = b
            if c2 is None and 3 * cum >= 2 * ns:
                c2 = b
        cuts[lang] = (c1, c2)
    want = defaultdict(Counter)
    for d, (lang, b) in sb.items():
        c1, c2 = cuts.get(lang, (PPL_N_BINS - 1, PPL_N_BINS - 1))
        c1 = PPL_N_BINS - 1 if c1 is None else c1
        c2 = PPL_N_BINS - 1 if c2 is None else c2
        want[lang]["head" if b <= c1 else "middle" if b <= c2 else "tail"] += 1

    got = all_specs()["ccnet_perplexity_buckets"].spark(spark, sf).collect()
    for r in got:
        assert want[r["lang"]][r["bucket"]] == r["docs"], r
        lt = sum(want[r["lang"]].values())
        assert abs(r["share"] - r["docs"] / lt) < 1e-6, r
    assert sum(r["docs"] for r in got) == len(scores)


def test_distinct_ngram_diversity_python_replay(spark):
    """distinct_ngram_diversity at sf0.001 vs a from-scratch pure-
    Python reference (tokenize, n-gram sets and occurrence counts per
    source)."""
    import re
    from collections import defaultdict

    import pandas as pd

    from github_miner_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: r.asDict()
        for r in all_specs()["distinct_ngram_diversity"].spark(spark, sf).collect()
    }
    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    occ = defaultdict(lambda: defaultdict(int))
    types = defaultdict(lambda: defaultdict(set))
    for _, r in pdf.iterrows():
        toks = [
            t
            for t in re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).split(" ")
            if t
        ]
        for n in (1, 2, 3):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                occ[r["source"]][n] += 1
                types[r["source"]][n].add(g)
    assert set(got) == set(occ)
    for s, row in got.items():
        assert row["tokens"] == occ[s][1]
        for n, col in ((1, "distinct1_ratio"), (2, "distinct2_ratio"),
                       (3, "distinct3_ratio")):
            assert abs(row[col] - len(types[s][n]) / occ[s][n]) < 1e-6, (s, col)
