"""Contracts for the similarity operators that have no SQL oracle:
LSH top-k must return correctly-scored results that are a subset of the
brute-force candidate set, with usable recall on same-bucket vectors;
numpy is the independent scorer."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from github_miner_spark.functions.similarity import brute_force_topk, lsh_topk
from github_miner_spark.io.tables import load_table

SF = "/root/testdata/sf0.001"
PROBES = [0, 1, 2, 3, 4]


def _double_emb(spark):
    return load_table(spark, "embeddings", SF).withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


def test_bruteforce_matches_numpy(spark):
    emb = _double_emb(spark)
    got = brute_force_topk(emb, [0], k=3).collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    q = vecs[0]
    scores = {
        vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for vid, v in vecs.items()
        if vid != 0
    }
    want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]
    assert [(r.neighbor_id, r.score) for r in got] == [
        (vid, round(s, 6)) for vid, s in want
    ]


def test_lsh_subset_of_bruteforce_scores(spark):
    emb = _double_emb(spark)
    bf = {
        (r.query_id, r.neighbor_id): r.score
        for r in brute_force_topk(emb, PROBES, k=10**6).collect()
    }
    lsh = lsh_topk(emb, PROBES, k=5, n_planes=4, dims=64).collect()
    assert len(lsh) > 0
    for r in lsh:
        # same scoring function: every LSH hit carries the exact score
        assert bf[(r.query_id, r.neighbor_id)] == r.score


def test_lsh_bucket_determinism(spark):
    emb = _double_emb(spark)
    a = [(r.query_id, r.neighbor_id, r.score) for r in lsh_topk(emb, PROBES, k=5).collect()]
    b = [(r.query_id, r.neighbor_id, r.score) for r in lsh_topk(emb, PROBES, k=5).collect()]
    assert a == b


def test_resize_media_budget_and_determinism(spark):
    from github_miner_spark.functions.multimodal import documents_as_media, resize_media
    from github_miner_spark.io.tables import load_table

    media = documents_as_media(load_table(spark, "documents", "/root/testdata/sf0.001"))
    out = resize_media(media, target_bytes=64)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r["thumb_bytes"] <= 64 for r in rows)
    assert all(len(r["thumb"]) == r["thumb_bytes"] for r in rows)
    again = {r["doc_id"]: bytes(r["thumb"]) for r in resize_media(media, 64).collect()}
    assert all(bytes(r["thumb"]) == again[r["doc_id"]] for r in rows)


def test_sample_frames_explode_shape(spark):
    from github_miner_spark.functions.multimodal import documents_as_media, sample_frames
    from github_miner_spark.io.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    media = documents_as_media(docs)
    frames = sample_frames(media, frame_bytes=32, every_kth=4)
    per_doc = {r["doc_id"]: r["cnt"] for r in
               frames.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    sizes = {r["doc_id"]: r["n_bytes"] for r in media.collect()}
    import math
    for doc_id, n in sizes.items():
        n_frames = max(1, math.ceil(n / 32))
        assert per_doc[doc_id] == math.ceil(n_frames / 4)
    # every sampled index is a multiple of k
    assert frames.filter(F.col("frame_idx") % 4 != 0).isEmpty()


def test_adaptive_n_planes_growth():
    from github_miner_spark.functions.similarity import adaptive_n_planes

    # floor of 4 planes at small corpora (keeps sf0.01/0.1 output stable)
    assert adaptive_n_planes(500) == 4
    assert adaptive_n_planes(4096) == 4
    # grows with log2(n): occupancy target 256 per bucket
    assert adaptive_n_planes(1_000_000) == 12
    assert adaptive_n_planes(1_000_000_000) == 22
    # monotone non-decreasing
    prev = 0
    for n in (10, 10**3, 10**5, 10**7, 10**9, 10**11):
        p = adaptive_n_planes(n)
        assert p >= prev
        prev = p


def test_cosine_dups_candidates_far_below_all_pairs(spark):
    """The LSH bucketing must keep same-bucket candidate pairs well
    under all-pairs n(n-1)/2 — the round-1 scale finding."""
    from github_miner_spark.functions.similarity import adaptive_n_planes, lsh_bucket
    from github_miner_spark.io.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("ev"),
    )
    n = emb.count()
    p = adaptive_n_planes(n)
    occ = (
        emb.select(lsh_bucket(F.col("ev"), n_planes=p, dims=64).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("sz"))
    )
    candidates = occ.agg(
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("c")
    ).collect()[0]["c"]
    all_pairs = n * (n - 1) / 2
    assert candidates < all_pairs / 8, (candidates, all_pairs)


def test_ivf_subset_of_bruteforce_scores(spark):
    """IVF results must carry the same (rounded) scores brute force
    assigns, and probe-3-of-sqrt(n) lists must keep top-1 recall high
    on the fixture corpus."""
    from github_miner_spark.functions.similarity import brute_force_topk, ivf_topk
    from github_miner_spark.io.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    probes = [0, 1, 2, 3, 4]
    bf = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in brute_force_topk(emb, probes, k=50).collect()
    }
    ivf = ivf_topk(emb, probes, k=5, n_probe=3).collect()
    assert len(ivf) > 0
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:  # scores must agree exactly where both rank the pair
            assert bf[key] == r["score"], key
    # per-query: at least some neighbors returned for every probe
    per_q = {q: sum(1 for r in ivf if r["query_id"] == q) for q in probes}
    assert all(v >= 1 for v in per_q.values()), per_q


def test_ivf_store_matches_direct_and_plan_is_partial_agg(spark, tmp_path, monkeypatch):
    """VERDICT r2 item 2: (a) the store-served IVF top-k returns exactly
    what the direct computation returns; (b) the list assignment is a
    partial-combinable aggregate, not a row_number window over the
    n x sqrt(n) scored table (the flagged scale hazard)."""
    import github_miner_spark.functions.ivf_store as ivf_store
    from github_miner_spark.functions.similarity import assign_lists, ivf_topk
    from github_miner_spark.io.tables import load_table
    from pyspark.sql import functions as F

    monkeypatch.setattr(ivf_store, "STORE_ROOT", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf).withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    probes = [0, 1, 2]
    direct = sorted(map(tuple, ivf_topk(emb, probes, k=5, n_probe=3).collect()))
    stored = sorted(
        map(tuple, ivf_store.ivf_topk_from_store(spark, sf, probes, k=5, n_probe=3).collect())
    )
    assert direct == stored and len(direct) > 0

    # second call must hit the store (no rebuild): drop the tmp build
    # marker by asserting the dir exists and the call still answers
    assert ivf_store.materialize_ivf_index(spark, sf) == ivf_store._store_dir(sf)

    cents = emb.limit(4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    plan = assign_lists(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan or "ObjectHashAggregate" in plan, plan


def test_lsh_multiprobe_recall_at_adaptive_planes(spark):
    """VERDICT r2 item 3: recall vs brute force must hold at the plane
    count adaptive_n_planes actually picks for the corpus (not a fixed
    4), at the default amplification (2 tables x Hamming-2 probing).
    Candidate growth stays ~linear: n_tables * (1 + B + B(B-1)/2)
    buckets of expected size n/2^B."""
    from github_miner_spark.functions.similarity import (
        adaptive_n_planes,
        brute_force_topk,
        lsh_topk,
    )
    from github_miner_spark.io.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.1").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    n = emb.count()
    planes = adaptive_n_planes(n)
    probes = list(range(10))
    k = 5
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, probes, k=k).collect()
    }
    mp = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, probes, k=k, n_planes=planes).collect()
    }
    recall = len(bf & mp) / len(bf)
    assert recall >= 0.8, f"amplified recall {recall:.2f} at {planes} planes"
    # amplification must dominate single-table single-bucket probing
    sp = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(
            emb, probes, k=k, n_planes=planes, n_tables=1, probe_hamming=0
        ).collect()
    }
    assert len(bf & mp) >= len(bf & sp)


def test_int8_topk_recall_and_score_error(spark):
    """Quantized ranking must agree with the float baseline on nearly
    every neighbor (recall >= 0.9 over the 5 probes at k=5) and the
    quantized cosine must sit within 5e-3 of the float cosine — the
    quantization-noise contract that makes int8 a safe 4x memory cut."""
    from github_miner_spark.functions.similarity import int8_topk

    emb = _double_emb(spark)
    bf = brute_force_topk(emb, PROBES, k=5).collect()
    q8 = int8_topk(emb, PROBES, k=5).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    q8_sets = {}
    for r in q8:
        q8_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf_sets[q] & q8_sets[q]) for q in bf_sets)
    total = sum(len(s) for s in bf_sets.values())
    assert hits / total >= 0.9, f"int8 recall {hits}/{total}"

    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in brute_force_topk(emb, PROBES, k=10**6).collect()
    }
    for r in q8:
        assert abs(exact[(r.query_id, r.neighbor_id)] - r.qscore) < 5e-3


def test_int8_store_matches_inline_and_codes_are_tinyint(spark, tmp_path, monkeypatch):
    """ADVICE r3 (medium): the quantized representation must actually be
    persisted in a compact type — (a) the store-served top-k returns
    exactly what the inline-quantizing path returns, (b) the at-rest
    codes column is array<tinyint> (1 byte/element, the real 4x cut vs
    float32), and (c) a second call reuses the store."""
    import github_miner_spark.functions.int8_store as int8_store
    from github_miner_spark.functions.similarity import int8_topk

    monkeypatch.setattr(int8_store, "STORE_ROOT", str(tmp_path))
    emb = _double_emb(spark)
    inline = sorted(map(tuple, int8_topk(emb, PROBES, k=5).collect()))
    stored = sorted(
        map(tuple, int8_store.int8_topk_from_store(spark, SF, PROBES, k=5).collect())
    )
    assert inline == stored and len(inline) > 0

    coded = int8_store.load_int8_codes(spark, SF)
    assert dict(coded.dtypes)["codes"] == "array<tinyint>"
    assert int8_store.materialize_int8_codes(spark, SF) == int8_store._store_dir(SF)


def test_int8_zero_vector_scores_zero_not_nan(spark):
    """ADVICE r3 (low): an all-zero embedding quantizes to all-zero
    codes (norm 0); the guarded denominator must score it ~0 — never
    NaN, which Spark would sort ABOVE every double in DESC order,
    ranking the zero vector as everyone's top neighbor."""
    import math

    from github_miner_spark.functions.similarity import int8_topk

    base = _double_emb(spark).select("vec_id", "embedding").limit(4)
    dim = len(base.first().embedding)
    zero_row = spark.createDataFrame(
        [(99999, [0.0] * dim)], "vec_id: long, embedding: array<double>"
    )
    rows = int8_topk(base.union(zero_row), [0], k=10**6).collect()
    by_neighbor = {r.neighbor_id: r for r in rows}
    z = by_neighbor[99999]
    assert not math.isnan(z.qscore) and abs(z.qscore) < 1e-6
    # score-0 must sort below every positively-scored neighbor (NaN
    # would sort above ALL of them and take rank 1)
    assert all(r.rank < z.rank for r in rows if r.qscore > 0)
    assert z.rank > 1


def test_ivf_int8_scores_agree_with_int8_bruteforce(spark, tmp_path, monkeypatch):
    """The IVF-over-int8 path must score every returned neighbor
    identically to the quantized brute-force path (same codes, same
    guarded division) — IVF only restricts the candidate set."""
    import github_miner_spark.functions.int8_store as int8_store
    import github_miner_spark.functions.ivf_store as ivf_store

    monkeypatch.setattr(int8_store, "STORE_ROOT", str(tmp_path / "int8"))
    monkeypatch.setattr(ivf_store, "STORE_ROOT", str(tmp_path / "ivf"))
    got = ivf_store.ivf_int8_topk_from_store(spark, SF, PROBES, k=5, n_probe=3).collect()
    assert len(got) > 0
    emb = _double_emb(spark)
    from github_miner_spark.functions.similarity import int8_topk

    exact = {
        (r.query_id, r.neighbor_id): r.qscore
        for r in int8_topk(emb, PROBES, k=10**6).collect()
    }
    for r in got:
        assert exact[(r.query_id, r.neighbor_id)] == r.qscore


def test_lloyd_refined_ivf_objective_and_recall(spark):
    """The k-means contract: one Lloyd iteration must IMPROVE the
    quantization objective (mean assignment cosine — means point closer
    to their members than arbitrary corpus seeds), must actually move
    the centroids, and must not catastrophically regress search recall
    at the same probe budget (on clusterless uniform data a single
    step may trade ±1 neighbor, so the recall bound is a tolerance,
    not monotonicity)."""
    import os

    from pyspark.sql import functions as F

    from github_miner_spark.functions.ivf_store import (
        ivf_lloyd_topk_from_store,
        ivf_topk_from_store,
        materialize_ivf_lloyd_index,
    )
    from github_miner_spark.functions.similarity import brute_force_topk
    from github_miner_spark.io.tables import load_table

    sf = "/root/testdata/sf0.01"
    probes = list(range(10))
    k = 5
    emb = load_table(spark, "embeddings", sf).withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, probes, k=k).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_from_store(spark, sf, probes, k=k, n_probe=3).collect()
    }
    refined = {
        (r.query_id, r.neighbor_id)
        for r in ivf_lloyd_topk_from_store(spark, sf, probes, k=k, n_probe=3).collect()
    }
    assert len(bf & refined) >= len(bf & plain) - 3

    base = materialize_ivf_lloyd_index(spark, sf, n_iter=1)
    seeds = spark.read.parquet(os.path.join(base, "centroids.parquet"))
    moved = spark.read.parquet(os.path.join(base, "lloyd1", "centroids.parquet"))
    assert moved.count() > 0
    joined = seeds.join(
        moved.withColumnRenamed("cvec", "mvec"), "cid"
    ).filter(F.col("cvec") != F.col("mvec"))
    assert joined.count() > 0

    # quantization objective: mean cosine(vector, its centroid)
    from github_miner_spark.functions.similarity import cosine

    def objective(cent_file: str, assign_file: str) -> float:
        cents = spark.read.parquet(os.path.join(base, cent_file))
        asg = spark.read.parquet(os.path.join(base, assign_file))
        return (
            asg.join(cents.withColumnRenamed("cid", "list_id"), "list_id")
            .agg(F.avg(cosine(F.col("embedding"), F.col("cvec"))).alias("o"))
            .collect()[0]["o"]
        )

    before = objective("centroids.parquet", "assignment.parquet")
    after = objective(os.path.join("lloyd1", "centroids.parquet"), os.path.join("lloyd1", "assignment.parquet"))
    assert after > before, (before, after)


def test_pq_store_codes_compact_and_reused(spark, tmp_path, monkeypatch):
    """(a) at-rest PQ codes are tinyint (j, cid both fit a byte), (b)
    the second materialize call reuses the store, (c) every persisted
    code is the TRUE per-subspace squared-L2 argmin vs an independent
    numpy recomputation (encoding exactness, not just plausibility)."""
    import numpy as np

    import github_miner_spark.functions.pq_store as pq_store

    monkeypatch.setattr(pq_store, "STORE_ROOT", str(tmp_path))
    codes, codebook = pq_store.load_pq_codes(spark, SF)
    dt = dict(codes.dtypes)
    assert dt["j"] == "tinyint" and dt["cid"] == "tinyint"
    assert pq_store.materialize_pq_codes(spark, SF) == pq_store._store_dir(SF)

    cb = {
        (r["j"], r["cid"]): np.array(r["cvec"])
        for r in codebook.collect()
    }
    ksub = max(c for _, c in cb) + 1
    emb = {r["vec_id"]: np.array(r["nv"]) for r in pq_store._normalized(
        __import__("github_miner_spark.io.tables", fromlist=["load_table"]).load_table(
            spark, "embeddings", SF
        )
    ).collect()}
    got = {(r["vec_id"], r["j"]): r["cid"] for r in codes.collect()}
    assert len(got) == len(emb) * pq_store.M_SUB
    for (vid, j), cid in list(got.items())[:200]:
        sv = emb[vid][j * pq_store.D_SUB : (j + 1) * pq_store.D_SUB]
        dists = [float(((sv - cb[(j, c)]) ** 2).sum()) for c in range(ksub)]
        assert dists[cid] == min(dists), (vid, j)


def test_pq_adc_score_is_reconstruction_dot(spark, tmp_path, monkeypatch):
    """The ADC score of (query, vector) must equal the dot product of
    the normalized query with the vector's PQ RECONSTRUCTION (codebook
    entries concatenated) — the defining identity of asymmetric
    distance computation."""
    import numpy as np

    import github_miner_spark.functions.pq_store as pq_store

    monkeypatch.setattr(pq_store, "STORE_ROOT", str(tmp_path))
    topk = pq_store.pq_topk_from_store(spark, SF, PROBES, k=5).collect()
    assert len(topk) > 0
    codes, codebook = pq_store.load_pq_codes(spark, SF)
    cb = {(r["j"], r["cid"]): np.array(r["cvec"]) for r in codebook.collect()}
    code_map = {}
    for r in codes.collect():
        code_map.setdefault(r["vec_id"], {})[r["j"]] = r["cid"]
    from github_miner_spark.io.tables import load_table

    emb = {
        r["vec_id"]: np.array(r["nv"])
        for r in pq_store._normalized(load_table(spark, "embeddings", SF)).collect()
    }
    for row in topk:
        recon = np.concatenate(
            [cb[(j, code_map[row["neighbor_id"]][j])] for j in range(pq_store.M_SUB)]
        )
        want = float(emb[row["query_id"]] @ recon)
        assert abs(row["score"] - round(want, 6)) <= 2e-6, row


def test_ivfpq_store_layout_reuse_and_adc_identity(spark, tmp_path, monkeypatch):
    """IVFADC contracts: (a) at-rest codes are tinyint and carry their
    list_id (the probe-pruning key), (b) the second materialize reuses
    the store, (c) every vector's list is the TRUE rounded-dot argmax
    vs the centroid set, and (d) the ADC score of each returned
    (query, neighbor) equals dot(q, c + r_hat) — the defining IVFADC
    identity: centroid dot plus the residual reconstruction dot."""
    import github_miner_spark.functions.ivfpq_store as ivfpq_store

    monkeypatch.setattr(ivfpq_store, "STORE_ROOT", str(tmp_path))
    topk = ivfpq_store.ivfpq_topk_from_store(spark, SF, PROBES, k=5, n_probe=3).collect()
    assert len(topk) > 0
    codes, cents, rcb = ivfpq_store.load_ivfpq_index(spark, SF)
    dt = dict(codes.dtypes)
    assert dt["j"] == "tinyint" and dt["cid"] == "tinyint"
    assert "list_id" in codes.columns
    assert ivfpq_store.materialize_ivfpq_index(spark, SF) == ivfpq_store._store_dir(SF)

    from github_miner_spark.functions.pq_store import _normalized

    emb = {
        r["vec_id"]: np.array(r["nv"])
        for r in _normalized(load_table(spark, "embeddings", SF)).collect()
    }
    cvecs = {r["cid"]: np.array(r["cvec"]) for r in cents.collect()}
    cb = {(r["j"], r["cid"]): np.array(r["cvec"]) for r in rcb.collect()}
    assignment = {}
    code_map = {}
    for r in codes.collect():
        assignment[r["vec_id"]] = r["list_id"]
        code_map.setdefault(r["vec_id"], {})[r["j"]] = r["cid"]
    # (c) assignment is the rounded-dot argmax, ties to lowest cid
    for vid in list(assignment)[:100]:
        want = min(
            ((-round(float(emb[vid] @ cv), 6), cid) for cid, cv in cvecs.items())
        )[1]
        assert assignment[vid] == want, vid
    # (d) score == dot(q, centroid) + dot(q_sub, residual codewords)
    for row in topk:
        nid = row["neighbor_id"]
        q = emb[row["query_id"]]
        recon = cvecs[assignment[nid]] + np.concatenate(
            [cb[(j, code_map[nid][j])] for j in range(ivfpq_store.M_SUB)]
        )
        want = float(q @ recon)
        assert abs(row["score"] - round(want, 6)) <= 2e-6, row
        # every returned neighbor sits in a probed list
        probe_lists = sorted(
            cvecs, key=lambda cid: (-round(float(q @ cvecs[cid]), 6), cid)
        )[:3]
        assert assignment[nid] in probe_lists, row


# ---------------------------------------------------------------------------
# clustered evaluation corpus (queries/clustered_eval.py)
# ---------------------------------------------------------------------------


def test_clustered_corpus_from_spec_replay(spark):
    """FROM-SPEC numpy replay of the clustered evaluation corpus:
    md5-seeded cluster assignment, md5-derived per-cluster offsets,
    0.5-amplitude shift, renormalization — every vector must match
    the engine's derivation to double precision, and every cluster
    must be non-empty (the corpus is genuinely mixture-shaped)."""
    import hashlib

    from github_miner_spark.queries.clustered_eval import CLU_NC, _cnv

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in _double_emb(spark).collect()
    }
    offs = {
        c: np.array(
            [(h32(f"off{c}_{i}") % 2001 - 1000) / 1000.0 for i in range(1, 65)]
        )
        for c in range(CLU_NC)
    }
    got = {r.vec_id: (r.c, np.array(r.nv)) for r in _cnv(spark, SF).collect()}
    assert set(got) == set(emb)
    seen_clusters = set()
    for vid, ev in emb.items():
        c = h32(f"clu{vid}") % CLU_NC
        seen_clusters.add(c)
        sv = ev + 0.5 * offs[c]
        nv = sv / np.sqrt((sv * sv).sum())
        gc, gnv = got[vid]
        assert gc == c, vid
        assert np.abs(gnv - nv).max() < 1e-9, vid
    assert seen_clusters == set(range(CLU_NC))


def test_clustered_permutation_bijection_and_balance(spark):
    """The OPQ permutation must be a true component bijection (every
    permuted vector holds exactly the original multiset of values)
    and must BALANCE per-subspace variance: the max/min spread of
    summed per-dim variances across the 4 subspaces must shrink vs
    the contiguous slicing flat PQ uses."""
    from github_miner_spark.queries.clustered_eval import _clu_permuted, _cnv

    cnv = _cnv(spark, SF)
    orig = {r.vec_id: sorted(r.nv) for r in cnv.collect()}
    perm = {r.vec_id: r.nv for r in _clu_permuted(cnv).collect()}
    assert set(perm) == set(orig)
    for vid, nv in perm.items():
        assert sorted(nv) == orig[vid], vid
    X = np.array([r for _v, r in sorted(perm.items())])
    O = np.array(
        [r.nv for r in cnv.orderBy("vec_id").collect()], dtype=np.float64
    )
    def spread(M):
        sub = [M[:, j * 16 : (j + 1) * 16].var(axis=0).sum() for j in range(4)]
        return max(sub) - min(sub)
    assert spread(X) < spread(O)


def test_clustered_ladder_separation(spark):
    """The regime pins VERDICT r9 item 2 asked for: on the clustered
    corpus the ladder separates — IVF and the exact re-rank recover
    nearly everything, flat PQ sits on the codebook floor, and the
    permutation-form OPQ allocation strictly beats flat PQ (the
    reversal of the isotropic-corpus rejection; both measurements
    recorded in PERF.md)."""
    from github_miner_spark import registry

    specs = registry.all_specs()

    # sf0.01, not the smoke SF: the r10 separations were MEASURED at
    # the driver's correctness scale (ivfpq 0.20 > pq 0.08 there; at
    # sf0.001 the 200-vector corpus is too small for residual coding
    # to pay and the two rungs invert — a fixture artifact, not a
    # store property)
    sf = "/root/testdata/sf0.01"

    def mean_recall(name: str) -> float:
        rows = specs[name].spark(spark, sf).collect()
        return sum(r.recall_at_5 for r in rows) / len(rows)

    pq = mean_recall("clustered_pq_recall_at_k")
    opq = mean_recall("clustered_opq_recall_at_k")
    ivf = mean_recall("clustered_ivf_recall_at_k")
    rerank = mean_recall("clustered_pq_rerank_recall_at_k")
    ivfpq = mean_recall("clustered_ivfpq_recall_at_k")
    lsh = mean_recall("clustered_lsh_recall_at_k")
    # r10-measured contracts (VERDICT r10 item 6): ivf 1.00, rerank
    # 0.96, lsh 0.28, ivfpq 0.20, opq 0.16, pq 0.08 — a store change
    # that collapses the ladder fails HERE, not at the driver window
    assert ivf >= 0.9, ivf  # cluster-aligned lists recover the cluster
    assert rerank >= 0.9, rerank
    assert rerank > max(pq, opq, ivfpq), (rerank, pq, opq, ivfpq)
    assert ivfpq > pq, (ivfpq, pq)  # residual coding beats flat PQ here
    assert opq > pq, (opq, pq)  # the adopted re-adjudication claim
    assert pq <= 0.3, pq  # the codebook-budget floor stays a floor
    assert 0.0 < lsh < 1.0, lsh  # bucket-only: selective, not exhaustive


def test_pq_adc_integer_quantization_exact_replay(spark, tmp_path, monkeypatch):
    """FROM-SPEC replay of the ADVICE-r9 integer ADC convention: the
    returned PQ score must equal round(sum_j round(pdot_j * 1e9) /
    1e9, 6) EXACTLY (not within tolerance) — the partial dots
    quantized to BIGINT before the order-sensitive sum, ranking done
    on the integer sum. numpy recomputes the quantized scores from
    the store's own codebook and codes."""
    import github_miner_spark.functions.pq_store as pq_store

    monkeypatch.setattr(pq_store, "STORE_ROOT", str(tmp_path))
    topk = pq_store.pq_topk_from_store(spark, SF, PROBES, k=5).collect()
    assert topk
    codes, codebook = pq_store.load_pq_codes(spark, SF)
    cb = {(r["j"], r["cid"]): np.array(r["cvec"]) for r in codebook.collect()}
    code_map: dict = {}
    for r in codes.collect():
        code_map.setdefault(r["vec_id"], {})[r["j"]] = r["cid"]
    emb = {
        r["vec_id"]: np.array(r["nv"])
        for r in pq_store._normalized(load_table(spark, "embeddings", SF)).collect()
    }
    S = pq_store.ADC_SCALE
    for row in topk:
        q = emb[row["query_id"]]
        score_q = sum(
            int(np.round(
                float(q[j * pq_store.D_SUB : (j + 1) * pq_store.D_SUB]
                      @ cb[(j, code_map[row["neighbor_id"]][j])]) * S
            ))
            for j in range(pq_store.M_SUB)
        )
        assert row["score"] == round(score_q / S, 6), row


def test_ivf_delta_append_equals_one_shot_assignment(spark):
    """VERDICT r11 item 3's equivalence pin: with a frozen quantizer
    the assignment is per-row independent, so base-assignment UNION
    delta-append must equal assigning the whole corpus in one shot
    against the same centroids — delta maintenance loses nothing."""
    import os

    from pyspark.sql import functions as F

    from github_miner_spark.functions.ivf_store import (
        load_incremental_ivf_index,
        materialize_incremental_ivf_base,
    )
    from github_miner_spark.functions.similarity import assign_lists
    from github_miner_spark.io.tables import load_table

    sf = "/root/testdata/sf0.001"
    asg, cents = load_incremental_ivf_index(spark, sf)
    emb = load_table(spark, "embeddings", sf).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    want = assign_lists(emb, cents)
    got_rows = sorted(
        (r["vec_id"], r["list_id"]) for r in asg.select("vec_id", "list_id").collect()
    )
    want_rows = sorted(
        (r["vec_id"], r["list_id"])
        for r in want.select("vec_id", "list_id").collect()
    )
    assert got_rows == want_rows
    # every corpus row present exactly once; the delta side is the
    # vec_id % 10 == 9 batch and only that
    assert len(got_rows) == emb.count()
    base = materialize_incremental_ivf_base(spark, sf)
    delta = spark.read.parquet(
        os.path.join(base, "incr_delta", "delta_assignment.parquet")
    )
    delta_ids = [r["vec_id"] for r in delta.select("vec_id").collect()]
    assert delta_ids and all(v % 10 == 9 for v in delta_ids)


def test_ivf_delta_job_scans_only_delta(spark):
    """The delta job's plan reads ONE embeddings scan filtered to the
    delta predicate plus the frozen centroid parquet — never the base
    assignment (no full-corpus reassignment, no index rewrite)."""
    import contextlib
    import io
    import re

    from github_miner_spark.functions.ivf_store import delta_assignment_frame

    df = delta_assignment_frame(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "base_assignment" not in plan
    assert "delta_assignment" not in plan  # input is the raw corpus scan
    # the delta predicate gates the embeddings scan
    assert re.search(r"\(vec_id#\d+L? % 10\) = 9", plan), plan
    # centroids come from the store and ride a broadcast
    assert "centroids.parquet" in plan and "BroadcastExchange" in plan
    # exactly one embeddings scan feeds the job
    assert len(re.findall(r"embeddings\.parquet", plan)) == 1, plan


def test_bitext_margin_numpy_replay_crafted(spark, tmp_path):
    """bitext_mining_margin_topk on a crafted two-language corpus:
    a planted near-copy translation pair, a 'hub' target vector that
    is moderately close to EVERY source doc, and filler vectors —
    engine output vs a from-scratch numpy replay of the whole chain
    (stride centroids, rounded-cos/cid-tiebreak assignment, in-list
    pairs, micro-unit shift-quantization, per-side kNN means, ratio
    margins). Also pins the paper's point: the planted pair tops the
    margin ranking while the hub's neighbourhood mean is the largest
    in Y (the quantity that demotes hub pairs)."""
    import math

    import numpy as np

    from github_miner_spark.queries.similarity_queries import (
        BITEXT_KNN_K,
        BITEXT_SRC_LANG,
        BITEXT_TGT_LANG,
    )
    from github_miner_spark.registry import all_specs

    dims = 8
    rng = np.random.RandomState(42)
    base = np.zeros(dims); base[0] = 1.0
    vecs = {}
    # sources (en): ids 0..7 — base direction plus distinct tilts.
    # The planted side of the pair is x1, a NON-centroid id (ids 0, 4,
    # 8, 12 are the stride centroids; a centroid is always its own
    # nearest list, which would strand the pair across two lists).
    for i in range(8):
        v = base.copy()
        v[1 + (i % 7)] += 0.3
        v += 0.02 * rng.randn(dims)
        vecs[i] = v
    # targets (zh): 9 = hub (close to the shared base direction, so
    # close to ALL en docs), 10 = near-copy of source 1 (the planted
    # translation, both non-centroids), rest = base-plus-noise filler
    hub = base.copy(); hub[7] += 0.3
    vecs[9] = hub
    for i in (8, 11, 12, 13, 14, 15):
        vecs[i] = base + 0.3 * rng.randn(dims)
    vecs[10] = 0.97 * vecs[1] + 0.01 * rng.randn(dims)

    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(16)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    docs = spark.createDataFrame(
        [
            (i, f"doc {i}", BITEXT_SRC_LANG if i < 8 else BITEXT_TGT_LANG,
             "srcA", 5)
            for i in range(16)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = [
        (r["x_id"], r["y_id"], r["cos_sim"], r["margin"])
        for r in all_specs()["bitext_mining_margin_topk"]
        .spark(spark, str(tmp_path))
        .collect()
    ]

    # ---- numpy replay (float32 at rest, double in the algebra, the
    # engine's cast chain) ------------------------------------------
    V = {i: np.asarray(vecs[i], dtype=np.float32).astype(np.float64)
         for i in range(16)}

    def rcos(a, b):
        return round(float(np.dot(a, b) / (math.sqrt(float(np.dot(a, a)))
                                           * math.sqrt(float(np.dot(b, b))))), 6)

    n = 16
    stride = math.ceil(n / math.isqrt(n))
    cent_ids = [i for i in range(n) if i % stride == 0]
    assign = {
        i: min(cent_ids, key=lambda c: (-rcos(V[i], V[c]), c)) for i in range(n)
    }
    cand = {}
    for xi in range(8):
        for yi in range(8, 16):
            if assign[xi] == assign[yi]:
                c = rcos(V[xi], V[yi])
                cand[(xi, yi)] = (c, int(math.floor((1.0 + c) * 1_000_000 + 0.5)))
    def knn_mean(side_id, axis):
        ss = sorted(
            ((smu, other) for (xi, yi), (_, smu) in cand.items()
             for other in [yi if axis == 0 else xi]
             if (xi if axis == 0 else yi) == side_id),
            key=lambda t: (-t[0], t[1]),
        )[:BITEXT_KNN_K]
        return sum(s for s, _ in ss) / len(ss)
    want = sorted(
        (
            (xi, yi, c,
             round(smu * 2.0 / (knn_mean(xi, 0) + knn_mean(yi, 1)), 6))
            for (xi, yi), (c, smu) in cand.items()
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:20]
    assert got == want, (got[:5], want[:5])
    # the planted translation wins the margin ranking...
    assert got[0][0] == 1 and got[0][1] == 10
    # ...and the hub has the largest target-side neighbourhood mean —
    # the denominator that demotes its pairs
    hub_mean = knn_mean(9, 1)
    assert hub_mean == max(knn_mean(y, 1) for y in range(8, 16)
                           if any(yi == y for _, yi in cand))
