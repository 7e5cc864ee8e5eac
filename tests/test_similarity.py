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
