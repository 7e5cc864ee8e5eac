"""BPE merge-table store: idempotent rebuild and content-address
invalidation (the walk store's discipline; the from-spec training
replay lives in test_pipeline.py::
test_bpe_vocab_induction_matches_python_reference, which now also
witnesses the store content since bpe_vocab_induction serves from
it)."""

from __future__ import annotations

import os

from github_miner_spark.functions import bpe_store

SF = "/root/testdata/sf0.001"


def test_materialize_idempotent(spark):
    p = bpe_store.materialize_bpe_merges(spark, SF)
    f = os.path.join(p, "merges.parquet")
    mtime = os.stat(f).st_mtime_ns
    assert bpe_store.materialize_bpe_merges(spark, SF) == p
    assert os.stat(f).st_mtime_ns == mtime
    rows = bpe_store.load_bpe_merges(spark, SF).collect()
    assert len(rows) == bpe_store.BPE_MERGE_ROUNDS
    assert sorted(r["step"] for r in rows) == list(
        range(1, bpe_store.BPE_MERGE_ROUNDS + 1)
    )


def test_spec_version_participates_in_address(monkeypatch):
    before = bpe_store._store_dir(SF)
    monkeypatch.setattr(bpe_store, "BPE_SPEC_VERSION", "test-bump")
    assert bpe_store._store_dir(SF) != before


def test_apply_merges_is_greedy_leftmost(spark):
    """The replace-based merge must implement greedy LEFTMOST
    non-overlapping semantics: 'a a a a' under merge (a, a) becomes
    ('a a', 'a a') — positions 1-2 and 3-4 — never the overlapping or
    rightmost readings."""
    df = spark.createDataFrame([(1, "x", "<a><a><a><a>")], "doc_id long, source string, s string")
    out = bpe_store.apply_merges(df, [("a", "a")]).collect()[0]["s"]
    assert out == "<a a><a a>"
