"""Deduplication operators for LLM-data pipelines (first-class engine
components, per BASELINE.json north star): exact dedup, n-gram Jaccard,
MinHash+LSH, SimHash.

All pure Catalyst expressions + joins (no Python UDFs). The candidate
generation is always index-shaped — explode to an inverted index and
self-join on the index key — never an all-pairs crossJoin, so the same
plans survive 100 TB:

- exact: one groupBy on md5(text).
- n-gram Jaccard: inverted index on shingle hash; candidate pairs are
  bounded by shingle co-occurrence, not n^2.
- MinHash LSH: band signature -> bucket join; only same-bucket pairs
  are verified. Band/row counts tune the recall/cost curve.
- SimHash: byte-banded candidates (a pair within hamming distance d of
  a 32-bit simhash shares a byte when d < 4 bands differ) verified with
  bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from github_miner_spark.functions.text import (
    minhash_signature,
    shingle_hashes,
    token_hashes,
    tokenize,
)


def exact_dup_groups(docs: DataFrame, text_col: str = "text", normalize: bool = False) -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, n_docs, keep_id) for every
    duplicate group; keep_id = min doc_id (first-writer-wins, the
    reference's membership-gate semantics set-at-a-time)."""
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), "\\s+", " "))
    return (
        docs.select(F.md5(t).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def shingle_index(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Inverted index (doc_id, shingle) over distinct hashed word
    n-grams."""
    return docs.select(
        "doc_id", F.explode(shingle_hashes(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold.

    Candidates come from the inverted shingle index (pairs sharing at
    least one shingle); |A ∩ B| falls out of the index join, |A ∪ B|
    from the per-doc shingle counts. Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b, jaccard rounded to 6dp for cross-engine
    stability."""
    idx = shingle_index(docs, text_col, n)
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup detection: k-perm signatures, banded into
    ``bands`` buckets of k/bands rows; same-bucket pairs are verified
    with exact Jaccard >= threshold. Returns (doc_a, doc_b, jaccard).

    This is the scale path for n-gram dedup: candidate count is driven
    by bucket collisions (tunable via bands), not shingle co-occurrence."""
    rows_per_band = k // bands
    sig = docs.select(
        "doc_id", minhash_signature(shingle_hashes(F.col(text_col)), k).alias("sig")
    )
    band_rows = []
    for bi in range(bands):
        band_rows.append(
            sig.select(
                "doc_id",
                F.lit(bi).alias("band"),
                F.md5(
                    F.concat_ws(",", *[
                        F.element_at("sig", bi * rows_per_band + j + 1).cast("string")
                        for j in range(rows_per_band)
                    ])
                ).alias("bucket"),
            )
        )
    buckets = band_rows[0]
    for br in band_rows[1:]:
        buckets = buckets.unionByName(br)
    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = jaccard_pairs(docs, text_col, threshold=threshold)
    return candidates.join(verified, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard")


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """32-bit SimHash over token hashes (with multiplicity): bit b is
    set when sum over tokens of ±1 (by bit b of the token hash) is
    positive. Returns (doc_id, simhash)."""
    hashes = token_hashes(tokenize(F.col(text_col)))

    def bit_term(b: int):
        bitsum = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, b) % 2) * 2 - 1,
        )
        return F.when(bitsum > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))

    terms = [bit_term(b) for b in range(bits)]
    sh = terms[0]
    for t in terms[1:]:
        sh = sh + t
    return docs.select("doc_id", sh.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs: byte-banded candidates (4 bands of 8
    bits; hamming <= 7 guarantees >= 1 identical band... pigeonhole at
    max_hamming <= 3 bands' worth) verified by bit_count(xor) <=
    max_hamming. Returns (doc_a, doc_b, hamming)."""
    sh = simhash(docs, text_col)
    bands = []
    for k in range(4):
        bands.append(
            sh.select(
                "doc_id",
                F.lit(k).alias("band"),
                (F.shiftright(F.col("simhash"), 8 * k) % 256).alias("bucket"),
            )
        )
    idx = bands[0]
    for br in bands[1:]:
        idx = idx.unionByName(br)
    a = idx.alias("a")
    b = idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
