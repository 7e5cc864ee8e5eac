"""Chunk-level retrieval — the end-to-end RAG composition query.

The pipeline family already had both halves: ``doc_chunk_plan``
(curation_queries.py — 32-token chunks, 8-token overlap) and the
materialized IVF index over the embeddings corpus
(functions/ivf_store.py). This module composes them: chunk a query
document, embed each chunk with a deterministic hashing-trick encoder
(64-dim feature hashing — the only embedding derivable from text alone
that both engines can reproduce bit-for-bit), and search the chunk
vectors through the IVF store's probed-list path. This is the query a
RAG serving tier runs per request; at 100 TB the corpus side is the
store's integer-pruned inverted lists and the query side is O(chunks)
work against a broadcast centroid set.

Reference parity: the reference (rossanthony/github-miner) has no
retrieval surface; this is part of the engine's LLM-data-pipeline
upgrade (VERDICT r9/r10 item: chunk-level retrieval composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_miner_spark.functions.text import md5_prefix_hash, tokenize
from github_miner_spark.io.tables import load_table
from github_miner_spark.queries.similarity_queries import _dcos, _DUCK_EMB
from github_miner_spark.registry import register

# chunking params — MUST stay equal to doc_chunk_plan's
# (curation_queries.py): the retrieval tier searches the same windows
# the embedding export encodes
RAG_CHUNK = 32
RAG_OVERLAP = 8
RAG_STRIDE = RAG_CHUNK - RAG_OVERLAP
RAG_QUERY_DOCS = (1, 2, 3, 4)  # query documents (bounded probe set)
RAG_MAX_CHUNKS = 2  # first chunks per query doc — keeps |queries| <= 8
RAG_DIMS = 64  # hashing-trick width = the embedding corpus width
RAG_K = 5
RAG_N_PROBE = 3

_RAG_IN = ", ".join(str(d) for d in RAG_QUERY_DOCS)


def _chunk_oracle() -> str:
    # the IVF store re-derivation (cents/asg) is the SAME spec the
    # embedding_ivf_topk oracle pins (similarity_queries._ivf_oracle);
    # the chunk/encode chain mirrors doc_chunk_plan's arithmetic and
    # the hashing-trick encoder below, all integer until the cosine
    return f"""
    WITH e AS (SELECT vec_id, {_DUCK_EMB} AS ev FROM embeddings),
    par AS (
      SELECT CAST(ceil(count(*) / floor(sqrt(count(*)))) AS BIGINT) AS stride FROM e
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS cid, ev AS cvec FROM e
      WHERE vec_id % (SELECT stride FROM par) = 0
    ),
    asg AS MATERIALIZED (
      SELECT vec_id, ev, cid AS list_id FROM (
        SELECT e.vec_id, e.ev, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_dcos('e.ev', 'c.cvec')} DESC, c.cid) AS rn
        FROM e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    t AS (
      SELECT doc_id, list_filter(str_split(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
      FROM documents WHERE doc_id IN ({_RAG_IN})
    ),
    tn AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t WHERE len(toks) > 0),
    chunks AS (
      SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
             toks[(1 + i * {RAG_STRIDE}):(least(1 + i * {RAG_STRIDE} + {RAG_CHUNK - 1},
                                                n_tokens))] AS ctoks
      FROM tn, unnest(range(0, CAST(CASE WHEN n_tokens <= {RAG_CHUNK} THEN 1
                       ELSE ceil((n_tokens - {RAG_OVERLAP}) / {RAG_STRIDE}.0)
                       END AS BIGINT))) AS u(i)
      WHERE i < {RAG_MAX_CHUNKS}
    ),
    comp AS (
      SELECT doc_id, chunk_id,
             CAST(('0x' || substr(md5('fh|' || tok), 1, 8))::BIGINT
                  % {RAG_DIMS} AS INTEGER) AS dim,
             CASE WHEN ('0x' || substr(md5('sg|' || tok), 1, 8))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM chunks, unnest(ctoks) AS z(tok)
    ),
    wv AS (
      SELECT doc_id, chunk_id, dim, CAST(sum(sgn) AS BIGINT) AS w
      FROM comp GROUP BY doc_id, chunk_id, dim
    ),
    dense AS (
      SELECT c.doc_id, c.chunk_id, d.d, CAST(coalesce(w.w, 0) AS DOUBLE) AS x
      FROM (SELECT DISTINCT doc_id, chunk_id FROM wv) c
      CROSS JOIN (SELECT unnest(range(0, {RAG_DIMS})) AS d) d
      LEFT JOIN wv w ON w.doc_id = c.doc_id AND w.chunk_id = c.chunk_id
                    AND w.dim = d.d
    ),
    qv AS (
      SELECT doc_id, chunk_id, qvec FROM (
        SELECT doc_id, chunk_id, list(x ORDER BY d) AS qvec
        FROM dense GROUP BY doc_id, chunk_id
      ) WHERE list_sum(list_transform(qvec, y -> y * y)) > 0
    ),
    probes AS (
      SELECT doc_id, chunk_id, qvec, cid AS list_id FROM (
        SELECT q.doc_id, q.chunk_id, q.qvec, c.cid,
               row_number() OVER (PARTITION BY q.doc_id, q.chunk_id
                                  ORDER BY {_dcos('q.qvec', 'c.cvec')} DESC, c.cid) AS rn
        FROM qv q CROSS JOIN cents c
      ) WHERE rn <= {RAG_N_PROBE}
    ),
    scored AS (
      SELECT p.doc_id, p.chunk_id, a.vec_id AS neighbor_id,
             {_dcos('p.qvec', 'a.ev')} AS score
      FROM asg a JOIN probes p ON a.list_id = p.list_id
    ),
    ranked AS (
      SELECT doc_id, chunk_id, neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY doc_id, chunk_id
                                     ORDER BY score DESC, neighbor_id) AS INTEGER)
               AS rank
      FROM scored
    )
    SELECT doc_id, chunk_id, neighbor_id, score, rank FROM ranked
    WHERE rank <= {RAG_K}
    ORDER BY doc_id, chunk_id, rank
    """


def chunk_query_vectors(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, qvec) — chunk the documents with
    doc_chunk_plan's exact windowing, then encode each chunk with the
    hashing-trick: dim = md5('fh|'||token) % 64, sign from
    md5('sg|'||token) parity, per-dim INTEGER weight sums. The vector
    is left UN-normalized — cosine is scale-invariant, so skipping the
    normalize keeps the whole encoder in exact integer algebra on both
    engines (the only floats are the final cosine's). Zero-norm chunks
    (all signs cancel) are dropped on both sides."""
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).withColumn(
        "n_tokens", F.size("toks")
    ).filter(F.col("n_tokens") > 0)
    n_chunks = F.when(F.col("n_tokens") <= RAG_CHUNK, F.lit(1)).otherwise(
        F.ceil((F.col("n_tokens") - F.lit(RAG_OVERLAP)) / F.lit(float(RAG_STRIDE)))
    )
    chunks = (
        t.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        )
        .filter(F.col("chunk_id") < RAG_MAX_CHUNKS)
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                F.col("toks"),
                F.lit(1) + F.col("chunk_id") * RAG_STRIDE,
                F.least(
                    F.lit(RAG_CHUNK),
                    F.col("n_tokens") - F.col("chunk_id") * RAG_STRIDE,
                ),
            ).alias("ctoks"),
        )
    )
    comp = chunks.select(
        "doc_id", "chunk_id", F.explode("ctoks").alias("tok")
    ).select(
        "doc_id",
        "chunk_id",
        (md5_prefix_hash(F.concat(F.lit("fh|"), F.col("tok")), 8) % RAG_DIMS)
        .cast("int")
        .alias("dim"),
        F.when(
            md5_prefix_hash(F.concat(F.lit("sg|"), F.col("tok")), 8) % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    wv = comp.groupBy("doc_id", "chunk_id", "dim").agg(
        F.sum("sgn").cast("bigint").alias("w")
    )
    m = wv.groupBy("doc_id", "chunk_id").agg(
        F.map_from_entries(F.collect_list(F.struct("dim", "w"))).alias("m")
    )
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(RAG_DIMS - 1)),
        lambda d: F.coalesce(F.try_element_at(F.col("m"), d), F.lit(0)).cast(
            "double"
        ),
    )
    return (
        m.select("doc_id", "chunk_id", qvec.alias("qvec"))
        .filter(
            F.aggregate(F.col("qvec"), F.lit(0.0), lambda acc, x: acc + x * x) > 0
        )
    )


@register(
    "chunk_embedding_topk",
    oracle=_chunk_oracle(),
    description="End-to-end RAG retrieval: chunk the query documents "
    "(doc_chunk_plan's 32-token/8-overlap windows), encode each chunk "
    "with a deterministic 64-dim hashing-trick embedding (integer "
    "per-dim weight sums — cross-engine exact; un-normalized because "
    "cosine is scale-invariant), and search the chunk vectors through "
    "the materialized IVF store's probed-list path (probe selection "
    "against broadcast centroids, a scan of 3 inverted lists, "
    "per-chunk top-5). 100 TB shape: the corpus side never leaves the "
    "store's list-pruned parquet scan; the query side is O(chunk "
    "tokens) + |chunks| x sqrt(n) probe scoring; nothing is pairwise "
    "over the corpus. Oracle re-derives the store from spec (same "
    "stride-centroid chain the embedding_ivf_topk oracle pins) plus "
    "the chunk/encode chain.",
    tags=("similarity", "ann", "ivf", "rag", "chunking", "topk"),
)
def chunk_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_miner_spark.functions.ivf_store import (
        ivf_search_queries,
        load_ivf_index,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id").isin(list(RAG_QUERY_DOCS))
    )
    qv = chunk_query_vectors(docs)
    # composite chunk key packed into the search path's single id
    # (chunk_id < RAG_MAX_CHUNKS << 1000, so the packing is lossless)
    queries = qv.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("query_id"), "qvec"
    )
    assigned, cents = load_ivf_index(spark, sf_dir)
    hits = ivf_search_queries(
        assigned, cents, queries, k=RAG_K, n_probe=RAG_N_PROBE, exclude_self=False
    )
    return hits.select(
        F.floor(F.col("query_id") / 1000).cast("bigint").alias("doc_id"),
        (F.col("query_id") % 1000).cast("int").alias("chunk_id"),
        "neighbor_id",
        "score",
        "rank",
    ).orderBy("doc_id", "chunk_id", "rank")


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# vector (IVF probed-list) legs — the standard production RAG ranker
# (Cormack et al. 2009 RRF; every hybrid search stack ships this).
# ---------------------------------------------------------------------------

RRF_K = 60  # the canonical RRF constant
HYBRID_LEG_K = 20  # depth of each retrieval leg
HYBRID_TOPK = 10


def _hybrid_oracle() -> str:
    from github_miner_spark.queries.text_queries import BM25_TERMS, _bm25_oracle_sql

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH e AS (SELECT vec_id, {_DUCK_EMB} AS ev FROM embeddings),
    par AS (
      SELECT CAST(ceil(count(*) / floor(sqrt(count(*)))) AS BIGINT) AS stride FROM e
    ),
    cents AS MATERIALIZED (
      SELECT vec_id AS cid, ev AS cvec FROM e
      WHERE vec_id % (SELECT stride FROM par) = 0
    ),
    asg AS MATERIALIZED (
      SELECT vec_id, ev, cid AS list_id FROM (
        SELECT e.vec_id, e.ev, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_dcos('e.ev', 'c.cvec')} DESC, c.cid) AS rn
        FROM e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    lex AS (
      SELECT doc_id, rank AS rank_lex
      FROM ({_bm25_oracle_sql(HYBRID_LEG_K)}) bm
    ),
    qt AS (SELECT unnest([{terms}]) AS tok),
    qcomp AS (
      SELECT CAST(('0x' || substr(md5('fh|' || tok), 1, 8))::BIGINT
                  % {RAG_DIMS} AS INTEGER) AS dim,
             CASE WHEN ('0x' || substr(md5('sg|' || tok), 1, 8))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM qt
    ),
    qwv AS (SELECT dim, CAST(sum(sgn) AS BIGINT) AS w FROM qcomp GROUP BY dim),
    qdense AS (
      SELECT d.d, CAST(coalesce(w.w, 0) AS DOUBLE) AS x
      FROM (SELECT unnest(range(0, {RAG_DIMS})) AS d) d
      LEFT JOIN qwv w ON w.dim = d.d
    ),
    qv AS (SELECT list(x ORDER BY d) AS qvec FROM qdense),
    probes AS (
      SELECT qvec, cid AS list_id FROM (
        SELECT q.qvec, c.cid,
               row_number() OVER (ORDER BY {_dcos('q.qvec', 'c.cvec')} DESC, c.cid)
                 AS rn
        FROM qv q CROSS JOIN cents c
      ) WHERE rn <= {RAG_N_PROBE}
    ),
    vscored AS (
      SELECT a.vec_id AS doc_id, {_dcos('p.qvec', 'a.ev')} AS score
      FROM asg a JOIN probes p ON a.list_id = p.list_id
    ),
    vec AS (
      SELECT doc_id, rank_vec FROM (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                 AS rank_vec
        FROM vscored
      ) WHERE rank_vec <= {HYBRID_LEG_K}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             l.rank_lex, v.rank_vec,
             round(coalesce(1.0 / ({RRF_K} + l.rank_lex), 0)
                   + coalesce(1.0 / ({RRF_K} + v.rank_vec), 0), 6) AS rrf_score
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {HYBRID_TOPK}
    """


@register(
    "hybrid_retrieval_rrf_topk",
    oracle=_hybrid_oracle(),
    description="Hybrid retrieval via reciprocal-rank fusion (Cormack "
    "et al. 2009, K=60) — the production RAG ranker that fuses BOTH "
    "retrieval legs this engine already serves: BM25 lexical top-20 "
    "(bm25_retrieval_topk's exact integer-quantized scoring, same "
    "query terms) and the vector leg, which embeds the query text "
    "with the chunk encoder (64-dim hashing trick, exact integer "
    "weights) and searches the materialized IVF store's probed-list "
    "path top-20. rrf = 1/(60+rank_lex) + 1/(60+rank_vec), a fixed "
    "two-term expression evaluated identically on both engines (no "
    "order-sensitive accumulation); docs reached by only one leg "
    "keep a NULL rank on the other. 100 TB shape: each leg is its "
    "own already-audited bounded plan (term-filtered scan + "
    "TakeOrdered; list-pruned integer-keyed index scan); the fusion "
    "is a full-outer join of two k-row frames — constant-size work "
    "regardless of corpus scale.",
    tags=("similarity", "retrieval", "rag", "rrf", "hybrid", "topk"),
)
def hybrid_retrieval_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from github_miner_spark.functions.ivf_store import (
        ivf_search_queries,
        load_ivf_index,
    )
    from github_miner_spark.queries.text_queries import (
        BM25_TERMS,
        bm25_retrieval_topk,
    )

    lex = bm25_retrieval_topk(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rank_lex")
    )
    # the query text embeds through the SAME encoder chunk retrieval
    # uses — one row, one chunk. The oracle models EXACTLY ONE query
    # vector, so the single-chunk contract is ENFORCED, not implied
    # (ADVICE r11): a BM25_TERMS that outgrew RAG_CHUNK would emit a
    # second chunk_id, fan out the full-outer join with duplicate
    # doc_id rows, and silently diverge from the single-vector oracle.
    if len(BM25_TERMS) > RAG_CHUNK:
        raise ValueError(
            f"hybrid_retrieval_rrf_topk requires len(BM25_TERMS)="
            f"{len(BM25_TERMS)} <= RAG_CHUNK={RAG_CHUNK} (one query chunk)"
        )
    qdoc = spark.createDataFrame(
        [(0, " ".join(BM25_TERMS))], "doc_id long, text string"
    )
    queries = chunk_query_vectors(qdoc).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("query_id"), "qvec"
    )
    assigned, cents = load_ivf_index(spark, sf_dir)
    vec = ivf_search_queries(
        assigned, cents, queries, k=HYBRID_LEG_K, n_probe=RAG_N_PROBE,
        exclude_self=False,
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_vec"))
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    # bounded single-partition window: the rank runs AFTER the
    # limit(HYBRID_TOPK) — it only ever sees <= 10 rows at any corpus
    # scale (each leg is already k-row), same audit note as the BM25
    # leg's post-limit rank
    top = fused.orderBy(F.desc("rrf_score"), "doc_id").limit(HYBRID_TOPK)
    return (
        top.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf_score"), "doc_id"))
            .cast("int"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
    )
