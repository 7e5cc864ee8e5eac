"""Text-analysis operators for LLM-data pipelines: tokenization,
quality scoring, language ID, fingerprinting, shingling.

Everything here is pure Catalyst column expressions (higher-order array
functions, no Python UDFs) so the hot path stays inside whole-stage
codegen and scales to 100 TB of documents. Every primitive has an exact
DuckDB twin (list_transform / list_filter / list_reduce) used by the
query oracles — the portable token hash is the first 8 hex chars of
md5, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for rolling-hash fingerprints: keeps list_reduce arithmetic
# inside 2^45 so DuckDB BIGINT (which errors on overflow) and Spark long
# (which wraps) behave identically
FINGERPRINT_MOD = 1 << 40

MINHASH_PRIME = (1 << 31) - 1

STOPWORDS = {
    "en": ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "auf", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "en", "que", "pour", "dans"],
}


def tokenize(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, split on whitespace.
    Oracle twin: list_filter(str_split(regexp_replace(lower(t),
    '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.filter(F.split(cleaned, " "), lambda t: t != "")


def md5_prefix_hash(value: Column, n_hex: int) -> Column:
    """Portable md5-prefix hash: first ``n_hex`` hex chars as BIGINT
    (n_hex <= 15 keeps the value inside 60 bits / positive BIGINT).
    The ONE definition of the cross-engine hash recipe — every width
    variant derives from it. Oracle twin:
    ('0x' || substr(md5(v), 1, n_hex))::BIGINT."""
    return F.conv(F.substring(F.md5(value), 1, n_hex), 16, 10).cast("bigint")


def token_hash(token: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex chars of md5 as BIGINT."""
    return md5_prefix_hash(token, 8)


def token_hashes(tokens: Column) -> Column:
    return F.transform(tokens, token_hash)


def token_hash60(token: Column) -> Column:
    """Portable 60-bit hash — for sketches whose registers must agree
    bit-for-bit across engines (HLL bucket/rank splits need more than
    32 bits of entropy)."""
    return md5_prefix_hash(token, 15)


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def stopword_ratio(tokens: Column, lang: str = "en") -> Column:
    """Fraction of tokens (with multiplicity) that are stopwords."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def char_class_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex char class (punct,
    digit, ...): 1 - len(strip(class)) / len(text)."""
    total = F.length(text)
    stripped = F.length(F.regexp_replace(text, pattern, ""))
    return F.when(total > 0, (total - stripped) / total).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    return char_class_ratio(text, r"[.,;:!?'\"()\[\]{}-]")


def digit_ratio(text: Column) -> Column:
    return char_class_ratio(text, "[0-9]")


def mean_token_length(tokens: Column) -> Column:
    total = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(tokens) > 0, total / F.size(tokens)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards stopword presence
    (natural prose) and moderate token length; penalizes punctuation
    and digit noise. The exact formula is pinned by the oracle."""
    toks = tokenize(text)
    sw = stopword_ratio(toks)
    mtl = mean_token_length(toks)
    length_term = F.lit(1.0) - F.least(F.abs(mtl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    score = (
        F.lit(0.4) * F.least(sw * F.lit(4.0), F.lit(1.0))
        + F.lit(0.3) * length_term
        + F.lit(0.3) * (F.lit(1.0) - F.least((punct_ratio(text) + digit_ratio(text)) * F.lit(3.0), F.lit(1.0)))
    )
    return F.round(score, 6)


def language_id(text: Column) -> Column:
    """N-gram-free language ID heuristic: the language whose stopword
    list hits the most tokens (ties -> lexicographically first lang);
    'und' (undetermined) when nothing hits."""
    toks = tokenize(text)
    pairs = []
    for lang in sorted(STOPWORDS):
        stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        pairs.append(F.struct((-hits).alias("neg_hits"), F.lit(lang).alias("lang"), hits.alias("hits")))
    best = F.array_min(F.array(*pairs))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling-hash document fingerprint:
    fold tokens with acc = (acc*31 + H(token)) mod 2^40."""
    hashes = token_hashes(tokenize(text))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(FINGERPRINT_MOD),
    )


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3'); empty array when
    the document has fewer than n tokens."""
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # guard short documents explicitly
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + F.lit(j)).cast("int")) for j in range(n)]
        ),
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct hashed word-n-gram shingles of a document.

    NB: prefer ``shingle_hashes_of_tokens`` over a PROJECTED token
    column in corpus-scan paths — this convenience form nests
    tokenize() inside word_shingles' transform lambda, where codegen
    subexpression elimination cannot reach, so the regex re-evaluates
    per shingle position."""
    return shingle_hashes_of_tokens(tokenize(text), n)


def shingle_hashes_of_tokens(tokens: Column, n: int = 3) -> Column:
    """Distinct hashed word-n-gram shingles over an already-projected
    token array column. Callers materialize tokens with a select
    boundary first: with the nested form, tokenize() re-runs for every
    argument reference inside the transform lambda (measured ~25s ->
    ~1s at sf0.1 on the boilerplate corpus scan)."""
    return F.array_distinct(F.transform(word_shingles(tokens, n), token_hash))


def minhash_signature(shingles_hashed: Column, k: int = 16) -> Column:
    """k-perm MinHash signature over hashed shingles:
    sig_i = min over s of ((2i+1)*H(s) + 7919*i) mod (2^31-1).
    Empty shingle set -> sig of all MINHASH_PRIME (sentinel)."""
    def perm(i: Column) -> Column:
        return F.array_min(
            F.transform(
                shingles_hashed,
                lambda h: ((F.lit(2) * i + F.lit(1)) * h + F.lit(7919) * i) % F.lit(MINHASH_PRIME),
            )
        )

    sig = F.transform(F.sequence(F.lit(0), F.lit(k - 1)), lambda i: perm(i.cast("bigint")))
    return F.transform(sig, lambda v: F.coalesce(v, F.lit(MINHASH_PRIME)))


# PII patterns, deliberately written in the common RE2/Java subset so the
# Spark (java.util.regex) and DuckDB (RE2) engines match identical spans.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text: Column) -> Column:
    """Replace email addresses and IPv4 literals with typed placeholder
    tags — the standard pre-training privacy scrub (e.g. the C4 /
    FineWeb pipelines). Pure ``regexp_replace`` expressions: JVM-side,
    codegen'd, no Python in the row path."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_ipv4) match counts per document."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        F.regexp_count(text, F.lit(PII_IPV4_RE)),
    )


def token_windows(tokens: Column, w: int) -> Column:
    """Consecutive ``w``-token windows as space-joined strings; a doc
    shorter than ``w`` yields an EMPTY list (Spark's sequence(1, 0) is
    the descending [1, 0], so the short case must be explicit)."""
    return F.when(
        F.size(tokens) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(w - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hll_estimate_expr(m: int, rho_max: int, s_int: Column, buckets_used: Column) -> Column:
    """The HLL estimate from exact-integer register sums — ONE shared
    definition of the bias-corrected raw estimator + linear-counting
    fallback, used by every HLL-register consumer (per-source token/
    shingle sketches, the ANF neighborhood function). The algebra must
    stay bit-identical across engines and sketch families; sharing the
    expression removes the copy-drift risk (round-8 review finding).
    SQL twin: :func:`hll_estimate_case_sql` / :func:`hll_alpha_sql`."""
    alpha_mm = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
        * F.lit(float(m))
        * F.lit(float(m))
    )
    denom = s_int.cast("double") / F.pow(F.lit(2.0), F.lit(rho_max)) + (
        F.lit(m) - buckets_used
    ).cast("double")
    e_raw = alpha_mm / denom
    return F.when(
        (e_raw <= F.lit(2.5 * m)) & (buckets_used < F.lit(m)),
        F.lit(float(m))
        * F.log(F.lit(float(m)) / (F.lit(m) - buckets_used).cast("double")),
    ).otherwise(e_raw)


def hll_alpha_sql(m: int) -> str:
    """DuckDB text of the alpha_m bias constant — the oracle twin of
    :func:`hll_estimate_expr`'s alpha term."""
    return f"(0.7213 / (1.0 + 1.079 / {m}.0))"


def hll_estimate_case_sql(m: int) -> str:
    """DuckDB text of the linear-counting fallback CASE over columns
    named e_raw / buckets_used — the oracle twin of
    :func:`hll_estimate_expr`'s branch."""
    return (
        f"CASE WHEN e_raw <= 2.5 * {m}.0 AND buckets_used < {m} "
        f"THEN {m}.0 * ln({m}.0 / CAST({m} - buckets_used AS DOUBLE)) "
        f"ELSE e_raw END"
    )
