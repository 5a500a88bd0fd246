"""Deduplication operators over a document corpus.

All four strategies a large-corpus pipeline uses, Spark-first:

- exact dedup        : hash group-by (one shuffle on a 64-hex key)
- n-gram Jaccard     : shingle inverted-index join — no all-pairs product
- MinHash + LSH      : per-row signatures (zero shuffle), banded bucket
                       join for candidates, exact verify on candidates only
- SimHash            : per-row 32-bit fingerprint, again zero shuffle

Scale posture (100 TB): nothing here enumerates the O(N^2) pair space.
Candidate generation is always an equi-join on a derived key (content
hash, shingle, LSH band), which Spark executes as a shuffled hash join
partitioned by that key; the quadratic blow-up is confined to *within a
bucket*, which LSH banding keeps small. Signatures and fingerprints are
higher-order array expressions (``transform``/``aggregate``) evaluated
inside whole-stage codegen — no Python, no UDF, no explode for the
signature computation itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streambench_spark.llm.hashing import MERSENNE_P, minhash_coefficients, spark_hash32

# ---------------------------------------------------------------------------
# Tokenize / shingle expressions (shared with text.py semantics)
# ---------------------------------------------------------------------------

TOKENS_EXPR = r"split(lower({col}), '\\s+')"


def tokens_col(col: str = "text") -> Column:
    return F.expr(TOKENS_EXPR.format(col=col))


def _shingles_sql(n: int) -> str:
    """Spark SQL fragment: distinct word n-gram shingles over a pre-bound
    `tk` array column (codegen, no UDF). Guarded for docs shorter than n
    tokens (Spark ``sequence(0, k)`` with k < 0 generates a *descending*
    sequence, not an empty one)."""
    gram = ", ' ', ".join(f"tk[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN size(tk) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(tk) - {n}), "
        f"i -> concat({gram}))) "
        f"ELSE array() END"
    )


def with_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Attach `tk` (tokens) and `shingles` (distinct word n-grams)."""
    return docs.withColumn("tk", tokens_col(text_col)).withColumn(
        "shingles", F.expr(_shingles_sql(n))
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group documents by normalized content hash.

    Normalization = lowercase + trim + collapse whitespace (the standard
    "exact" dedup for web corpora). One shuffle, keyed by the 64-hex sha256
    — uniformly distributed, skew-free at any scale. Returns one row per
    distinct content with the canonical (minimum) doc_id and copy count.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        docs.select(F.col("doc_id"), F.sha2(norm, 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold, without an
    all-pairs product: explode shingles into an inverted index, equi-join
    on the shingle, count shared shingles per pair, then compute
    J = |A∩B| / (|A| + |B| - |A∩B|).

    Any pair with J > 0 shares >= 1 shingle, so recall is exact. The join
    shuffles on the shingle string; very common shingles create hot keys —
    at 100 TB one adds a document-frequency cap on shingles (drop shingles
    appearing in > f·N docs, standard in corpus dedup) which bounds the
    per-key bucket; kept exact here because the oracle must match.
    """
    sh = with_shingles(docs, text_col, n).select(
        "doc_id", "shingles", F.size("shingles").alias("n_sh")
    )
    inv = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Attach a `sig` array<long> MinHash signature per document.

    sig[j] = min over shingles s of (a_j * (H(s) mod P) + b_j) mod P with
    the portable md5-based H (hashing.py). Entirely within-row — computed
    by nested ``transform``/``array_min`` in codegen. Zero shuffle, scales
    linearly with corpus size; docs with no shingles are dropped (their
    signature is undefined).
    """
    coeffs = minhash_coefficients(num_hashes)
    h = spark_hash32("s")
    per_hash = ", ".join(
        f"array_min(transform(shingles, s -> ({a}L * ({h} % {MERSENNE_P}L) + {b}L) % {MERSENNE_P}L))"
        for a, b in coeffs
    )
    return (
        with_shingles(docs, text_col, n)
        .filter(F.size("shingles") > 0)
        .withColumn("sig", F.expr(f"array({per_hash})"))
    )


def lsh_candidate_pairs(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing >= 1 identical band.

    Band key = the `rows` signature slots of that band joined into a
    string; posexplode produces (band_idx, key) and the self-equi-join on
    (band_idx, key) is the ONLY shuffle — partitioned by band key, so at
    1000 executors each bucket's micro-product is local. Never an
    all-pairs product.
    """
    band_exprs = ", ".join(
        "concat_ws('_', " + ", ".join(f"sig[{b * rows + r}]" for r in range(rows)) + ")"
        for b in range(bands)
    )
    banded = sig_df.select(
        "doc_id", F.posexplode(F.expr(f"array({band_exprs})")).alias("band_idx", "band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH candidates + exact verify.

    Candidates come from banded LSH (bands × rows = num_hashes); each
    candidate pair is then verified with the exact shingle-set Jaccard
    (array_intersect on the two shingle arrays — candidates only, a tiny
    fraction of the pair space). With 8 bands × 2 rows a J=0.9 pair is
    missed with probability (1 - 0.9^2)^8 ≈ 2e-6; the exact verify removes
    all false positives, so output ⊆ ngram_jaccard_pairs with near-1
    recall at high J.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col)
    cand = lsh_candidate_pairs(sig, bands, rows)
    sh = sig.select("doc_id", "shingles")
    joined = (
        cand.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        joined.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document (Charikar): for each bit position i,
    sum ±1 over token occurrences according to bit i of the token hash;
    bit i of the fingerprint is set iff the sum is > 0.

    Per-row nested higher-order expressions: hash each token once
    (transform), then for each bit fold the hash array — all codegen, zero
    shuffle, linear scan. Near-dup detection then groups by fingerprint
    (or by rotated prefixes for hamming-distance blocking).
    """
    h = spark_hash32("t")
    tk = TOKENS_EXPR.format(col=text_col)
    return docs.withColumn(
        "simhash",
        F.expr(
            f"""
            aggregate(
                transform(sequence(0, {bits - 1}), i ->
                    IF(aggregate(transform({tk}, t -> {h}), 0L,
                         (acc, hv) -> acc + IF(((hv >> i) & 1) = 1, 1, -1)) > 0,
                       shiftleft(1L, i), 0L)),
                0L, (acc, v) -> acc + v)
            """
        ),
    )
