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

from streambench_spark.llm.hashing import (
    MERSENNE_P,
    locale_free_lower_sql,
    minhash_coefficients,
    spark_hash32,
)

# ---------------------------------------------------------------------------
# Tokenize / shingle expressions (shared with text.py semantics)
# ---------------------------------------------------------------------------

# Lowering is locale-free (ICU root via hashing.locale_free_lower_sql):
# plain lower() would read the JVM default locale on non-ASCII text.
TOKENS_EXPR = r"split(" + locale_free_lower_sql("{col}") + r", '\\s+')"


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


def with_hashed_shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, hash_mode: str = "md5"
) -> DataFrame:
    """Attach `hsh`: the distinct 32-bit hashes of the shingles.

    Hash collisions merge shingles identically in the SQL oracle (same
    hash), so downstream set operations stay bit-exact across engines.
    NOTE: row-local array shape — do not ``explode`` this column (see
    shingle_postings for why); it exists for per-row signature-style
    consumers and tests."""
    h = spark_hash32("s", mode=hash_mode)
    return with_shingles(docs, text_col, n).withColumn(
        "hsh", F.expr(f"array_distinct(transform(shingles, s -> {h} % {MERSENNE_P}L))")
    )


def shingle_postings(
    docs: DataFrame, n: int = 3, text_col: str = "text", distinct: bool = True,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, h) inverted-index postings: one row per distinct shingle
    hash per document — the shared substrate of the set-based dedup ops.

    Explode-FIRST shape, deliberately: explode the cheap token-index
    sequence, then derive the shingle string + hash per posting row.
    Everything stays in whole-stage codegen (no higher-order lambdas),
    and — measured, ~20× — it avoids an optimizer trap: ``explode`` over
    an expensive computed array makes InferFiltersFromGenerate add a
    ``size(expr) > 0`` guard that predicate pushdown re-inlines below the
    repartition exchange, re-evaluating the whole shingle pipeline on the
    unparallelized scan side. ``distinct=True`` (the default) applies the
    set semantics — one posting per distinct shingle hash — at the cost of
    a (doc_id, h) shuffle of the whole postings stream. Pass
    ``distinct=False`` when the consumer filters the postings first (e.g.
    a semi-join against a small gram set) and deduplicates only the
    survivors — that keeps the full corpus shuffle-free.
    """
    h = spark_hash32("shingle", mode=hash_mode)
    tk = TOKENS_EXPR.format(col=text_col)
    gram = F.concat_ws(" ", *[F.expr(f"tk[i + {j}]") for j in range(n)])
    posts = (
        docs.select("doc_id", F.expr(tk).alias("tk"))
        .filter(F.expr(f"size(tk) >= {n}"))  # guard: sequence(0, k<0) descends
        .select("doc_id", "tk", F.explode(F.expr(f"sequence(0, size(tk) - {n})")).alias("i"))
        .select("doc_id", gram.alias("shingle"))
        .select("doc_id", F.expr(f"{h} % {MERSENNE_P}L").alias("h"))
    )
    return posts.distinct() if distinct else posts


def doc_shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", hash_mode: str = "md5"
) -> DataFrame:
    """(doc_id, hsh array<long>, n_sh): each document's distinct shingle-
    hash SET as one array row, built with the explode-first postings
    pipeline + one groupBy collect_set (map-side partial sets — the
    shuffle carries one set per doc per partition, not one row per
    posting). Per-doc set size is bounded by document length, so the
    collect_set state is safe at any corpus scale.

    The one-row-per-doc shape is what verification stages want: a
    candidate pair's exact intersection is a row-local array_intersect of
    two bounded arrays — no posting-level join explosion."""
    # non-distinct postings + collect_set: the set semantics land in the
    # aggregate (map-side partial sets), not in a posting-level shuffle —
    # and the shingle pipeline itself lives in ONE place
    raw = shingle_postings(docs, n, text_col, distinct=False, hash_mode=hash_mode)
    return (
        raw.groupBy("doc_id")
        .agg(F.collect_set("h").alias("hsh"))
        .select("doc_id", "hsh", F.size("hsh").alias("n_sh"))
    )


def sized_shingle_postings(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_sh, h) postings with the document's set size carried on
    every row, in ONE shuffle (explode of doc_shingle_sets).

    Carrying n_sh on the posting row lets the pair aggregate read sizes
    with min() instead of re-deriving them from two more postings scans —
    the Jaccard plan drops from four evaluations of the shingle pipeline
    (join a-side, b-side, two size aggregates) to one.
    """
    return doc_shingle_sets(docs, n, text_col).select(
        "doc_id", "n_sh", F.explode("hsh").alias("h")
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
    norm = F.regexp_replace(
        F.trim(F.expr(locale_free_lower_sql(text_col))), r"\s+", " "
    )
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
    shuffles on the 8-byte shingle hash; very common shingles create hot
    keys — at 100 TB use ngram_jaccard_pairs_capped (df cap bounds every
    bucket); kept exact here because the oracle must match.

    Plan shape: sized postings (set size carried on each row) computed
    ONCE; the self-join is forced to sort-merge so both sides share one
    shuffle-on-h via ReusedExchange (a broadcast side would re-execute
    the whole postings pipeline), and the pair aggregate reads the sizes
    with min() — no second pass over the corpus anywhere.
    """
    posts = sized_shingle_postings(docs, n, text_col)
    a, b = posts.alias("a"), posts.hint("merge").alias("b")
    sized = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("a.n_sh").alias("na"),
            F.min("b.n_sh").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        sized.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _verify_pairs_exact(
    cand: DataFrame, doc_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    per-doc shingle-set arrays: two equi-joins on the doc id attach each
    side's array, then the intersection is a ROW-LOCAL array_intersect of
    two bounded arrays in codegen. Never joins at posting granularity —
    a candidate set of C pairs costs C rows, not C × postings-per-doc
    (measured 5× on the capped variant at sf0.1). Shared by the capped-
    Jaccard and MinHash-LSH verify stages."""
    a = doc_sets.select(
        F.col("doc_id").alias("id_a"), F.col("hsh").alias("_ha"),
        F.col("n_sh").alias("na"),
    )
    b = doc_sets.select(
        F.col("doc_id").alias("id_b"), F.col("hsh").alias("_hb"),
        F.col("n_sh").alias("nb"),
    )
    sized = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("_ha", "_hb")))
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        sized.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_capped(
    docs: DataFrame,
    threshold: float = 0.5,
    max_df: int = 10,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The 100 TB scale path for n-gram Jaccard: drop shingles whose
    document frequency exceeds ``max_df`` from CANDIDATE GENERATION (the
    standard df-cap in web-corpus dedup — boilerplate shingles pair up
    everything with everything), then verify candidates with the EXACT
    full-shingle Jaccard.

    The cap is ABSOLUTE, not a corpus fraction: a shingle that identifies
    a near-dup group appears in roughly group-size documents regardless
    of corpus size, while boilerplate df grows with the corpus — so the
    discriminating threshold is a constant, and an absolute cap keeps
    candidate quality stable as the corpus scales (a fractional cap
    loosens as N grows, admitting ever-hotter shingles).

    Semantics: a pair is reported iff it shares >= 1 rare shingle AND its
    exact Jaccard >= threshold — output ⊆ ngram_jaccard_pairs, missing
    only pairs whose every shared shingle is above the cap. The per-
    shingle join bucket is bounded by max_df, so the worst key produces a
    bounded micro-product instead of the unbounded quadratic blowup a hot
    shingle causes in the exact variant — which is what lets the same
    plan run at 1000 executors.
    """
    from pyspark.sql import Window

    # The per-doc set frame feeds THREE differently-keyed consumers
    # (the df-capped candidate join on h, and the verify joins on id_a
    # and id_b). AQE exchange reuse dedups identical exchanges but the
    # collect_set AGGREGATE above the doc_id exchange re-executes per
    # consumer — the r16 triangles lesson. Materializing the bounded
    # per-doc arrays once (one corpus-shingle pass in the block store)
    # halves the query: 1.74 -> 0.85 s median over 5 interleaved reps at
    # sf0.1, pairs identical (plans/r16/neardup_ab_evidence.json).
    sets = doc_shingle_sets(docs, n, text_col).localCheckpoint(eager=True)
    posts = sets.select("doc_id", F.explode("hsh").alias("h"))
    # df-cap via a count window over the one shuffle-on-h the self-join
    # needs anyway (postings are distinct per doc, so count(*) per h IS
    # the document frequency) — one pass, no separate groupBy + join
    # re-shuffling the postings stream.
    rposts = (
        posts.withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter(F.col("_df") <= max_df)
        .drop("_df")
    )
    a, b = rposts.alias("a"), rposts.hint("merge").alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return _verify_pairs_exact(cand, sets, threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    posts: DataFrame | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """Attach a `sig` array<long> MinHash signature per document.

    sig[j] = min over hashed shingles h of (a_j * h + b_j) mod P with the
    portable md5-based hash computed ONCE per shingle. Distributed shape:
    one hash aggregate over the postings (map-side partial mins, so each
    partition contributes 16 longs per doc to the shuffle) — the classic
    scalable minhash; all integer codegen, no interpreted lambdas. Docs
    with no shingles have no postings and thus no signature (undefined).
    """
    coeffs = minhash_coefficients(num_hashes)
    if posts is None:
        posts = shingle_postings(docs, n, text_col, hash_mode=hash_mode)
    mins = [
        F.min(F.expr(f"({a}L * h + {b}L) % {MERSENNE_P}L")).alias(f"_s{j}")
        for j, (a, b) in enumerate(coeffs)
    ]
    sig_cols = ", ".join(f"_s{j}" for j in range(num_hashes))
    return (
        posts.groupBy("doc_id")
        .agg(*mins)
        .withColumn("sig", F.expr(f"array({sig_cols})"))
        .select("doc_id", "sig")
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
    # merge hint, like the ngram_jaccard self-joins: both sides are the
    # same banded frame, so a sort-merge join shares ONE exchange via
    # ReusedExchange — a broadcast side would re-execute the whole
    # signature pipeline and buffer an unbounded frame on every executor
    a, b = banded.hint("merge").alias("a"), banded.hint("merge").alias("b")
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
    hash_mode: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH candidates + exact verify.

    Candidates come from banded LSH (bands × rows = num_hashes); each
    candidate pair is then verified with the exact shingle-set Jaccard,
    computed on the postings restricted to candidates (broadcast the
    candidate pair list into the postings join — candidates are a tiny
    fraction of the pair space). With 8 bands × 2 rows a J=0.9 pair is
    missed with probability (1 - 0.9^2)^8 ≈ 2e-6; the exact verify removes
    all false positives, so output ⊆ ngram_jaccard_pairs with near-1
    recall at high J.

    ``bands`` must divide ``num_hashes`` exactly: trailing signature
    slots would be computed (paid in every per-shingle aggregate) but
    never banded — the caller would believe they run num_hashes-hash LSH
    at lower recall; bands > num_hashes would make rows=0 and a
    malformed band key (r08 review).
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) "
            "exactly — trailing un-banded hashes would silently lower "
            "recall"
        )
    rows = num_hashes // bands
    # same three-consumer shape as ngram_jaccard_pairs_capped (posts ->
    # signatures, verify a-side, verify b-side): checkpoint the bounded
    # per-doc set arrays once — 1.23 -> 0.62 s median interleaved at
    # sf0.1, pairs identical (r16).
    sets = doc_shingle_sets(docs, n, text_col,
                            hash_mode=hash_mode).localCheckpoint(eager=True)
    posts = sets.select("doc_id", F.explode("hsh").alias("h"))
    sig = minhash_signatures(docs, num_hashes, n, text_col, posts=posts,
                             hash_mode=hash_mode)
    cand = lsh_candidate_pairs(sig, bands, rows)
    # row-local array_intersect verify against the per-doc sets (no
    # posting-level join, no separate sizes pass)
    return _verify_pairs_exact(cand, sets, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    docs: DataFrame, bits: int = 32, text_col: str = "text", hash_mode: str = "md5"
) -> DataFrame:
    """32-bit SimHash per document (Charikar): for each bit position i,
    sum ±1 over token occurrences according to bit i of the token hash;
    bit i of the fingerprint is set iff the sum is > 0.

    Per-row higher-order expressions: hash each token ONCE into a long
    array (a separate column so codegen shares it across all bit
    positions — inlining it re-evaluates md5 per bit, a measured ~10×
    slowdown), then fold that array per bit — all codegen, zero shuffle,
    linear scan. Near-dup detection then groups by fingerprint (or by
    rotated prefixes for hamming-distance blocking).
    """
    h = spark_hash32("t", mode=hash_mode)
    tk = TOKENS_EXPR.format(col=text_col)
    return (
        docs.withColumn("_th", F.expr(f"transform({tk}, t -> {h})"))
        .withColumn(
            "simhash",
            F.expr(
                f"""
                aggregate(
                    transform(sequence(0, {bits - 1}), i ->
                        IF(aggregate(_th, 0L,
                             (acc, hv) -> acc + IF(((hv >> i) & 1) = 1, 1, -1)) > 0,
                           shiftleft(1L, i), 0L)),
                    0L, (acc, v) -> acc + v)
                """
            ),
        )
        .drop("_th")
    )


def span_dedup_counts(
    docs: DataFrame, span: int = 10, text_col: str = "text", hash_mode: str = "md5"
) -> DataFrame:
    """Cross-document span dedup: (doc_id, n_spans, n_dup_spans) where a
    span is a fixed-size non-overlapping run of ``span`` tokens and a span
    is a DUPLICATE iff the same span hash occurred at a smaller
    (doc_id, span_idx) anywhere in the corpus.

    This is the C4/CCNet line-level dedup shape (drop repeated
    lines/paragraphs corpus-wide, keep the first occurrence) adapted to
    newline-less text via deterministic fixed-size chunking. Scale shape:
    explode to one row per span (corpus token count / span rows), hash,
    then ONE groupBy(h) partial-aggregated min to find each hash's first
    occurrence and ONE equi-join back on h — never a pairwise product.
    min(struct(doc_id, idx)) does map-side combine, so a viral span that
    appears a million times contributes one row per map partition to the
    shuffle, not a million (the skew-safe property the window-function
    formulation row_number() OVER (PARTITION BY h) lacks).
    """
    h = spark_hash32("span_text", mode=hash_mode)
    tk = TOKENS_EXPR.format(col=text_col)
    posts = (
        docs.select("doc_id", F.expr(tk).alias("tk"))
        .filter(F.expr(f"size(tk) >= {span}"))
        .select(
            "doc_id",
            "tk",
            F.explode(
                F.expr(f"sequence(0, size(tk) DIV {span} - 1)")
            ).alias("idx"),
        )
        .select(
            "doc_id",
            "idx",
            F.expr(
                f"concat_ws(' ', slice(tk, idx * {span} + 1, {span}))"
            ).alias("span_text"),
        )
        .select("doc_id", "idx", F.expr(f"{h} % {MERSENNE_P}L").alias("h"))
    )
    firsts = posts.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    return (
        posts.join(firsts, "h")
        .select(
            "doc_id",
            (
                ~(
                    (F.col("first.doc_id") == F.col("doc_id"))
                    & (F.col("first.idx") == F.col("idx"))
                )
            ).cast("long").alias("is_dup"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("is_dup").alias("n_dup_spans"),
        )
    )


def with_minhash_key(
    docs: DataFrame, num_hashes: int = 8, n: int = 3, text_col: str = "text",
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, sig_key): the MinHash signature computed ROW-LOCALLY as
    higher-order array expressions and joined into one string key.

    The batch pipeline (minhash_signatures) builds signatures from the
    exploded postings with map-side partial mins — the right batch shape,
    but it needs a groupBy of its own, and Structured Streaming allows
    only one stateful aggregate per query. The row-local form trades the
    codegen explode for per-row interpreted lambdas (bounded by tokens
    per document) so the ONLY stateful operator left is the consumer's
    dedup aggregate — the streaming-compatible shape. Semantics are
    identical: same md5 shingle hash, same (a,b) LCG coefficients, same
    mod-P arithmetic; docs with fewer than n tokens have no shingle set
    and are excluded (undefined signature), matching the batch contract.
    """
    coeffs = minhash_coefficients(num_hashes)
    tk = TOKENS_EXPR.format(col=text_col)
    gram = "concat_ws(' ', " + ", ".join(f"_tk[i + {j}]" for j in range(n)) + ")"
    h = spark_hash32(gram, mode=hash_mode)
    sig_elems = ", ".join(
        f"array_min(transform(_hsh, h -> ({a}L * h + {b}L) % {MERSENNE_P}L))"
        for a, b in coeffs
    )
    return (
        docs.select("doc_id", F.expr(tk).alias("_tk"))
        .filter(F.expr(f"size(_tk) >= {n}"))
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(0, size(_tk) - {n}), "
                f"i -> {h} % {MERSENNE_P}L))"
            ).alias("_hsh"),
        )
        .select(
            "doc_id",
            F.expr(
                f"array_join(transform(array({sig_elems}), "
                f"x -> CAST(x AS STRING)), '_')"
            ).alias("sig_key"),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Asymmetric near-dup: pairs whose n-gram CONTAINMENT
    C = |A∩B| / min(|A|, |B|) clears ``threshold``.

    Containment catches the case Jaccard structurally misses — a short
    document embedded verbatim inside a much longer one (boilerplate
    page wrapping an article, a quote-post containing the original):
    there J = inter/union shrinks with the size gap while C stays ~1.
    Same single-shuffle inverted-index shape as ngram_jaccard_pairs
    (sized postings computed once, merge-join on the shingle hash with
    ReusedExchange); at 100 TB swap in the df-capped posting stream
    exactly as ngram_jaccard_pairs_capped does.
    """
    posts = sized_shingle_postings(docs, n, text_col)
    a, b = posts.alias("a"), posts.hint("merge").alias("b")
    sized = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("a.n_sh").alias("na"),
            F.min("b.n_sh").alias("nb"),
        )
    )
    cont = F.col("inter").cast("double") / F.least("na", "nb")
    return (
        sized.withColumn("containment", F.round(cont, 6))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def exact_dedup_keep_best(
    docs: DataFrame, text_col: str = "text", group_expr=None
) -> DataFrame:
    """Dedup keeping the BEST copy per duplicate group — the copy with
    the most tokens (ties → minimum doc_id) — instead of blindly the
    minimum id. The argmax is a map-side-combining max of a
    (n_tokens, -doc_id) struct, so the skew-free single shuffle on the
    group key carries one struct per group per partition.

    GROUPER CHOICE IS WHAT MAKES THE RANKING MEANINGFUL. The default
    grouper (sha256 of whitespace-normalized text, as exact_dedup_groups)
    only ever groups byte-identical normalized copies, whose non-empty
    token counts are equal BY CONSTRUCTION — under it the argmax
    degenerates to min doc_id (a deterministic winner, nothing more).
    The truncated-scrape case production pipelines care about — keep the
    LONGEST near-identical copy — needs a FUZZY ``group_expr`` whose
    groups contain genuinely different texts: a simhash fingerprint
    (simhash_fingerprints), a minhash band key, or a URL/source id.
    Pass it as a Column; the output's text_hash column then carries that
    group key.
    """
    norm = F.regexp_replace(
        F.trim(F.expr(locale_free_lower_sql(text_col))), r"\s+", " "
    )
    grouper = group_expr if group_expr is not None else F.sha2(norm, 256)
    # count only NON-EMPTY tokens: split('\s+') keeps leading/trailing
    # empty strings, so a whitespace-padded copy would out-rank an
    # otherwise-identical clean copy and best_tokens would over-report
    tk = TOKENS_EXPR.format(col=text_col)
    n_tok = f"size(filter({tk}, x -> x != ''))"
    best = F.max(F.struct(F.col("n_tok"), (-F.col("doc_id")).alias("neg_id")))
    return (
        docs.select(
            F.col("doc_id"),
            grouper.alias("text_hash"),
            F.expr(n_tok).cast("long").alias("n_tok"),
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            best.alias("_best"),
        )
        .select(
            "text_hash",
            "n_copies",
            (-F.col("_best.neg_id")).cast("long").alias("best_id"),
            F.col("_best.n_tok").alias("best_tokens"),
        )
    )
