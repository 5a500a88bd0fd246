"""Text analysis operators: quality stats, token counting, language ID,
document fingerprinting.

Everything is built-in expressions (split / regexp / higher-order array
functions) — JVM codegen, no Python in the hot path. Each operator's
semantics are chosen to be replicable in ANSI/DuckDB SQL so the driver's
oracle can hash-match the output exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streambench_spark.llm.hashing import (
    MERSENNE_P,
    locale_free_lower_sql,
    spark_hash32,
)
from streambench_spark.llm.dedup import TOKENS_EXPR

# Small fixed stopword list (English function words) used for the quality
# ratio; a production pipeline loads a per-language list as a broadcast dim.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

# Marker substrings per language for the n-gram heuristic language ID
# (TextCat-style profile matching, tiny fixed profiles). Scoring counts
# non-overlapping occurrences of each marker in the lowercased text.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der ", "die ", "und ", "ein ", "sch", "ich"),
    "en": ("the ", " and ", "ing ", " of ", " is "),
    "es": (" el ", " los ", "que ", " de ", "ción"),
    "fr": (" le ", " les ", " une ", " est ", "eau"),
    "zh": ("的", "是", "了", "在"),
}


def quality_kept(
    docs: DataFrame,
    *out_cols: str,
    text_col: str = "text",
    min_chars: int = 100,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_distinct_ratio: float = 0.2,
) -> DataFrame:
    """The canonical corpus-quality filter: keep documents with
    chars >= min_chars, min_tokens <= tokens <= max_tokens, and
    distinct-token ratio >= min_distinct_ratio. Pure scan + filter,
    predicates in codegen; shared by the quality_filter and
    corpus_clean_pipeline registry queries."""
    tk = TOKENS_EXPR.format(col=text_col)
    return (
        docs.withColumn("_n_tok", F.expr(f"size({tk})"))
        .withColumn("_n_dis", F.expr(f"size(array_distinct({tk}))"))
        .filter(
            (F.length(text_col) >= min_chars)
            & (F.col("_n_tok") >= min_tokens)
            & (F.col("_n_tok") <= max_tokens)
            & (F.col("_n_dis") * 1.0 / F.col("_n_tok") >= min_distinct_ratio)
        )
        .select(*out_cols)
    )


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: char/token counts, distinct-token count,
    stopword count, average token length.

    One narrow projection over the corpus — no shuffle at all. The single
    float (avg token length) is one division of two exact integers, so it
    is bit-identical in any engine."""
    tk = TOKENS_EXPR.format(col=text_col)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return docs.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(f"CAST(size({tk}) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST(size(array_distinct({tk})) AS BIGINT)").alias("n_distinct"),
        F.expr(
            f"CAST(size(filter({tk}, t -> array_contains(array({stop_list}), t))) AS BIGINT)"
        ).alias("n_stop"),
        F.round(
            F.expr(f"CAST(aggregate(transform({tk}, t -> length(t)), 0L, (a, v) -> a + v) AS DOUBLE)")
            / F.expr(f"size({tk})"),
            6,
        ).alias("avg_token_len"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-boundary token count.

    The BPE-ish count uses a GPT-2-flavored pre-tokenizer regex reduced to
    a portable core (letter runs | digit runs | single non-alnum): an
    upper bound on BPE token count that's cheap (one regexp scan) and a
    good length signal for training-data budgeting."""
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({TOKENS_EXPR.format(col=text_col)}) AS BIGINT)").alias(
            "n_ws_tokens"
        ),
        F.expr(
            rf"CAST(size(regexp_extract_all({locale_free_lower_sql(text_col)}, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS BIGINT)"
        ).alias("n_bpe_tokens"),
    )


def _occurrences(text_expr: str, marker: str) -> str:
    """SQL: count of non-overlapping occurrences of marker in text."""
    esc = marker.replace("'", "''")
    return f"CAST((length({text_expr}) - length(replace({text_expr}, '{esc}', ''))) / length('{esc}') AS BIGINT)"


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = total marker-substring occurrences
    per language profile; prediction = argmax score with a fixed
    tie-break order (profile iteration order).

    This is the classic fixed-profile n-gram classifier shape — scoring is
    a handful of replace/length scans fused in codegen. On synthetic
    shared-vocabulary corpora most documents tie at the English profile;
    the operator's value is its deterministic, oracle-checkable plumbing
    (swap in real profiles for real corpora)."""
    txt = locale_free_lower_sql(text_col)
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        total = " + ".join(_occurrences(txt, m) for m in markers)
        score_cols.append(F.expr(total).alias(f"score_{lang}"))
    scored = docs.select("doc_id", *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(F.col(f"score_{langs[0]}") == best, langs[0])
    for lang in langs[1:]:
        pred = pred.when(F.col(f"score_{lang}") == best, lang)
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best.alias("score")
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint of the token sequence:
    h = fold(tokens, 0, (acc, t) -> (acc * 31 + H32(t) mod P) mod P).

    Unlike the set-based MinHash/SimHash, this detects exact sequence
    identity (the "document fingerprint" used for train/test contamination
    checks). Left fold over the token array in codegen; acc < P = 2^31 so
    acc*31 stays far below the 63-bit signed limit."""
    h = spark_hash32("t")
    tk = TOKENS_EXPR.format(col=text_col)
    return docs.select(
        "doc_id",
        F.expr(
            f"aggregate(transform({tk}, t -> {h} % {MERSENNE_P}L), 0L,"
            f" (acc, hv) -> (acc * 31 + hv) % {MERSENNE_P}L)"
        ).alias("fingerprint"),
    )


def repetition_stats(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Within-document repetition metric (the Gopher-style quality rule
    "fraction of duplicate n-grams"): per doc, total n-gram count,
    distinct n-gram count, and the duplicate fraction rounded
    half-away-from-zero to 6 dp.

    Row-local: tokens → counts via higher-order expressions in codegen;
    ZERO shuffle, linear in corpus size — the shape that survives 100 TB
    untouched (a pure map over the scan)."""
    tk = TOKENS_EXPR.format(col=text_col)
    gram = ", ' ', ".join(f"tk[i + {j}]" for j in range(n))
    return (
        docs.select("doc_id", F.expr(tk).alias("tk"))
        .filter(F.expr(f"size(tk) >= {n}"))
        .select(
            "doc_id",
            F.expr(f"CAST(size(tk) - {n - 1} AS BIGINT)").alias("n_grams"),
            F.expr(
                f"CAST(size(array_distinct(transform(sequence(0, size(tk) - {n}), "
                f"i -> concat({gram})))) AS BIGINT)"
            ).alias("n_distinct"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                (F.col("n_grams") - F.col("n_distinct"))
                / F.col("n_grams").cast("double"),
                6,
            ),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text",
    skew_safe: bool = False,
) -> DataFrame:
    """Distinctive terms per document: the k tokens ranked by
    (tf DESC, df ASC, term ASC) — term frequency high, document frequency
    low, i.e. TF-IDF ordering made integer-exact (no float idf, so the
    ranking is bit-identical across engines; ties broken totally).

    Scale shape: the corpus is scanned and tokenized ONCE into
    (doc_id, term, tf); df comes from a count window over `term` on
    that same table — NOT a self-join back onto a re-derived tf (the
    r08 review found the join form re-ran the whole scan+explode+agg
    pipeline twice: the two references to the lazy `tf` compile to
    different exchange children, so Catalyst's ReusedExchange never
    fires). The window costs one exchange of the aggregated tf table
    by `term`. The final top-k is a window over doc_id where
    WindowGroupLimit pushes a partial limit below the exchange.

    HOT-KEY CAVEAT (r08 advice): a count window hashes every row of one
    `term` into ONE window partition, which a single task must sort and
    buffer — and AQE's skew-join splitting has no window equivalent. On
    a Zipfian web corpus a stopword's partition is ~n_docs rows, so at
    the 100 TB scale the default plan straggles on 'the'. `skew_safe=
    True` switches to the join plan built for that regime: materialize
    tf once (persist — the r08 finding above is why an unpersisted
    self-reference would re-scan the corpus; the ContextCleaner drops
    the cache when the plan is GC'd), partially-aggregate df per term
    (map-side combine makes the hot key one row per map partition, so
    the df shuffle is skew-free), lazily localCheckpoint the tiny df
    table, and join it back — a shuffle join AQE genuinely skew-splits
    (plan-proven: `skew=true` on the executed join; the checkpoint is
    required — r10 measured that OptimizeSkewedJoin's Sort-over-stage
    pattern never matches when the counts side still carries its final
    HashAggregate, leaving the hot term one unsplittable task).
    OPERATIONAL CAVEAT (ADVICE r10): localCheckpoint truncates lineage
    into EXECUTOR-LOCAL storage — the checkpointed df partitions do not
    survive executor loss, so on a real cluster any lost executor
    (routine at 1000 nodes; guaranteed under dynamic-allocation
    decommission) fails the job loudly. With skew_safe=True either
    disable dynamic allocation or enable
    spark.shuffle.service / decommission block migration so executors
    are not reclaimed mid-job; reliable `checkpoint()` to HDFS is the
    alternative when executor churn is expected.
    Same output bit-for-bit (tested); measured at
    sf0.1/local[32] post-fix the two are at parity (0.83 s window vs
    0.78 s twin, median-of-3 — no hot key at that scale), and on a
    hot-key corpus the twin is 2.4x faster at 2M docs with 0.70x the
    exchange volume (SCALE.md r10). The window stays the default and
    benched plan: it needs no cache/checkpoint state."""
    from pyspark.sql.window import Window

    tk = TOKENS_EXPR.format(col=text_col)
    tf = (
        docs.select("doc_id", F.explode(F.expr(tk)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    if skew_safe:
        tf = tf.persist()
        # the lazy localCheckpoint is LOAD-BEARING for the skew escape:
        # AQE's OptimizeSkewedJoin pattern-matches a join whose children
        # are Sort directly over a shuffle stage, and the counts side
        # would otherwise carry its FINAL HashAggregate between the two
        # — the rule never matches and the hot term's join partition
        # stays one unsplittable task (measured r10: plain sides split
        # with skew=true, aggregate sides never do). Truncating the
        # tiny per-term counts to a checkpointed scan restores the
        # pattern; eager=False keeps the return fully lazy.
        dfc = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .localCheckpoint(eager=False)
        )
        with_df = tf.join(dfc, "term")
    else:
        with_df = tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
    return (
        with_df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", "rn")
    )


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    consecutive chunks of <= chunk_tokens whitespace tokens — the
    document→training-example step of an LLM data pipeline (complement of
    pack_sequences, which groups whole short docs; chunking splits long
    ones).

    Plan shape: narrow map only — tokenize once, explode a CHEAP index
    sequence (0..n_chunks-1), then slice the token array per output row
    (the explode-cheap-index pattern, see dedup.shingle_postings: never
    explode an expensive computed array). Zero shuffle, zero Python;
    embarrassingly parallel at any scale. Deterministic: chunk boundaries
    are a pure function of the token count.
    """
    tk = TOKENS_EXPR.format(col=text_col)
    return (
        docs.select(key_col, F.expr(tk).alias("_tk"))
        .withColumn(
            "_j",
            F.explode(
                F.expr(
                    f"sequence(0, CAST(ceil(size(_tk) / {chunk_tokens}.0) AS INT) - 1)"
                )
            ),
        )
        .withColumn("chunk_idx", F.col("_j").cast("long"))
        .select(
            key_col,
            "chunk_idx",
            F.expr(
                f"array_join(slice(_tk, chunk_idx * {chunk_tokens} + 1, "
                f"{chunk_tokens}), ' ')"
            ).alias("chunk_text"),
            F.expr(
                f"CAST(size(slice(_tk, chunk_idx * {chunk_tokens} + 1, "
                f"{chunk_tokens})) AS BIGINT)"
            ).alias("n_tokens"),
        )
    )


def chunk_docs_udtf(
    docs: DataFrame,
    chunk_tokens: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Python UDTF twin of chunk_docs — the Spark 4 user-defined table
    function surface (one input row → many output rows from imperative
    Python), applied LATERAL per document. Semantics identical to
    chunk_docs (tested); the builtin-expression version is the hot path —
    this exists to cover the UDTF API for operators whose row-expansion
    logic outgrows SQL expressions (real tokenizers, format parsers).
    """
    import re
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_text string, n_tokens bigint")
    class _Chunker:
        def eval(self, text: str):
            if text is None:
                # match chunk_docs: a NULL text produces no chunks (its
                # split/sequence goes NULL and explode drops the row) —
                # previously this raised AttributeError and failed the
                # whole job (r08 review)
                return
            # re.ASCII: Java's \s (the chunk_docs twin) is ASCII-only;
            # Python's default \s also splits on U+00A0 etc., which
            # would diverge on non-ASCII whitespace
            toks = re.split(r"\s+", text.lower(), flags=re.ASCII)
            for j in range(0, max(1, -(-len(toks) // chunk_tokens))):
                part = toks[j * chunk_tokens:(j + 1) * chunk_tokens]
                yield j, " ".join(part), len(part)

    spark = docs.sparkSession
    # uuid-suffixed names: fixed session-global names race under
    # concurrent callers (another thread's createOrReplaceTempView could
    # swap the input between registration and analysis)
    tag = uuid.uuid4().hex[:12]
    name = f"sb_chunker_{tag}"
    view = f"sb_chunk_in_{tag}"
    spark.udtf.register(name, _Chunker)
    docs.select(key_col, text_col).createOrReplaceTempView(view)
    out = spark.sql(
        f"SELECT i.{key_col}, c.chunk_idx, c.chunk_text, c.n_tokens "
        f"FROM {view} i, LATERAL {name}(i.{text_col}) c"
    )
    # analysis is eager (the UDTF object and the view's plan are bound
    # into `out` above) — drop the uuid-named catalog entries so
    # repeated calls in a long-lived session don't accumulate one dead
    # function + one plan-pinning temp view per call (r08 review)
    spark.catalog.dropTempView(view)
    spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
    return out


# PII scrubbing ------------------------------------------------------------

# Pattern set kept to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle evaluates the identical automaton: no backrefs, no lookaround.
# (?i) is in that subset (both engines fold ASCII a-z identically); without
# it `Alice@Example.COM` and `HTTPS://` were neither counted nor redacted
# (r08 verdict order). Case-folding only matters where a class contains
# letters (email, url); on the digits-and-hyphen phone pattern (?i) is a
# semantic no-op kept purely for pattern-set uniformity (ADVICE r09) — the
# oracle is generated from these tuples, so the strings stay frozen.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"(?i)[a-z0-9._]+@[a-z0-9.]+[a-z]", "<EMAIL>"),
    ("url", r"(?i)https?://[a-z0-9./_-]+", "<URL>"),
    ("phone", r"(?i)[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / URLs / phone numbers and report per-doc counts.

    The standard pre-training scrub pass: a fixed chain of regexp
    redactions evaluated in one codegen stage over the scan — no shuffle,
    no Python. Patterns apply in declaration order (emails first, so an
    address is one <EMAIL>, not a <URL> with a dangling local part).
    Counts are measured per pattern on the ORIGINAL text: where patterns
    overlap (an email embedded in a URL), a later pattern's count can
    differ from the replacements actually applied to the progressively-
    scrubbed text — treat them as per-pattern occurrence stats, not a
    redaction ledger.
    """
    counts = [
        F.expr(
            f"CAST(size(regexp_extract_all({text_col}, '{pat}', 0)) AS BIGINT)"
        ).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(
        "doc_id",
        *counts,
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def chunk_docs_overlap(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping context-window chunking (stride < chunk_tokens): the
    standard LLM pattern where consecutive chunks share chunk_tokens −
    stride tokens so no span is ever split across a boundary it cannot
    see. Chunk j covers tokens [j·stride, j·stride + chunk_tokens);
    n_chunks = 1 for short docs else ceil((n − chunk)/stride) + 1 — the
    last chunk may be short but always starts within the document.

    Same plan shape as chunk_docs: explode a cheap index sequence, slice
    per row — zero shuffle, zero Python.
    """
    tk = TOKENS_EXPR.format(col=text_col)
    n_chunks = (
        f"CASE WHEN size(_tk) <= {chunk_tokens} THEN 1 "
        f"ELSE CAST(ceil((size(_tk) - {chunk_tokens}) / {stride}.0) AS INT) + 1 END"
    )
    return (
        docs.select(key_col, F.expr(tk).alias("_tk"))
        .withColumn("_j", F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")))
        .withColumn("chunk_idx", F.col("_j").cast("long"))
        .select(
            key_col,
            "chunk_idx",
            F.expr(
                f"array_join(slice(_tk, chunk_idx * {stride} + 1, "
                f"{chunk_tokens}), ' ')"
            ).alias("chunk_text"),
            F.expr(
                f"CAST(size(slice(_tk, chunk_idx * {stride} + 1, "
                f"{chunk_tokens})) AS BIGINT)"
            ).alias("n_tokens"),
        )
    )


def adjacent_pair_counts(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies, top-k — the inner
    loop of a BPE/WordPiece tokenizer trainer (each merge round picks the
    most frequent adjacent pair; this operator is that counting step over
    the whole corpus).

    Plan shape: tokenize once per document (narrow), explode a CHEAP
    guarded index sequence (never a computed pair array — the
    explode-cheap-index pattern, see chunk_docs), derive each pair by
    element lookup in the same stage, then ONE shuffle for the pair
    count with map-side partials; top-k is TakeOrderedAndProject
    (per-partition heaps). Deterministic total order: count DESC then
    pair ASC."""
    tk = TOKENS_EXPR.format(col=text_col)
    return (
        docs.select(F.expr(tk).alias("_tk"))
        .select(
            "_tk",
            F.explode(
                F.expr(
                    "CASE WHEN size(_tk) >= 2 THEN sequence(0, size(_tk) - 2) "
                    "ELSE array() END"
                )
            ).alias("_i"),
        )
        .select(F.expr("concat(_tk[_i], ' ', _tk[_i + 1])").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


# Stop-word set for the Gopher-style presence rule (Rae et al. 2021,
# "Scaling Language Models: ..." — the published filter requires >= 2 of a
# small English function-word list to appear in the document).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Ratio thresholds cross-multiplied into integer comparisons — exact in
# any engine; the SQL text is valid in both Spark and DuckDB, so the
# registry oracle interpolates THIS dict instead of keeping a copy that
# could drift when a threshold is tuned.
GOPHER_RULES = {
    "r_word_count": "n_words BETWEEN 50 AND 100000",
    "r_mean_word_len": "3 * n_words <= sum_len AND sum_len <= 10 * n_words",
    "r_symbol_ratio": "10 * n_sym < n_words",
    "r_bullet_lines": "10 * n_bullet < 9 * n_lines",
    "r_ellipsis_lines": "10 * n_ell < 3 * n_lines",
    "r_alpha_words": "5 * n_alpha >= 4 * n_words",
    "r_stopwords": "n_stop >= 2",
}


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-quality rules, one 0/1 flag per rule.

    Published web-corpus heuristics (Rae et al. 2021, table A1):
    word count in [50, 100000]; mean word length in [3, 10]; symbol-to-
    word ratio ('#'/'...') < 0.1; < 90% of lines bullet-started; < 30%
    of lines ellipsis-ended; >= 80% of words contain an alphabetic
    character; >= 2 distinct stop words present. Emitting the per-rule
    flags (not just the conjunction) is what pipeline debugging needs:
    aggregate the flags to see which rule eats the corpus.

    Every ratio threshold is cross-multiplied into an integer comparison
    (e.g. 10 * n_sym < n_words), so the predicate is exact in any engine
    — no float thresholds to drift. Single scan, all flags in whole-stage
    codegen; at 100 TB this is the same one-pass shape as quality_kept.
    """
    tk = TOKENS_EXPR.format(col=text_col)
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    measured = docs.selectExpr(
        "doc_id",
        f"{tk} AS tk",
        rf"split({text_col}, '\n') AS ln",
        # '#' occurrences + non-overlapping '...' occurrences
        f"(length({text_col}) - length(replace({text_col}, '#', ''))) "
        f"+ (length({text_col}) - length(replace({text_col}, '...', ''))) DIV 3 "
        "AS n_sym",
    ).selectExpr(
        "doc_id",
        "size(tk) AS n_words",
        "aggregate(tk, 0L, (a, x) -> a + length(x)) AS sum_len",
        "size(filter(tk, x -> x rlike '[a-z]')) AS n_alpha",
        f"size(array_intersect(array_distinct(tk), array({stop_arr}))) AS n_stop",
        "size(ln) AS n_lines",
        "size(filter(ln, l -> startswith(l, '- ') OR startswith(l, '* '))) AS n_bullet",
        "size(filter(ln, l -> endswith(l, '...'))) AS n_ell",
        "n_sym",
    )
    rules = GOPHER_RULES
    keep = " AND ".join(f"({c})" for c in rules.values())
    return measured.selectExpr(
        "doc_id",
        "CAST(n_words AS BIGINT) AS n_words",
        *[f"CAST({cond} AS BIGINT) AS {name}" for name, cond in rules.items()],
        f"CAST({keep} AS BIGINT) AS keep",
    )


def bigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", skew_safe: bool = False
) -> DataFrame:
    """Per-document average bigram log-likelihood under a corpus-trained
    add-one-smoothed bigram model — the classic LM-based quality score
    (docs whose word transitions are improbable under the corpus score
    low: boilerplate, lorem-ipsum, shuffled text).

    Model: P(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), with both counts
    and the vocabulary size V exact integers aggregated from the same
    corpus being scored. Determinism: each term is ln of one exact
    integer ratio, and the per-doc sum is a LEFT FOLD over terms in
    bigram-position order (collect → array_sort → aggregate), the
    deterministic-float-fold pattern — an unordered SUM of doubles would
    drift with partitioning.

    Scale shape: bigram extraction is the cheap-index explode (no
    expensive computed array below the generator), and the corpus is
    tokenized into the bigram stream ONCE: c12 and c1 are COUNT WINDOWS
    over (w1, w2) and (w1) on that stream — not bigram-keyed aggregates
    joined back onto a re-derived stream (the r08 review found the join
    form re-ran the scan→split→explode pipeline three times plus once
    for V: four corpus passes; the two windows cost two exchanges of
    the bigram stream, which the non-broadcast joins paid anyway — a
    web-scale bigram vocabulary is corpus-sized, the tfidf_top_terms
    lesson). V keeps its own unigram scan: it counts tokens of
    single-token documents too, which never enter the bigram stream.
    The scalar V is a 1-row cross join. Per-doc state in the fold is
    the doc's own bigram list — bounded by document length.

    HOT-KEY CAVEAT (r08 advice): the c1 window hashes every stream row
    whose w1 is a stopword into ONE unsplittable window partition —
    here over the RAW positioned stream, so the hot partition is a
    corpus-scale fraction of ALL bigrams, worse than tfidf's aggregated
    case, and AQE cannot split a window. `skew_safe=True` switches to
    the 100 TB plan: persist the bigram stream once (single scan), fold
    c12/c1 into tiny per-key count tables via map-side partial
    aggregation (the hot key collapses to one row per map partition),
    lazily localCheckpoint them, and attach them with shuffle joins AQE
    genuinely skew-splits (plan-proven `skew=true`; the checkpoints are
    required — see tfidf_top_terms and SCALE.md r10; the same
    executor-loss caveat applies: localCheckpoint data is executor-local
    and does not survive executor loss — disable dynamic allocation or
    use reliable checkpointing when running skew_safe on a churning
    cluster, per ADVICE r10). Output is
    bit-identical (tested): lp depends only on (w1, w2) counts and the
    per-doc left-fold order never changes. Measured at sf0.1/local[32]
    post-fix the window form is ~1.2x faster (0.98 s vs 1.19 s,
    median-of-3 — the cache/checkpoint writes dominate when no key is
    hot), while on a hot-key corpus the twin is 2.3x faster at 2M docs
    (SCALE.md r10), so the window stays the default and benched plan
    for organic corpora.
    """
    from pyspark.sql.window import Window

    tk = TOKENS_EXPR.format(col=text_col)
    bi = (
        docs.select("doc_id", F.expr(tk).alias("tk"))
        .filter(F.expr("size(tk) >= 2"))
        .select(
            "doc_id", "tk",
            F.explode(F.expr("sequence(0, size(tk) - 2)")).alias("pos"),
        )
        .select(
            "doc_id", "pos",
            F.expr("tk[pos]").alias("w1"), F.expr("tk[pos + 1]").alias("w2"),
        )
    )
    v = (
        docs.select(F.explode(F.expr(tk)).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    if skew_safe:
        bi = bi.persist()
        # lazy localCheckpoints are LOAD-BEARING (see tfidf_top_terms):
        # without them the count tables' final HashAggregates defeat
        # OptimizeSkewedJoin's Sort-over-stage pattern match and the hot
        # w1's join partition stays one unsplittable task — exactly the
        # straggler this knob exists to avoid (measured r10)
        c12 = (
            bi.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c12"))
            .localCheckpoint(eager=False)
        )
        c1 = (
            bi.groupBy("w1")
            .agg(F.count(F.lit(1)).alias("c1"))
            .localCheckpoint(eager=False)
        )
        counted = bi.join(c12, ["w1", "w2"]).join(c1, ["w1"])
    else:
        counted = bi.withColumn(
            "c12", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
        ).withColumn("c1", F.count(F.lit(1)).over(Window.partitionBy("w1")))
    terms = (
        counted.crossJoin(F.broadcast(v))
        .select(
            "doc_id", "pos",
            F.expr("ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))").alias("lp"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, lp))), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x.lp)"
            ).alias("_s"),
        )
        .select(
            "doc_id", "n_bigrams",
            F.round(F.col("_s") / F.col("n_bigrams"), 6).alias("avg_logp"),
        )
    )
