"""Dataset assembly operators: deterministic splits, stratified sampling,
and benchmark decontamination.

The last mile of a training-data pipeline (after cleaning + dedup) is
assembling the actual dataset: carve train/val/test, enforce per-language
or per-source mixture quotas, and remove documents that leak evaluation
benchmarks. All three are corpus-scale operations that must be
DETERMINISTIC — re-running the pipeline on the same corpus must produce
the same dataset (no ``rand()``, no partition-order dependence), or
training runs are not reproducible.

Spark-first shapes:

- hash split         : pure projection (zero shuffle) — the split of a
                       document is a function of its key alone, so it is
                       stable under re-partitioning, incremental ingest,
                       and corpus growth.
- rate sample        : pure filter (zero shuffle), per-stratum rates via
                       a broadcast-joined quota dim — the 100 TB path.
- exact-quota sample : per-stratum deterministic top-n (one shuffle on
                       the stratum key). Exact counts, but a hot stratum
                       concentrates on one partition — use the rate
                       variant when strata are huge.
- decontamination    : n-gram postings semi-join — flags training docs
                       sharing any length-n word n-gram with a benchmark
                       set. Never a pairwise product: the join is an
                       equi-join on the 8-byte n-gram hash, and only the
                       (tiny) benchmark side is collected into distinct
                       hashes.
- sequence packing   : per-partition exclusive prefix sum over a total
                       key order (one shuffle on the partition column,
                       local sort only — no global order).
- epoch upsampling   : broadcast copies dim + sequence explode (repeat
                       rare strata; the corpus is read once, zero
                       shuffle).

Hashing is the portable md5-based H32 (llm/hashing.py) so the DuckDB
oracles reproduce every assignment bit-for-bit; swap xxhash64 at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streambench_spark.llm.dedup import TOKENS_EXPR, shingle_postings
from streambench_spark.llm.hashing import spark_hash32


def with_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    buckets: int = 100,
    hash_mode: str = "md5",
) -> DataFrame:
    """Attach `bucket` (H32(key) mod buckets) and `split`
    ('train' | 'val' | 'test') columns.

    The assignment depends only on the key's hash — documents keep their
    split when the corpus is re-partitioned, re-ordered, or appended to,
    which is the property that makes incremental dataset builds safe
    (a doc can never migrate from test into train between runs). Zero
    shuffle: evaluated in codegen during the scan's projection.
    """
    h = spark_hash32(f"CAST({key_col} AS STRING)", mode=hash_mode)
    bucket = F.expr(f"{h} % {buckets}")
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return docs.withColumn("bucket", bucket).withColumn("split", split)


def stratified_rate_sample(
    docs: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    buckets: int = 100,
    salt: str = "",
    hash_mode: str = "md5",
    on_missing: str = "drop",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli-style sampling: keep a document
    iff H32(salt || key) mod buckets < rate[stratum]. ``rates`` maps
    stratum value to a per-cent keep rate (0..buckets).

    ``on_missing`` names the fate of documents whose stratum value is
    absent from ``rates`` (r08 review: the old inner join deleted them
    silently — a corpus growing a new lang after the dict was written
    vanished from the mix with no error): "drop" (default — the original
    behavior, now stated), "keep" (rate = buckets, pass through), or
    "error" (fail the job on the first unmapped stratum).

    This is the 100 TB mixture-weighting path: the rates table is a tiny
    broadcast dim (one row per language/source), the decision is a
    row-local hash compare, and the plan is scan → broadcast join →
    filter with NO shuffle of the corpus. Expected counts only (exact to
    ±binomial noise); use stratified_topn_sample for exact quotas.

    ``salt`` decorrelates the draw from OTHER hash-of-key decisions in
    the same pipeline — composing an unsalted sample after the
    with_split train filter would intersect two `H(key) mod 100 < t`
    conditions on the SAME hash, collapsing to min(t1, t2) instead of
    an independent sub-sample.
    """
    spark = docs.sparkSession
    rates_df = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in rates.items()],
            f"{stratum_col} string, _rate int",
        )
    )
    key = f"CAST({key_col} AS STRING)"
    # '' doubling: the salt is caller data, not SQL — a quote inside it
    # must not terminate the literal
    s = salt.replace("'", "''") if salt else salt
    h = spark_hash32(f"concat('{s}', {key})" if salt else key, mode=hash_mode)
    joined = _join_stratum_dim(
        docs, rates_df, stratum_col, "_rate", on_missing,
        default=F.lit(buckets),
    )
    return (
        joined
        .filter(F.expr(f"{h} % {buckets}") < F.col("_rate"))
        .drop("_rate")
    )


def _join_stratum_dim(
    docs: DataFrame, dim: DataFrame, stratum_col: str, val_col: str,
    on_missing: str, default,
) -> DataFrame:
    """Broadcast stratum-dim join with an explicit unmapped-stratum
    policy: "drop" (inner join — the historical behavior), "keep" (left
    join, ``default`` for unmapped), "error" (left join, job fails on
    the first unmapped value)."""
    if on_missing == "drop":
        return docs.join(dim, stratum_col)
    if on_missing not in ("keep", "error"):
        raise ValueError(
            f"on_missing must be drop|keep|error, got {on_missing!r}"
        )
    out = docs.join(dim, stratum_col, "left")
    if on_missing == "error":
        # raise_error directly in the lazily-evaluated when() branch — the
        # old assert_true(col IS NOT NULL) inside the col-IS-NULL branch
        # was correct but relied on the optimizer never folding a
        # trivially-false assertion condition through the branch (r08
        # advice); the dedicated error expression has no condition to fold
        return out.withColumn(
            val_col,
            F.when(
                F.col(val_col).isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(f"stratum value unmapped in {val_col} dim: "),
                        F.col(stratum_col),
                    ),
                ).cast(dim.schema[val_col].dataType),
            ).otherwise(F.col(val_col)),
        )
    return out.withColumn(val_col, F.coalesce(F.col(val_col), default))


def stratified_topn_sample(
    docs: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    hash_mode: str = "md5",
) -> DataFrame:
    """Exact-quota stratified sample: the n_per_stratum documents with the
    smallest (H32(key), key) per stratum. Hash-ordering makes the quota a
    uniform random-but-deterministic draw; the key tie-break makes it
    total (H32 collisions cannot make the result ambiguous).

    One shuffle on the stratum key + a per-stratum sort. Strata are
    processed in parallel, but a single stratum lands on one partition —
    exact quotas fundamentally need a per-stratum global order. For
    quotas where n is small relative to stratum size, rank via
    row_number is the right tool; Spark's window TopK pushes a partial
    limit below the exchange (WindowGroupLimit), so the shuffle carries
    ~n rows per stratum per map partition, not the whole stratum.
    """
    from pyspark.sql.window import Window

    h = spark_hash32(f"CAST({key_col} AS STRING)", mode=hash_mode)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.expr(h).asc(), F.col(key_col).asc())
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def contaminated_docs(
    train_docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: (doc_id, n_shared) for every training
    document sharing >= 1 word n-gram with the benchmark set, with the
    count of distinct shared n-gram hashes.

    The standard eval-leakage check (n = 8..13 word n-grams). Shape:
    benchmark n-gram hashes are deduplicated (distinct over the bench
    postings — benchmarks are small, but this stays distributed, nothing
    collects to the driver) and broadcast; the training postings stream
    RAW (distinct=False) into the broadcast hash join, so the corpus side
    is scan → explode → hash → broadcast-probe with NO shuffle. Per-doc
    n-gram multiplicity is collapsed AFTER the join — count(DISTINCT h)
    over only the matched rows, which are benchmark-overlap-sized, a
    vanishingly small fraction of the corpus.
    """
    train_posts = shingle_postings(train_docs, n, text_col, distinct=False)
    bench_grams = F.broadcast(
        shingle_postings(bench_docs, n, text_col).select("h").distinct()
    )
    return (
        train_posts.join(bench_grams, "h")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("h")).alias("n_shared"))
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    part_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy deterministic sequence packing: assign each document a
    (part, pack_id) so that consecutive documents (in key order, within a
    partition column) accumulate into packs of ~budget_tokens whitespace
    tokens. pack_id = floor(exclusive-prefix-sum(n_tokens) / budget).

    The streaming-append shape of LLM training-data packing: documents
    are packed within their partition (language here; date/shard in
    production), so the running sum is a per-partition window — each
    partition sorts locally after one shuffle, no global order. Documents
    longer than the budget occupy their own pack(s) without blocking the
    stream. Deterministic: (part, key) totally orders the fold.
    """
    from pyspark.sql.window import Window

    tk = TOKENS_EXPR.format(col=text_col)
    w = (
        Window.partitionBy(part_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            key_col, part_col, F.expr(f"CAST(size({tk}) AS BIGINT)").alias("n_tokens")
        )
        .withColumn(
            "pack_id",
            (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget_tokens)
            .cast("long"),
        )
    )


def upsample_by_rate(
    docs: DataFrame,
    copies: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    on_missing: str = "drop",
) -> DataFrame:
    """Epoch-style deterministic upsampling: repeat each document
    copies[stratum] times, tagging each repeat with an epoch index
    (0-based). The mixture-weighting step that REPEATS rare data (vs
    stratified_rate_sample, which THINS common data).

    ``on_missing``: policy for documents whose stratum is absent from
    ``copies`` — "drop" (default, historical), "keep" (1 copy), or
    "error" (see stratified_rate_sample; r08 review).

    Broadcast the copies dim, explode a sequence — output grows by the
    repeat factor but the input is read once and never shuffles; epoch
    tags keep downstream shuffles well-distributed (the repeats of one
    doc are distinguishable, so salting-by-epoch is free if needed).
    """
    spark = docs.sparkSession
    copies_df = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in copies.items()],
            f"{stratum_col} string, _n int",
        )
    )
    # sequence(0, -1) yields DESCENDING [0, -1], not empty — a 0-copies
    # stratum would emit TWO rows per doc instead of none without the
    # guard (same gotcha dedup._shingles_sql documents)
    epochs = F.expr(
        "CASE WHEN _n > 0 THEN sequence(0, _n - 1) "
        "ELSE CAST(array() AS ARRAY<INT>) END"
    )
    return (
        _join_stratum_dim(
            docs, copies_df, stratum_col, "_n", on_missing, default=F.lit(1)
        )
        .withColumn("epoch", F.explode(epochs))
        .withColumn("epoch", F.col("epoch").cast("long"))
        .drop("_n")
    )


def dataset_shuffle(
    docs, seed: str = "epoch0", key_col: str = "doc_id", checkpoint: bool = True,
    hash_mode: str = "md5",
):
    """Deterministic corpus shuffle: a dense training order 0..N-1 from
    the portable 32-bit hash of (key, seed) — re-seeding gives a fresh
    independent order per epoch without touching the data.

    Scale shape: delegates the dense enumeration to
    ``operators.relational.global_row_number`` (repartitionByRange on
    the hash → per-partition Arrow enumerate → broadcast cumulative
    offsets — the shared zipWithIndex pattern, ONE exchange on the data
    path, localCheckpoint-ed so the range sampler runs exactly once).
    An unpartitioned row_number window would serialize on one task;
    ties are impossible because the hash is salted with the unique key
    (key_col itself is the tiebreaker in the sort order).
    """
    from pyspark.sql import functions as F

    from streambench_spark.llm.hashing import spark_hash32
    from streambench_spark.operators.relational import global_row_number

    esc = seed.replace("'", "''")  # seed is data, not SQL
    h = spark_hash32(f"concat(CAST({key_col} AS STRING), '{esc}')", mode=hash_mode)
    hashed = docs.select(key_col, F.expr(h).alias("_h"))
    ranked = global_row_number(
        hashed,
        [F.asc("_h"), F.asc(key_col)],
        rank_col="_rn1",
        checkpoint=checkpoint,
    )
    return ranked.select(
        key_col, (F.col("_rn1") - 1).alias("shuffle_pos")
    )


def contamination_scores(
    train_docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc contamination FRACTION: shared distinct n-gram
    hashes / the doc's distinct n-gram hashes, for every training doc
    with >= n tokens (docs too short to form one n-gram carry no
    contamination evidence and are excluded, matching contaminated_docs).

    The scoring twin of contaminated_docs: where that op emits only the
    contaminated survivors (a filter), this emits a score for EVERY doc
    so the pipeline can threshold at will (0 = clean). Shape: the per-doc
    gram-set frame is one corpus pass (doc_shingle_sets); the overlap
    counts come from the broadcast-benchmark join of contaminated_docs;
    gluing them is a left join on doc_id — corpus-partitioned, no
    benchmark-side skew possible.
    """
    from streambench_spark.llm.dedup import doc_shingle_sets

    totals = doc_shingle_sets(train_docs, n, text_col).select(
        "doc_id", F.col("n_sh").cast("long").alias("n_grams")
    )
    shared = contaminated_docs(train_docs, bench_docs, n, text_col)
    return (
        totals.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_shared").cast("double") / F.col("n_grams"), 6),
        )
    )


def weighted_topn_sample(
    docs: DataFrame, n: int, weight_col: str, key_col: str = "doc_id",
    hash_mode: str = "md5",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws u in (0, 1] from the portable
    hash of its key and ranks by u^(1/weight); the global top-n IS a
    weighted sample without replacement. Deterministic — the "random"
    draw is a pure function of the key, so re-runs, retries, and the
    DuckDB oracle select the identical sample.

    Scale shape: the score is a row-local expression; selection is a
    global TopK (TakeOrderedAndProject — per-partition heaps of n rows,
    then an n-row merge on the driver side of the exchange), never a full
    sort. Keys whose scores tie (u = 1.0) break on the key itself.
    """
    from streambench_spark.llm.hashing import spark_hash32

    h = spark_hash32(f"CAST({key_col} AS STRING)", mode=hash_mode)
    score = F.expr(
        f"pow(({h} + 1) / 4294967296.0, 1.0 / {weight_col})"
    ).alias("_k")
    return (
        docs.select("*", score)
        .orderBy(F.desc("_k"), F.col(key_col).asc())
        .limit(n)
        .drop("_k")
    )
