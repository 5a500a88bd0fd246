"""LLM training-data pipeline operators (beyond the reference's surface).

The reference benchmark suite (lsds/StreamBench) exercises streaming
relational/windowed operators; a 100 TB training-data pipeline additionally
needs corpus-level operators: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard), similarity search over embeddings, text analysis
(tokenize / quality-score / lang-id / fingerprint), and multimodal binary
column plumbing. These are implemented Spark-first: built-in functions and
higher-order array expressions (JVM codegen, zero per-row Python), with
``mapInPandas`` only for the binary/feature-extraction path where external
codecs would run.

Shared design rule: every hash used here is *portable* (md5-prefix based)
so a DuckDB oracle can replicate results bit-for-bit — see ``hashing.py``.
"""
