"""Pin the JVM-locale-independence of text lowering (r15 find).

Spark's plain ``lower()`` lowercases all-ASCII strings byte-wise but
falls back to ``String.toLowerCase()`` — the JVM DEFAULT locale — when
the string contains any non-ASCII byte. Under a Turkish host locale
that turns every capital I into dotless ``ı`` in any document that also
carries an accent, CJK, or emoji — diverging from the DuckDB oracle
(and from every other host) in every lower()-based text plan. Two-layer
fix, both pinned here:

1. Plan layer (primary — survives the driver's BARE sessions):
   ``hashing.locale_free_lower_sql`` routes lowering through the
   UNICODE collation (ICU root, locale-free) and casts back to
   UTF8_BINARY so grouping/joins/hashes stay binary.
2. Session layer (defense-in-depth): ``get_spark`` pins
   ``-Duser.language=en -Duser.country=US`` into
   driver/executor extraJavaOptions; PySpark's gateway passes builder
   confs to spark-submit before the JVM launches, so the pin is live
   even in local client mode.

Also pins the KNOWN RESIDUE (locale-independent, documented in
locale_free_lower_sql): Spark applies full Unicode lowercasing
(context-aware final sigma, İ → i+combining-dot) while DuckDB's
utf8proc applies simple 1:1 folding — divergent only on corpora
containing those codepoints, which the frozen tables and fuzz fixtures
exclude.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from streambench_spark.llm.dedup import tokens_col  # noqa: E402
from streambench_spark.llm.hashing import locale_free_lower_sql  # noqa: E402

TRIGGER = "CAFÉ IN ISTANBUL"  # non-ASCII byte + capital I = the slow path


def test_locale_free_lower_matches_oracle_on_trigger_text(spark):
    df = spark.createDataFrame([(TRIGGER,)], ["text"])
    row = df.select(
        F.expr(locale_free_lower_sql("text")).alias("lo"),
        tokens_col("text").alias("tk"),
        F.lower("text").alias("plain"),
    ).collect()[0]
    want = duckdb.sql("select lower('CAFÉ IN ISTANBUL')").fetchone()[0]
    assert row.lo == want == "café in istanbul"
    assert row.tk == ["café", "in", "istanbul"]
    # session-layer pin: the engine session's JVM locale is en, so even
    # plain lower agrees here (bare sessions rely on layer 1 instead)
    assert row.plain == "café in istanbul"


def test_locale_free_lower_keeps_binary_collation(spark):
    # the cast must drop the UNICODE collation: composed vs decomposed
    # 'é' are canonically equivalent (equal under UNICODE) but must stay
    # DISTINCT group keys, matching the oracle's binary grouping
    composed, decomposed = "café", "café"
    df = spark.createDataFrame([(composed,), (decomposed,)], ["text"])
    n = (
        df.select(F.expr(locale_free_lower_sql("text")).alias("lo"))
        .groupBy("lo")
        .count()
        .count()
    )
    assert n == 2


def test_known_residue_full_vs_simple_folding(spark):
    # documents the fixed divergence set vs DuckDB's simple folding; if
    # either engine changes behavior, this pin flags the contract shift
    df = spark.createDataFrame([("ΑΣ",), ("İ",)], ["text"])
    got = {
        r.text: r.lo
        for r in df.select(
            "text", F.expr(locale_free_lower_sql("text")).alias("lo")
        ).collect()
    }
    assert got["ΑΣ"] == "ας"  # Spark: context-aware final sigma
    assert got["İ"] == "i̇"  # Spark: expansion to i + combining dot
    assert duckdb.sql("select lower('ΑΣ')").fetchone()[0] == "ασ"
    assert duckdb.sql("select lower('İ')").fetchone()[0] == "i"


def test_bare_session_under_turkish_locale_subprocess():
    """Layer-1 proof: a BARE session (no get_spark pin) on a Turkish-JVM
    host lowercases the trigger text wrongly with plain lower() and
    correctly with locale_free_lower_sql — the driver-gate scenario."""
    code = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from streambench_spark.llm.hashing import locale_free_lower_sql
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame([("CAF\\u00c9 IN ISTANBUL",)], ["text"])
r = df.select(F.lower("text").alias("plain"),
              F.expr(locale_free_lower_sql("text")).alias("lo")).collect()[0]
assert r.plain == "caf\\u00e9 \\u0131n \\u0131stanbul", repr(r.plain)
assert r.lo == "caf\\u00e9 in istanbul", repr(r.lo)
print("BARE_TR_OK")
""".format(repo=REPO)
    env = dict(
        os.environ,
        JAVA_TOOL_OPTIONS="-Duser.language=tr -Duser.country=TR",
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "BARE_TR_OK" in proc.stdout
