"""Portable deterministic hashing shared by the LLM operators.

Spark's builtin ``hash()``/``xxhash64()`` are fast but engine-specific; the
correctness oracles re-run every pipeline in DuckDB, so the token/shingle
hash must produce identical values in both engines. We use the first 8 hex
chars of md5 as a 32-bit hash — md5 is bit-identical everywhere, and the
hex-prefix → integer conversion exists as a builtin in both engines:

- Spark SQL : ``CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)``
- DuckDB    : ``CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)``

At 100 TB one would swap in ``xxhash64`` (cheaper, also JVM-side) — the
operators below take the hash expression as a parameter so that swap is a
one-liner; md5 is the default because it is oracle-checkable.

MinHash coefficients are derived from a fixed LCG so both the Spark plan
builder and the SQL oracle embed the *same* literals.
"""

from __future__ import annotations

# Modulus for minhash permutations: 2^31 - 1 (Mersenne prime). Keeping
# a, h < 2^31 bounds a*h < 2^62, safe in signed 64-bit in both engines
# (DuckDB raises on BIGINT overflow rather than wrapping).
MERSENNE_P = 2_147_483_647


def spark_hash32(expr: str) -> str:
    """Spark SQL expression: portable 32-bit hash of string expr."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def duck_hash32(expr: str) -> str:
    """DuckDB SQL expression computing the identical 32-bit hash."""
    return f"CAST('0x' || substring(md5({expr}), 1, 8) AS BIGINT)"


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a, b) pairs for h_j(x) = (a_j * x + b_j) mod P.

    Derived from a constant LCG walk (deterministic, no RNG state) so the
    same literals appear in the Spark expression tree and the oracle SQL.
    a_j is forced odd and non-zero.
    """
    coeffs = []
    state = 88172645463325252  # fixed seed, xorshift-style walk
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE_P - 2)) + 1
        if a % 2 == 0:
            a += 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_P
        coeffs.append((a, b))
    return coeffs
