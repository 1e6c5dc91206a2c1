"""Portable hash primitives shared by the dedup/similarity operators.

``portable_hash60(expr)`` = the first 15 hex chars of md5 as a non-negative
60-bit BIGINT. md5 is bit-identical across Spark (JVM) and DuckDB, so every
operator built on it has an exact SQL oracle:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(CONCAT('0x', SUBSTR(md5(x), 1, 15)) AS BIGINT)

At 60 bits, birthday collisions stay ≪1 for ~10^8 distinct keys per use
site (shingles of one doc, tokens of one doc), and since it is only used
for sketching (MinHash perms, SimHash bit votes, LSH band keys) a rare
collision degrades recall, never correctness of the exact verify step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column) -> Column:
    """Non-negative 60-bit integer hash of a string column (md5-based)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB rendering of the same hash, for oracle SQL strings."""
    return f"CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 15)) AS BIGINT)"


def permuted_hash(col: Column, perm: int) -> Column:
    """The ``perm``-th independent hash function: hash of 'perm:value'."""
    return portable_hash60(F.concat(F.lit(f"{perm}:"), col))


def permuted_hash_sql(expr: str, perm: int) -> str:
    return portable_hash60_sql(f"CONCAT('{perm}:', {expr})")


# -- universal-hash family over one md5 base hash ------------------------------
#
# MinHash needs P independent hash functions per shingle; P md5 calls per
# shingle dominates signature cost (measured 16× md5 ≈ 40s at sf0.1). The
# standard fix: ONE 32-bit md5-derived base hash h0, then
# ``h_p = (a_p·h0 + b_p) mod M31`` (Carter-Wegman universal hashing) — pure
# integer arithmetic that Spark and DuckDB evaluate bit-identically, with
# products bounded < 2^63 so BIGINT math never overflows.

M31 = 2_147_483_647  # 2^31 − 1 (prime)


def _perm_coeffs(perm: int) -> tuple[int, int]:
    """Deterministic (a, b), a odd and nonzero, derived from the perm index
    via Python's own md5 — fixed constants, identical in the SQL mirror."""
    import hashlib

    d = hashlib.md5(f"perm:{perm}".encode()).hexdigest()
    a = (int(d[:8], 16) % (M31 - 1)) + 1
    b = int(d[8:16], 16) % M31
    return a, b


def base_hash32(col: Column) -> Column:
    """32-bit base hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def base_hash32_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 8)) AS BIGINT)"


def universal_hash(h0: Column, perm: int) -> Column:
    a, b = _perm_coeffs(perm)
    return (h0 * F.lit(a) + F.lit(b)) % F.lit(M31)


def universal_hash_sql(h0_expr: str, perm: int) -> str:
    a, b = _perm_coeffs(perm)
    return f"(({h0_expr}) * {a} + {b}) % {M31}"
