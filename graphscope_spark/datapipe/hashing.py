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
