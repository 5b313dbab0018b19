"""Reusable column expressions (JVM-side, whole-stage-codegen friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column) -> Column:
    """Engine-portable 32-bit hash: first 8 hex digits of md5, as a long.

    md5 is bit-identical across Spark, DuckDB, and Python hashlib — unlike
    xxhash64/murmur which differ per engine — so oracle queries can reproduce
    it exactly.  Used by minhash/simhash/LSH where the ORACLE must agree;
    internal-only partitioning uses the cheaper xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def words(col: Column) -> Column:
    """Whitespace tokenization shared by token-count/lang-id/dedup ops."""
    return F.split(F.trim(col), r"\s+")


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-gram word shingles as an array<string> (space-joined), built with
    JVM-side higher-order functions: transform over token index slices."""
    toks = words(col)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
