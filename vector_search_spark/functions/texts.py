"""Portable text/hash column builders (pure Catalyst expressions).

Everything here is built from engine-portable primitives (``lower``,
regex split, ``md5``, hex→int, arithmetic) so the DuckDB correctness
oracle can reproduce each value bit-for-bit. In particular all hashing
is md5-derived — never ``F.hash``/``xxhash64`` (Spark-private) and never
Python ``hash`` (process-salted). md5 is cryptographically obsolete but
perfect here: stable, uniform, and available in every engine.

All builders return Column expressions → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "shingles",
    "h64",
    "h32",
    "norm_text",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def norm_text(c: Column | str) -> Column:
    """Normalized text for exact-dup hashing: lowercase, collapse runs of
    whitespace, trim. DuckDB twin: trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empties dropped.

    DuckDB twin: list_filter(string_split_regex(lower(x), '\\s+'), t -> t <> '')
    """
    return F.filter(F.split(F.lower(_col(c)), r"\s+"), lambda t: t != "")


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles of a token array, space-joined.

    Built by zipping the array with its n-1 shifted copies and joining
    each struct — n slice calls per DOCUMENT instead of one per shingle.
    (The obvious ``transform(sequence, i -> slice(toks, i, n))`` is
    O(len²) per doc under interpreted higher-order functions and was
    ~7x slower end-to-end at sf0.1.) arrays_zip pads the shorter shifted
    copies with NULL and concat_ws would silently drop them, so the
    result is sliced back to the len-n+1 genuine shingles.

    Documents shorter than ``n`` tokens yield an empty array.

    DuckDB twin:
      list_transform(range(1, greatest(len(t)-{n}+2, 1)),
                     i -> array_to_string(t[i:i+{n}-1], ' '))
    """
    sz = F.size(toks)
    shifted = [toks.alias("c0")] + [
        F.slice(toks, i + 1, sz).alias(f"c{i}") for i in range(1, n)
    ]
    z = F.arrays_zip(*shifted)
    joined = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"c{i}"] for i in range(n)])
    )
    # three-way branch: NULL input stays NULL (size(NULL) = -1 would
    # otherwise fall into the empty-array branch, diverging from the
    # DuckDB twin where len(NULL) propagates NULL)
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(sz >= n, F.slice(joined, 1, sz - (n - 1)))
        .otherwise(F.array().cast("array<string>"))
    )


def h64(c: Column | str) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    15 (not 16) so the value always fits a signed BIGINT on both engines.
    DuckDB twin: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(_col(c)), 1, 15), 16, 10).cast("bigint")


def h32(c: Column | str) -> Column:
    """Deterministic 32-bit integer hash: first 8 hex chars of md5.

    DuckDB twin: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(_col(c)), 1, 8), 16, 10).cast("bigint")


# DuckDB-side twins, for composing oracle SQL strings.
def sql_norm_text(x: str) -> str:
    return f"trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


def sql_tokens(x: str) -> str:
    return f"list_filter(string_split_regex(lower({x}), '\\s+'), t -> t <> '')"


def sql_shingles(t: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({t})-{n - 2}, 1)), "
        f"i -> array_to_string({t}[i:i+{n - 1}], ' '))"
    )


def sql_h64(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def sql_h32(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"
