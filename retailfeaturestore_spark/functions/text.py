"""Text expression builders: tokenization, shingles, deterministic hashing.

All pure Column expressions over built-in functions — shingling and hashing
run inside whole-stage codegen, no Python in the hot path.  The hash family
is md5-based because it is deterministic AND identical across engines (the
DuckDB differential oracle computes the same md5 strings); the scale path can
swap ``xxhash64`` in via ``hash_fn`` (documented divergence: oracle then
becomes rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["words", "shingles", "minhash_sig", "HEX_DIGITS"]

HEX_DIGITS = "0123456789abcdef"


def words(text: Column) -> Column:
    """Whitespace tokenization (the testdata documents are single-space
    separated; extend with regexp_split for real corpora)."""
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle set as an array<string>.

    ``transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(words, i, n)))``
    — O(words) per row, no explode, no shuffle.
    """
    ws = words(text)
    k = F.greatest(F.size(ws) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    return F.array_distinct(grams)


def minhash_sig(shingle_arr: Column, seed: int) -> Column:
    """One MinHash component: min over the shingle set of md5('s{seed}#'+s).

    String-min over hex digests ≡ numeric min over a 128-bit hash domain;
    md5 keeps the oracle engine bit-compatible.
    """
    return F.array_min(
        F.transform(
            shingle_arr, lambda s: F.md5(F.concat(F.lit(f"s{seed}#"), s))
        )
    )
