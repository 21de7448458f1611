"""Text expression helpers (all JVM-side column expressions).

``stable_hash48`` is the engine's cross-engine-reproducible hash:
first 48 bits of md5 as a BIGINT. Spark's ``hash()``/``xxhash64()``
are not reproducible in DuckDB, so every hashed operator that needs
an oracle (MinHash, SimHash, fingerprints) builds on this. 48 bits
keeps arithmetic inside BIGINT for the universal-hash family
``(a*h + b) mod p``.

DuckDB equivalent: ``CAST(concat('0x', substr(md5(x),1,12)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: universal-hash modulus; a_i/b_i derived
# deterministically from the hash index so Spark and the SQL oracle
# generate identical families with no RNG.
MERSENNE_61 = (1 << 61) - 1


def stable_hash48(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def minhash_value(h: Column, i: Column) -> Column:
    """i-th universal hash of a 48-bit token hash:
    ``(a_i * h + b_i) mod M61`` with a_i = 2i+3, b_i = 5i+7.
    BIGINT-safe: a_i stays tiny, h < 2^48, product < 2^53 range
    for i < ~15; callers keep the family small (k ≤ 16)."""
    a = i * F.lit(2) + F.lit(3)
    b = i * F.lit(5) + F.lit(7)
    return F.pmod(a.cast("bigint") * h + b.cast("bigint"), F.lit(MERSENNE_61))


def normalize_text(col: Column) -> Column:
    """lowercase + collapse whitespace + strip edges (the canonical
    form for dedup). Collapse-THEN-trim: Spark's ``trim`` strips only
    ASCII spaces, so trimming first leaves tab/newline edges in the
    canonical form — the round-4 fuzz harness caught ``'foo'`` and
    ``'\\tfoo'`` hashing to different dedup keys, and whitespace-only
    text normalizing to ``' '`` instead of ``''``. Collapsing every
    whitespace run to one space first makes the single space-trim
    complete.

    The whitespace set is the EXPLICIT class ``[ \\t\\n\\x0B\\f\\r]``,
    not ``\\s``: Java regex ``\\s`` includes U+000B (vertical tab)
    while DuckDB/RE2 ``\\s`` does not, so the shorthand silently
    diverges cross-engine on documents containing ``\\x0B`` (dedup
    keys, token counts, classifier features). Both engines get the
    identical class (ADVICE r4)."""
    return F.trim(F.regexp_replace(F.lower(col), r"[ \t\n\x0B\f\r]+", " "))


def tokens(col: Column) -> Column:
    """whitespace tokenization → array<string> (empty array for
    empty/blank text, not [''] — including tab/newline-only text and
    edge whitespace, via the same collapse-then-trim canonicalization
    as :func:`normalize_text`; raw ``split('\\s+')`` emits a phantom
    leading '' token for ``'\\tfoo'``)."""
    t = F.trim(F.regexp_replace(col, r"[ \t\n\x0B\f\r]+", " "))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def word_shingles(col: Column, n: int) -> Column:
    """distinct word n-grams as array<string> (space-joined).

    Higher-order-function lambdas are INTERPRETED (no codegen) and
    re-evaluate every embedded subtree per element — inlining the
    tokenization would re-split the text once per shingle per word.
    Binding the token array as a lambda variable (``transform(array(
    toks), t -> ...)``) evaluates it exactly once per row (measured
    ~10× on the sf0.1 documents).

    Guard: Spark ``sequence(0, -1)`` DESCENDS rather than returning
    empty, so short texts short-circuit to an empty shingle list.
    """
    toks = tokens(col)
    per_t = lambda t: F.when(  # noqa: E731
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.flatten(F.transform(F.array(toks), per_t)))


def all_word_ngrams(col: Column, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept) — the counting
    variant of :func:`word_shingles` for repetition statistics, where
    the multiplicity IS the signal. Same bind-once lambda discipline
    and the same ``sequence(0, -1)``-descends guard."""
    toks = tokens(col)
    per_t = lambda t: F.when(  # noqa: E731
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.flatten(F.transform(F.array(toks), per_t))
