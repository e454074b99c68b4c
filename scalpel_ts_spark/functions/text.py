"""Text-analysis column functions for the training-data pipeline.

Everything here is a JVM-side Column expression (whole-stage codegen,
no Python) so it runs as a pure map stage over 100 TB of documents.
Each function has a DuckDB-SQL mirror (``*_sql``) used by the driver's
oracle; the pair is kept semantically identical on purpose:

* tokenization = split lower(trim(text)) on the explicit whitespace
  class ``[ \\t\\n\\x0B\\f\\r]+`` (Java's ``\\s`` includes ``\\x0B``
  but RE2's does not — a bare ``\\s`` would diverge cross-engine)
* ratios are a single IEEE-754 division of two exact integers, so
  Spark and DuckDB produce bit-identical doubles
* fingerprints use md5 (present in both engines) — never engine-
  internal hashes like xxhash64, which differ across systems
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately tiny stopword lists: language-ID below is a transparent
# n-gram/stopword heuristic (a real deployment would swap in fastText
# or CLD3 behind the same column signature).
EN_STOPWORDS = ("a", "an", "the", "of", "and", "to", "in", "is", "it", "on")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "ein", "zu", "den", "von")

# Whitespace class spelled out: Java regex \s is [ \t\n\x0B\f\r] but
# RE2 (DuckDB) \s omits vertical tab \x0B — a bare \s would make
# tokens/fingerprints silently diverge between the engine and its
# oracle mirror on documents containing \x0B.
_WS = r" \t\n\x0B\f\r"

# BPE-ish lexer: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_WS}]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    return F.split(F.lower(F.trim(text)), rf"[{_WS}]+")


def tokens_sql(col: str) -> str:
    return rf"string_split_regex(lower(trim({col})), '[{_WS}]+')"


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_count_sql(col: str) -> str:
    return f"len({tokens_sql(col)})"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex lexer (letters/digits/punct)."""
    return F.size(F.regexp_extract_all(text, F.lit("(" + BPE_TOKEN_RE + ")"), 1))


def bpe_token_count_sql(col: str) -> str:
    return rf"len(regexp_extract_all({col}, '{BPE_TOKEN_RE}'))"


def _stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _stop_hits_sql(toks: str, words: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"


def stopword_ratio(text: Column, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(text)
    return _stop_hits(toks, words) / F.size(toks)


def stopword_ratio_sql(col: str, words: tuple[str, ...] = EN_STOPWORDS) -> str:
    toks = tokens_sql(col)
    return f"({_stop_hits_sql(toks, words)}::DOUBLE / len({toks}))"


def punct_ratio(text: Column) -> Column:
    """Punctuation characters / total characters (quality signal).

    NULLIF guards the empty document: Spark's ANSI mode would throw
    DIVIDE_BY_ZERO (and non-ANSI NULL vs DuckDB's IEEE NaN would break
    the bit-identical-ratio contract) — both engines now yield NULL.
    """
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, rf"[^A-Za-z0-9{_WS}]", "")
    )
    return n_punct.cast("double") / F.nullif(F.length(text), F.lit(0))


def punct_ratio_sql(col: str) -> str:
    return (
        rf"((length({col}) - length(regexp_replace({col}, '[^A-Za-z0-9{_WS}]', '', 'g')))"
        rf"::DOUBLE / nullif(length({col}), 0))"
    )


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def mean_token_len_sql(col: str) -> str:
    toks = tokens_sql(col)
    return (
        f"(list_sum(list_transform({toks}, t -> length(t)))::DOUBLE"
        f" / len({toks}))"
    )


def lang_id(text: Column) -> Column:
    """'en' / 'de' / 'unk' by stopword-hit majority (ties -> 'unk')."""
    toks = tokens(text)
    en = _stop_hits(toks, EN_STOPWORDS)
    de = _stop_hits(toks, DE_STOPWORDS)
    return (
        F.when(en > de, F.lit("en"))
        .when(de > en, F.lit("de"))
        .otherwise(F.lit("unk"))
    )


def lang_id_sql(col: str) -> str:
    toks = tokens_sql(col)
    en = _stop_hits_sql(toks, EN_STOPWORDS)
    de = _stop_hits_sql(toks, DE_STOPWORDS)
    return (
        f"(CASE WHEN {en} > {de} THEN 'en' "
        f"WHEN {de} > {en} THEN 'de' ELSE 'unk' END)"
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized text.

    md5 exists in both Spark and DuckDB with identical output, so the
    fingerprint doubles as a cross-engine dedup key.
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), rf"[{_WS}]+", " "))


def fingerprint_sql(col: str) -> str:
    return rf"md5(regexp_replace(lower(trim({col})), '[{_WS}]+', ' ', 'g'))"


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the unit set for Jaccard dedup).

    Degenerate guard: with fewer than ``n`` tokens the result is the
    empty array.  (``F.sequence(1, 0)`` would auto-step DOWN to
    ``[1, 0]`` and the subsequent ``slice(toks, 0, n)`` throws
    INVALID_PARAMETER_VALUE.START — and diverges from the DuckDB
    mirror, whose ``range(1, 0+1)`` is empty.)
    """
    toks = tokens(text)
    n_grams = F.size(toks) - F.lit(n - 1)
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def word_shingles_sql(col: str, n: int = 3) -> str:
    toks = tokens_sql(col)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )
