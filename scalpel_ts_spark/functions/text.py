"""Text-analysis column functions for the training-data pipeline.

Everything here is a JVM-side Column expression (whole-stage codegen,
no Python) so it runs as a pure map stage over 100 TB of documents.
Each function has a DuckDB-SQL mirror (``*_sql``) used by the driver's
oracle; the pair is kept semantically identical on purpose:

* tokenization = split lower(trim(text)) on the explicit whitespace
  class ``[ \\t\\n\\x0B\\f\\r]+`` (Java's ``\\s`` includes ``\\x0B``
  but RE2's does not — a bare ``\\s`` would diverge cross-engine)
* the mirror spells trim as ``trim(col, ' ')``: Spark's ``trim``
  removes only the ASCII space, but DuckDB's one-argument ``trim``
  removes every Unicode space INCLUDING NBSP (``\\xa0``), so a bare
  ``trim(col)`` diverges on NBSP-edged documents (caught by the
  three-way fuzz in tests/test_quality.py)
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
    return rf"string_split_regex(lower(trim({col}, ' ')), '[{_WS}]+')"


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
    return rf"md5(regexp_replace(lower(trim({col}, ' ')), '[{_WS}]+', ' ', 'g'))"


def _winnow_norm(text: Column) -> Column:
    """Winnowing's normalized text: lowercased, whitespace-collapsed."""
    return F.regexp_replace(F.lower(F.trim(text)), rf"[{_WS}]+", " ")


def _let(value: Column, body) -> Column:
    """Let-binding for a Column expression: evaluate ``value`` ONCE
    per row and pass it to ``body`` as a lambda variable.

    Catalyst evaluates a higher-order-function lambda's captured
    expression tree PER ELEMENT — ``transform(idx, i -> f(expensive,
    i))`` recomputes ``expensive`` for every ``i``, turning the
    winnowing window scan into O(n^2) md5 calls per document.
    Wrapping the expensive value in a single-element array and
    referencing it as the lambda parameter makes every inner use a
    cheap bound-variable read.
    """
    return F.transform(F.array(value), body)[0]


def winnow_fingerprints(text: Column, k: int = 8, w: int = 16) -> Column:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): the sorted distinct set of window-minimum k-gram
    hashes.

    Pipeline (all JVM-side higher-order functions, no Python):

    1. normalize: lowercase + collapse whitespace (same rule as
       :func:`fingerprint`)
    2. hash every character ``k``-gram — md5 stands in for the paper's
       Rabin rolling hash because it is bit-identical across Spark and
       DuckDB (the oracle contract); a rolling hash computes the same
       per-gram values incrementally and selection is unchanged
    3. slide a ``w``-hash window, keep each window's MINIMUM hash
    4. distinct + sort -> the fingerprint set

    Guarantee: any substring match of length >= ``w + k - 1`` between
    two documents contributes at least one SHARED fingerprint, so an
    equi-join on exploded fingerprints is a lossless candidate
    generator for that match length (the MOSS index shape).

    Edge cases are pinned to equal the DuckDB mirror exactly:
    fewer than ``k`` chars -> empty array (no grams); between 1 and
    ``w-1`` grams -> one window over all of them (min of all hashes);
    NULL text -> NULL.
    """
    empty = F.array().cast("array<int>")

    def hashes_of(s: Column) -> Column:
        n_grams = F.length(s) - F.lit(k - 1)
        gram_idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
            empty
        )
        return F.transform(gram_idx, lambda i: F.md5(s.substr(i, F.lit(k))))

    def windows_of(h: Column) -> Column:
        n_win = F.when(
            F.size(h) >= 1, F.greatest(F.size(h) - F.lit(w - 1), F.lit(1))
        ).otherwise(F.lit(0))
        win_idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
            empty
        )
        sels = F.transform(win_idx, lambda j: F.array_min(F.slice(h, j, w)))
        return F.array_sort(F.array_distinct(sels))

    # _let keeps the normalized text and the hash array single-
    # evaluation: without it the window transform re-evaluates the
    # whole md5 array per window (O(n^2) md5s per document)
    return _let(
        _winnow_norm(text), lambda s: _let(hashes_of(s), windows_of)
    )


def winnow_fingerprints_sql(col: str, k: int = 8, w: int = 16) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints`.

    Uses the same let-binding trick as the Spark side (``_let``):
    DuckDB, like Catalyst, re-evaluates a lambda's captured
    subexpressions PER ELEMENT, so referencing the md5 array directly
    inside the window lambda costs O(n^2) md5 calls per document
    (measured 66x on 100 windows).  Binding it as a single-element
    list's lambda parameter makes inner references cheap.
    ``list_slice`` is (begin, end)-indexed, vs Spark's (start,
    length) — both clamp at the array end, which is what makes the
    short-document window agree cross-engine.
    """
    s = rf"regexp_replace(lower(trim({col}, ' ')), '[{_WS}]+', ' ', 'g')"
    hashes = (
        f"list_transform(range(1, greatest(length(s_) - {k - 1}, 0) + 1), "
        f"i -> md5(substr(s_, i, {k})))"
    )
    n_win = (
        f"(CASE WHEN len(h_) >= 1 "
        f"THEN greatest(len(h_) - {w - 1}, 1) ELSE 0 END)"
    )
    windows = (
        f"list_sort(list_distinct(list_transform(range(1, {n_win} + 1), "
        f"j -> list_min(list_slice(h_, j, j + {w - 1})))))"
    )
    return (
        f"list_transform([{s}], s_ -> "
        f"list_transform([{hashes}], h_ -> {windows})[1])[1]"
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-grams in document order, duplicates KEPT (the multiset
    the repetition statistics count over — :func:`word_shingles` is
    this with an ``array_distinct`` on top).

    Degenerate guard: with fewer than ``n`` tokens the result is the
    empty array.  (``F.sequence(1, 0)`` would auto-step DOWN to
    ``[1, 0]`` and the subsequent ``slice(toks, 0, n)`` throws
    INVALID_PARAMETER_VALUE.START — and diverges from the DuckDB
    mirror, whose ``range(1, 0+1)`` is empty.)

    ``_let``-bound token array: the slice lambda references the
    tokenization, and a captured expression is re-evaluated PER
    ELEMENT in both engines (see :func:`_let`) — unbound, every gram
    re-ran the regex split of the whole document, O(len²) per doc
    (measured 7x on the sf0.1 repetition query: 5.4 s -> 0.73 s).
    """

    def build(tk: Column) -> Column:
        n_grams = F.size(tk) - F.lit(n - 1)
        idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))

    return _let(tokens(text), build)


def word_ngrams_sql(col: str, n: int = 3) -> str:
    grams = (
        f"list_transform("
        f"range(1, greatest(len(tk_) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice(tk_, i, i + {n - 1}), ' '))"
    )
    return f"list_transform([{tokens_sql(col)}], tk_ -> {grams})[1]"


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the unit set for Jaccard dedup)."""
    return F.array_distinct(word_ngrams(text, n))


def word_shingles_sql(col: str, n: int = 3) -> str:
    return f"list_distinct({word_ngrams_sql(col, n)})"


def dup_token_ratio(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    ``(n_tokens - n_distinct_tokens) / n_tokens``.

    The Gopher-style repetition signal (Rae et al. 2021 §A1.1 uses
    line/ngram repetition; token-level is the unit that exists in any
    corpus, including single-line documents).  One IEEE-754 division
    of two exact integers — bit-identical across Spark and DuckDB.
    Denominator is never 0 for non-NULL text (``split('')`` yields
    ``['']``, size 1); NULL text propagates NULL.
    """
    toks = tokens(text)
    dup = F.size(toks) - F.size(F.array_distinct(toks))
    return dup.cast("double") / F.size(toks)


def dup_token_ratio_sql(col: str) -> str:
    toks = tokens_sql(col)
    return (
        f"((len({toks}) - len(list_distinct({toks})))::DOUBLE"
        f" / len({toks}))"
    )


def frac_alpha_tokens(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter
    (tokens are already lowercased, so ``[a-z]`` covers the alphabet;
    an all-digit/all-symbol token fails — the Gopher "80% of words
    must contain an alphabetic character" rule).  ASCII-only is a
    documented heuristic bound, same stance as the stopword lists.
    """
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return hits.cast("double") / F.size(toks)


def frac_alpha_tokens_sql(col: str) -> str:
    toks = tokens_sql(col)
    return (
        f"(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))"
        f"::DOUBLE / len({toks}))"
    )


# Gopher-rule thresholds (Rae et al. 2021, table A1), adapted to
# token-level units; every value is a keyword knob on gopher_pass.
GOPHER_DEFAULTS = dict(
    min_tokens=50,
    max_tokens=100_000,
    min_mean_len=3.0,
    max_mean_len=10.0,
    min_alpha_frac=0.8,
    max_dup_ratio=0.6,
    min_stop_hits=2,
)


def gopher_pass(text: Column, **overrides) -> Column:
    """Gopher-style document quality gate as ONE int column (1 keep /
    0 drop / NULL for NULL text): token-count window, mean-token-length
    window, >=80% alphabetic tokens, bounded token repetition, and at
    least ``min_stop_hits`` stopword occurrences.

    Pure Column conjunction — whole-stage codegen, no Python, no
    shuffle — so the filter runs as a map stage over 100 TB and,
    used in a ``.filter``, pushes work-elimination ahead of every
    downstream dedup/ANN/tokenize stage.  Int (not boolean) so the
    driver's cross-engine value-hash sees identical reprs.
    """
    p = {**GOPHER_DEFAULTS, **overrides}
    toks = tokens(text)
    n = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast(
            "double"
        )
        / n
    )
    ok = (
        (n >= F.lit(p["min_tokens"]))
        & (n <= F.lit(p["max_tokens"]))
        & (mean_len >= F.lit(p["min_mean_len"]))
        & (mean_len <= F.lit(p["max_mean_len"]))
        & (frac_alpha_tokens(text) >= F.lit(p["min_alpha_frac"]))
        & (dup_token_ratio(text) <= F.lit(p["max_dup_ratio"]))
        & (_stop_hits(toks, EN_STOPWORDS) >= F.lit(p["min_stop_hits"]))
    )
    return ok.cast("int")


def gopher_pass_sql(col: str, **overrides) -> str:
    p = {**GOPHER_DEFAULTS, **overrides}
    toks = tokens_sql(col)
    n = f"len({toks})"
    mean_len = mean_token_len_sql(col)
    return (
        f"CAST(({n} >= {p['min_tokens']} AND {n} <= {p['max_tokens']}"
        f" AND {mean_len} >= {p['min_mean_len']}"
        f" AND {mean_len} <= {p['max_mean_len']}"
        f" AND {frac_alpha_tokens_sql(col)} >= {p['min_alpha_frac']}"
        f" AND {dup_token_ratio_sql(col)} <= {p['max_dup_ratio']}"
        f" AND {_stop_hits_sql(toks, EN_STOPWORDS)} >= {p['min_stop_hits']}"
        f") AS INT)"
    )
