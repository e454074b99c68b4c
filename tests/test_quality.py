"""Gopher-style quality stats + top-n-gram repetition: value equality
against an independent pure-Python reference, cross-engine mirror
agreement on the edge inputs, and threshold-knob behavior."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from scalpel_ts_spark.functions import text as T
from scalpel_ts_spark.operators.quality import (
    decontaminate,
    decontaminate_sql,
    quality_stats,
    quality_stats_sql,
    top_ngram_repetition,
    top_ngram_repetition_sql,
)

_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _tokens(text: str) -> list[str]:
    # strip(" "): SQL trim removes only the space character; Python's
    # bare strip() also removes \x0b and NBSP and would diverge from
    # both engines on whitespace-edge inputs (the fuzz catches this)
    return _WS_RE.split(text.strip(" ").lower())


def _py_quality(text: str) -> dict:
    toks = _tokens(text)
    n = len(toks)
    mean_len = sum(len(t) for t in toks) / n
    alpha = sum(1 for t in toks if re.search(r"[a-z]", t)) / n
    dup = (n - len(set(toks))) / n
    stop_hits = sum(1 for t in toks if t in T.EN_STOPWORDS)
    p = T.GOPHER_DEFAULTS
    ok = (
        p["min_tokens"] <= n <= p["max_tokens"]
        and p["min_mean_len"] <= mean_len <= p["max_mean_len"]
        and alpha >= p["min_alpha_frac"]
        and dup <= p["max_dup_ratio"]
        and stop_hits >= p["min_stop_hits"]
    )
    return dict(
        n_tokens=n,
        mean_token_len=mean_len,
        frac_alpha=alpha,
        dup_token_ratio=dup,
        gopher_pass=int(ok),
    )


# 60 distinct-ish words with stopwords -> passes; the others each fail
# exactly one rule.
_GOOD = " ".join(
    f"the word{i} and token{i} is fine" for i in range(10)
)  # 60 tokens, dup ratio 3*9/60=0.45, stopwords plenty
_SPAM = " ".join(["spam"] * 60)  # dup ratio 59/60 -> fails repetition
_SHORT = "the quick brown fox and the lazy dog"  # fails min_tokens
_DIGITS = " ".join(str(i) for i in range(60))  # fails alpha fraction
DOCS = [
    (0, _GOOD),
    (1, _SPAM),
    (2, _SHORT),
    (3, _DIGITS),
    (4, "a\x0bb " + _GOOD),  # \x0B is a separator in BOTH engines
    (5, None),  # NULL text -> NULL stats, NULL gate
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_quality_stats_match_python_reference(spark, docs_df):
    rows = {r["doc_id"]: r.asDict() for r in quality_stats(docs_df).collect()}
    for doc_id, text in DOCS:
        got = rows[doc_id]
        if text is None:
            assert all(got[k] is None for k in got if k != "doc_id")
            continue
        ref = _py_quality(text)
        for k, v in ref.items():
            assert got[k] == pytest.approx(v), (doc_id, k)
    assert rows[0]["gopher_pass"] == 1
    # each bad doc fails for its designed reason
    assert rows[1]["gopher_pass"] == 0 and rows[1]["dup_token_ratio"] > 0.6
    assert rows[2]["gopher_pass"] == 0 and rows[2]["n_tokens"] < 50
    assert rows[3]["gopher_pass"] == 0 and rows[3]["frac_alpha"] < 0.8


def test_quality_sql_mirror_bit_identical(spark, docs_df):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    oracle = {
        r[0]: r[1:]
        for r in con.execute(quality_stats_sql()).fetchall()
    }
    for r in quality_stats(docs_df).collect():
        got = (
            r["n_tokens"], r["mean_token_len"], r["frac_alpha"],
            r["dup_token_ratio"], r["gopher_pass"],
        )
        assert got == oracle[r["doc_id"]], r["doc_id"]  # exact, not approx


def test_gopher_thresholds_are_knobs(spark, docs_df):
    relaxed = quality_stats(
        docs_df, min_tokens=1, max_dup_ratio=1.0, min_alpha_frac=0.0,
        min_stop_hits=0, min_mean_len=0.0,
    )
    rows = {r["doc_id"]: r["gopher_pass"] for r in relaxed.collect()}
    assert rows[1] == 1 and rows[2] == 1 and rows[3] == 1


def test_top_ngram_repetition_matches_counter(spark, docs_df):
    got = {
        r["doc_id"]: r.asDict()
        for r in top_ngram_repetition(docs_df, n=2).collect()
    }
    for doc_id, text in DOCS:
        if text is None:
            assert doc_id not in got
            continue
        toks = _tokens(text)
        grams = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        if not grams:
            assert doc_id not in got
            continue
        row = got[doc_id]
        assert row["top_gram_count"] == max(grams.values())
        assert row["n_grams"] == sum(grams.values())
        assert row["top_gram_frac"] == pytest.approx(
            max(grams.values()) / sum(grams.values())
        )
    # the spam doc is maximally repetitive: one gram owns every slot
    assert got[1]["top_gram_frac"] == 1.0


def test_top_ngram_sql_mirror_agrees(spark, docs_df):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    oracle = sorted(con.execute(top_ngram_repetition_sql(n=2)).fetchall())
    got = sorted(
        tuple(r) for r in top_ngram_repetition(docs_df, n=2).collect()
    )
    assert got == oracle


def test_decontaminate_matches_python_reference(spark):
    """Overlap counting vs a set-intersection reference; every doc is
    kept (zero-hit docs report 0), a benchmark member self-flags, and
    a doc with no 3-grams (too short) is clean by construction."""
    train = [
        (0, "alpha beta gamma delta epsilon zeta"),  # shares grams w/ bench
        (1, "one two three four five six seven"),    # disjoint
        (2, "alpha beta gamma unrelated tail words"),  # 1 shared gram
        (3, "ab"),                                   # < 3 tokens -> no grams
        (10, "held out eval question answer pairs"),  # IS the benchmark doc
    ]
    bench = [(10, "held out eval question answer pairs"),
             (11, "alpha beta gamma delta something else")]
    train_df = spark.createDataFrame(train, "doc_id int, text string")
    bench_df = spark.createDataFrame(bench, "doc_id int, text string")

    def grams(text):
        t = _tokens(text)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    bench_grams = set().union(*(grams(t) for _, t in bench))
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in decontaminate(train_df, bench_df, n=3).collect()
    }
    assert set(got) == {d for d, _ in train}  # left join keeps all docs
    for doc_id, text in train:
        n_hits = len(grams(text) & bench_grams)
        assert got[doc_id] == (n_hits, int(n_hits > 0)), doc_id
    assert got[10][1] == 1  # benchmark member self-flags
    assert got[3] == (0, 0)  # gram-less doc is clean, not dropped


def test_decontaminate_sql_mirror_agrees(spark):
    import duckdb

    docs = [(i, f"word{i} the and filler token{i % 7} is common tail")
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(
        tuple(r)
        for r in decontaminate(
            df, df.filter(F.col("doc_id") % 20 == 0), n=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    oracle = sorted(con.execute(decontaminate_sql(n=3)).fetchall())
    assert got == oracle


def test_corpus_funnel_invariants(spark):
    """The integration row: funnel counts are monotone by construction
    (every later stage filters the earlier one) and match a pure-Python
    recomputation at sf0.001."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    if not __import__("os").path.isdir(sf):
        pytest.skip("driver testdata not present")
    row = E.q_corpus_funnel(spark, sf).collect()[0]
    assert row["n_total"] >= row["n_quality"] >= row["n_unique"] >= row[
        "n_clean"
    ] >= 0
    assert row["n_total"] > 0

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    p = T.GOPHER_DEFAULTS

    def quality(text):
        q = _py_quality(text)
        return q["gopher_pass"] == 1

    def fp(text):
        return " ".join(_tokens(text))  # stands in for md5 (injective here)

    def grams(text):
        t = _tokens(text)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    bench = set().union(
        *(grams(t) for d, t in docs.items() if d % 20 == 0)
    )
    passed = {d: t for d, t in docs.items() if quality(t)}
    uniq = {fp(t) for t in passed.values()}
    clean = {fp(t) for t in passed.values() if not (grams(t) & bench)}
    assert row["n_quality"] == len(passed)
    assert row["n_unique"] == len(uniq)
    assert row["n_clean"] == len(clean)


def test_quality_three_way_fuzz(spark):
    """Deterministic 200-string fuzz: Spark == DuckDB == pure Python
    on every quality column, one batch job per engine.

    Alphabet includes the full explicit whitespace class (incl. \\x0B,
    the char where Java and RE2 \\s definitions diverge), NBSP (NOT a
    separator — must stay inside tokens in both engines), digits,
    punctuation, and lowercase-only non-ASCII (lowercase-only so no
    case-mapping table differences can enter; the tokenizer lowercases
    everything else).
    """
    import random

    import duckdb

    rng = random.Random(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 \t\n\x0b\f\r\xa0"
        ".,!?#-_/éüñßαя中日"
    )
    samples = ["", " ", "\x0b", "\xa0", "the the the"]
    samples += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(195)
    ]
    rows = list(enumerate(samples))

    got = {
        r["doc_id"]: r
        for r in quality_stats(
            spark.createDataFrame(rows, "doc_id int, text string")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {r[0]: r[1:] for r in con.execute(quality_stats_sql()).fetchall()}

    for doc_id, text in rows:
        s = got[doc_id]
        spark_vals = (
            s["n_tokens"], s["mean_token_len"], s["frac_alpha"],
            s["dup_token_ratio"], s["gopher_pass"],
        )
        assert spark_vals == duck[doc_id], (doc_id, repr(text))  # bit-exact
        ref = _py_quality(text)
        assert s["n_tokens"] == ref["n_tokens"], repr(text)
        for k in ("mean_token_len", "frac_alpha", "dup_token_ratio"):
            assert s[k] == pytest.approx(ref[k]), (repr(text), k)
        assert s["gopher_pass"] == ref["gopher_pass"], repr(text)

    # same batch through the FULL text_stats surface (bpe lexer,
    # punct ratio, stopword ratio, lang-id, md5 fingerprint, shingle
    # count) — the columns the driver's oracle only ever sees over
    # the whitespace-clean synthetic corpus
    stats = {
        r["doc_id"]: r
        for r in spark.createDataFrame(rows, "doc_id int, text string")
        .select(
            "doc_id",
            T.bpe_token_count(F.col("text")).alias("bpe"),
            T.punct_ratio(F.col("text")).alias("punct"),
            T.stopword_ratio(F.col("text")).alias("stop"),
            T.lang_id(F.col("text")).alias("lang"),
            T.fingerprint(F.col("text")).alias("fp"),
            F.size(T.word_shingles(F.col("text"), 3)).alias("n_sh"),
        )
        .collect()
    }
    duck2 = {
        r[0]: r[1:]
        for r in con.execute(
            f"""SELECT doc_id, {T.bpe_token_count_sql('text')},
                {T.punct_ratio_sql('text')},
                {T.stopword_ratio_sql('text')},
                {T.lang_id_sql('text')}, {T.fingerprint_sql('text')},
                len({T.word_shingles_sql('text', 3)})
                FROM documents"""
        ).fetchall()
    }
    for doc_id, text in rows:
        s = stats[doc_id]
        assert (
            s["bpe"], s["punct"], s["stop"], s["lang"], s["fp"], s["n_sh"]
        ) == duck2[doc_id], (doc_id, repr(text))


def test_word_ngrams_keep_duplicates(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    row = df.select(T.word_ngrams(F.col("text"), 2).alias("g")).collect()[0]
    assert row["g"] == ["a b", "b a", "a b"]  # order kept, dups kept
