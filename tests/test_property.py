"""Property tests (SURVEY.md §5.2 item 3): parse/serialize stability,
URL canonicalization idempotence, prefilter transparency."""

import string

from hypothesis import given, settings, strategies as st

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel
from scalpel_ts_spark.core.tokenizer import TagClose, TagOpen, Text, parse

# canonical-safe text: parse() trims and drops whitespace-only text,
# so generated text is non-empty, alnum, no surrounding whitespace
# quirk-free tag names only: p/li/td auto-close rules make round-trip
# intentionally non-exact (pinned separately by the golden corpus)
_name = st.sampled_from(["a", "b", "div", "span", "em", "x", "sect"])
_text = st.text(string.ascii_lowercase + string.digits, min_size=1, max_size=12)


@st.composite
def _forest_html(draw, depth=0):
    """Random well-formed HTML; returns (html, expected_texts)."""
    n = draw(st.integers(0, 3 if depth < 2 else 0))
    html, texts = "", []
    for _ in range(n):
        if depth < 2 and draw(st.booleans()):
            name = draw(_name)
            inner, inner_texts = draw(_forest_html(depth + 1))
            html += f"<{name}>{inner}</{name}>"
            texts.extend(inner_texts)
        else:
            t = draw(_text)
            # wrap when the previous sibling was text: adjacent Text
            # tokens would merge on reparse, breaking the oracle
            html += t if not html or html.endswith(">") else f"<b>{t}</b>"
            texts.append(t)
    return html, texts


@given(_forest_html())
@settings(max_examples=150, deadline=None)
def test_parse_serialize_roundtrip(case):
    """show(parse(html)) reparses to the identical token stream."""
    html, _ = case
    from scalpel_ts_spark.core.tokenizer import show_token

    toks = parse(html)
    rendered = "".join(show_token(t) for t in toks)
    assert parse(rendered) == toks


@given(_forest_html())
@settings(max_examples=150, deadline=None)
def test_texts_any_matches_token_stream(case):
    """texts(text) == the Text tokens of the parse, in order.

    (``any`` would double-count: it also matches enclosing tags, whose
    text content includes their children — reference semantics.)
    """
    html, _ = case
    toks = parse(html)
    expected = [t.text for t in toks if type(t) is Text]
    got = S.scrape(S.texts(Sel.text_node), toks)
    if expected:
        assert got == expected
    # balanced inputs: every open has a close in the stream
    opens = sum(1 for t in toks if type(t) is TagOpen)
    closes = sum(1 for t in toks if type(t) is TagClose)
    assert opens == closes


def test_canonicalize_idempotent_batch(spark):
    """canon(canon(u)) == canon(u) over a messy generated URL batch."""
    from pyspark.sql import functions as F

    from scalpel_ts_spark.functions.url import canonicalize_url

    urls = spark.range(300).select(
        F.concat(
            F.lit("HtTp://HOST"), (F.col("id") % 9).cast("string"),
            F.lit(".Test"),
            F.when(F.col("id") % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
            F.when(F.col("id") % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("/P/"), F.col("id").cast("string"))
            ),
            F.when(F.col("id") % 4 == 0, F.lit("?z=1&a=2&m=0")).otherwise(F.lit("")),
            F.when(F.col("id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url")
    )
    once = urls.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        F.col("c1"), canonicalize_url(F.col("c1")).alias("c2")
    )
    assert twice.filter("c1 <> c2").count() == 0


def test_canonicalize_duckdb_mirror_on_whitespace_edges(spark):
    """Spark vs the DuckDB oracle mirror on whitespace-edged URLs.

    NBSP is the trap: DuckDB's one-argument trim strips every Unicode
    space while Spark's strips only ASCII space — the mirror must
    spell trim(col, ' ') or these inputs silently diverge."""
    import duckdb

    from pyspark.sql import functions as F

    from scalpel_ts_spark.functions.url import (
        canonicalize_url,
        canonicalize_url_sql_duckdb,
    )

    urls = [
        " http://a.test/p ",
        "\xa0http://a.test/p",     # NBSP-edged: NOT trimmed, no scheme match
        "http://a.test/p\xa0",     # NBSP inside the kept tail
        "\x0bhttp://a.test/p",     # \x0B-edged
        "HTTP://A.Test:80/p?b=2&a=1#f",
    ]
    got = [
        r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    oracle = [
        r[0]
        for r in con.execute(
            f"SELECT {canonicalize_url_sql_duckdb('url')} FROM t"
        ).fetchall()
    ]
    assert got == oracle


# ---------------------------------------------------------------------------
# fused crawl-extract pass == combinator path (operators/extract.py)
# ---------------------------------------------------------------------------

_soup_piece = st.one_of(
    st.sampled_from(
        [
            "<title>",
            "</title>",
            "<title/>",
            "<a>",
            "</a>",
            '<a href="u1">',
            '<a href="u2" id="z">',
            "<a name=x>",
            '<img src="m1">',
            "<img>",
            '<video src="m2"></video>',
            "<embed/>",
            "<div>",
            "</div>",
            "<p>",
            "</p>",
            "<!--c-->",
            "</b>",
        ]
    ),
    st.text(string.ascii_lowercase + " ", min_size=0, max_size=8),
)


def _combinator_triple(tokens):
    from scalpel_ts_spark.core.scraper import NOTHING
    from scalpel_ts_spark.core.tag_spec import tags_to_spec
    from scalpel_ts_spark.operators.extract import SpanExtractor

    spec = tags_to_spec(tokens)
    spans = SpanExtractor().run(spec)
    links = S.attrs("href", Sel.tag("a")).run(spec)
    title = S.text(Sel.tag("title")).run(spec)
    return (
        spans,
        [] if links is NOTHING else list(links),
        None if title is NOTHING else title,
    )


def _fused_triple(tokens):
    from scalpel_ts_spark.core.scraper import NOTHING
    from scalpel_ts_spark.operators.extract import crawl_extract_tokens

    spans, links, title = crawl_extract_tokens(tokens)
    return spans, links, (None if title is NOTHING else title)


@given(st.lists(_soup_piece, min_size=0, max_size=24))
@settings(max_examples=400, deadline=None)
def test_fused_crawl_extract_equals_combinators(pieces):
    tokens = parse("".join(pieces))
    f_spans, f_links, f_title = _fused_triple(tokens)
    c_spans, c_links, c_title = _combinator_triple(tokens)
    assert f_spans == c_spans
    assert f_title == c_title
    # links: the fused pass emits one href per anchor in document
    # order; the reference DFS's cons-fold reorders nested anchors and
    # can DUPLICATE a match under malformed cross-nesting — the value
    # set is always identical (see crawl_extract_tokens docstring)
    assert set(f_links) == set(c_links)


@given(st.lists(_soup_piece.filter(lambda p: p not in ("</a>",)), min_size=0, max_size=16))
@settings(max_examples=200, deadline=None)
def test_fused_links_exact_order_without_nesting(pieces):
    # without </a> every anchor stays flat-or-unclosed... not quite:
    # EOF closes can still nest anchors, so guard on the token stream
    tokens = parse("".join(pieces))
    opens = sum(1 for t in tokens if type(t).__name__ == "TagOpen" and t.name == "a")
    closes = sum(1 for t in tokens if type(t).__name__ == "TagClose" and t.name == "a")
    if closes == 0 or opens <= 1:
        assert _fused_triple(tokens)[1] == _combinator_triple(tokens)[1]


def test_fused_crawl_extract_title_edge_cases():
    cases = [
        "<title>a<title>b</title>",          # LIFO: close pops inner
        "<title>x",                           # unclosed -> ''
        "<title>",                            # EOF-suppressed close
        "<title></title><title>late</title>",  # first match wins
        "<title>a<b>c</b>d</title>",          # nested text concatenated
        "<div><title>t</div></title>",        # malformed containment
        "no title at all",                    # NOTHING -> None
        "<title><img src='m'>t</title>",      # media inside title
        "<a href=''>e</a>",                   # empty href still counts
        '<a>no-href <b href="pick-me">x</b></a>',  # descendant href
        '<a href="own"><b href="later">x</b></a>',  # own wins
        '<a><x href="h">',                    # unclosed: own token only
    ]
    for html in cases:
        tokens = parse(html)
        assert _fused_triple(tokens) == _combinator_triple(tokens), html
    # nested anchors: multiset equal, order deliberately document-order
    tokens = parse("<a href='x'><a>inner</a></a>")
    f, c = _fused_triple(tokens), _combinator_triple(tokens)
    assert (f[0], f[2]) == (c[0], c[2]) and sorted(f[1]) == sorted(c[1])
