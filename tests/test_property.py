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
