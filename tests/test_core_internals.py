"""Golden corpus: tokenizer / tag-info / tag-forest internals
(reference test/Internal/**)."""

from scalpel_ts_spark.core.tag_forest import TagNode, _malformed, from_tag_info
from scalpel_ts_spark.core.tag_info import TagInfo, annotate_tags
from scalpel_ts_spark.core.tag_spec import SelectContext, tags_to_spec
from scalpel_ts_spark.core.tokenizer import (
    Comment,
    TagClose,
    TagOpen,
    Text,
    canonicalize_tokens,
    parse,
    show_tokens,
)


# --- Tokenizer (test/Internal/Html/Tokenizer.test.ts) ---

def test_canonicalize_tokens_drops_empty_text():
    tokens = [
        TagOpen("a", ()),
        Text("\n"),
        Text(" "),
        Text("foo"),
        Comment("Comment"),
    ]
    assert canonicalize_tokens(tokens) == [
        TagOpen("a", ()),
        Text("foo"),
        Comment("Comment"),
    ]


def test_parse_valid_html():
    assert parse("<body><!-- Comment --><a>foo</a></body>") == [
        TagOpen("body", ()),
        Comment(" Comment "),
        TagOpen("a", ()),
        Text("foo"),
        TagClose("a"),
        TagClose("body"),
    ]


def test_show_token():
    tokens = [
        TagOpen("a", (("key", "value"),)),
        Comment(" Comment "),
        Text("foo"),
        TagClose("a"),
    ]
    assert show_tokens(tokens) == '<a key="value"><!-- Comment -->foo</a>'


# --- TagInfo (test/Internal/Tag/TagInfo.test.ts) ---

def test_annotate_tags():
    annotated = annotate_tags(parse("<body><div>hello</div></body>"))
    assert annotated == [
        TagInfo(TagOpen("body", ()), 4),
        TagInfo(TagOpen("div", ()), 2),
        TagInfo(Text("hello"), None),
        TagInfo(TagClose("div"), None),
        TagInfo(TagClose("body"), None),
    ]


# --- TagForest (test/Internal/Tag/TagForest.test.ts) ---

def test_empty_source_empty_forest():
    assert from_tag_info(annotate_tags(parse(""))) == []


def test_malformed_split():
    remaining = [
        TagNode(
            0,
            5,
            [
                TagNode(1, 4, [TagNode(2, 2, [])]),
                TagNode(3, 4, []),
            ],
        )
    ]
    ok, bad = _malformed(2, [], remaining)
    assert ok == []
    assert bad == remaining


# --- TagSpec (test/Internal/Tag/TagSpec.test.ts) ---

def test_tags_to_spec():
    tokens = parse("<div>hello</div>")
    spec = tags_to_spec(tokens)
    assert spec.context == SelectContext(0, False)
    assert spec.hierarchy == [TagNode(0, 2, [TagNode(1, 1, [])])]
    assert spec.tags == annotate_tags(tokens)


# --- engine-specific tokenizer pins (behaviors the golden corpus
#     relies on implicitly) ---

def test_self_closing_suppresses_close():
    assert parse("<img src='x' />") == [TagOpen("img", (("src", "x"),))]


def test_void_element_no_close():
    assert parse("<img src='x'>") == [TagOpen("img", (("src", "x"),))]


def test_unquoted_attr_value_ends_at_slash():
    assert parse("<a key1=foo/>") == [TagOpen("a", (("key1", "foo"),))]


def test_eof_closes_emitted_lifo():
    assert parse("<a>foo") == [TagOpen("a", ()), Text("foo"), TagClose("a")]


def test_eof_closes_suppressed_when_last_token_is_open():
    assert parse("<b><a>foo</a><b>") == [
        TagOpen("b", ()),
        TagOpen("a", ()),
        Text("foo"),
        TagClose("a"),
        TagOpen("b", ()),
    ]


def test_outer_close_implies_inner_closes():
    assert parse("<b><c><d>2</d></b></c>") == [
        TagOpen("b", ()),
        TagOpen("c", ()),
        TagOpen("d", ()),
        Text("2"),
        TagClose("d"),
        TagClose("c"),
        TagClose("b"),
    ]


def test_attributes_sorted_and_first_dup_wins():
    assert parse('<a z="1" b="2" z="3">') == [
        TagOpen("a", (("b", "2"), ("z", "1"))),
    ]


def test_entities_decoded():
    assert parse("<a>x &amp; y</a>") == [
        TagOpen("a", ()),
        Text("x & y"),
        TagClose("a"),
    ]


def test_doctype_dropped():
    assert parse("<!DOCTYPE html><a>x</a>") == [
        TagOpen("a", ()),
        Text("x"),
        TagClose("a"),
    ]


# --- Entity edge-case corpus (SURVEY §7 risk #1 / VERDICT r2 item 8).
# No htmlparser2 is installable offline, so these pins are derived from
# the WHATWG rules that htmlparser2's default decodeEntities:true
# implements (the reference constructs Parser with no options,
# Tokenizer.ts:192): full named table with longest-prefix legacy
# matching in text, the attribute-mode legacy exception, C1 numeric
# remapping, and out-of-range -> U+FFFD.

def test_entity_text_mode_edge_cases():
    cases = [
        ("&amp; x", "& x"),
        ("&amp x", "& x"),          # legacy (no ';') decodes in TEXT
        ("&ampx", "&x"),            # ...even mid-word
        ("&notit;", "¬it;"),   # longest-prefix: &not + "it;"
        ("&notin;", "∉"),      # full name wins over &not prefix
        ("&#65;&#x41;&#X41;", "AAA"),
        ("&#65 b", "A b"),          # numeric without ';'
        ("&#128;", "€"),       # C1 control remap (windows-1252)
        ("&#x110000;", "�"),   # beyond Unicode -> replacement
        ("&#0;", "�"),
        ("&; &#; &unknownref; &", "&; &#; &unknownref; &"),
        ("&CounterClockwiseContourIntegral;", "∳"),
    ]
    for src, want in cases:
        got = parse(f"<p>{src}</p>")
        assert got == [TagOpen("p", ()), Text(want), TagClose("p")], src


def test_entity_attribute_mode_edge_cases():
    cases = [
        ("x&ampy", "x&ampy"),      # legacy + alnum: NOT decoded
        ("x&amp=1", "x&amp=1"),    # legacy + '=': NOT decoded
        ("x&amp.y", "x&.y"),       # legacy + other char: decoded
        ("x&amp;y", "x&y"),        # terminated: decoded
        ("x&amp", "x&"),           # end of value: decoded
        ("&notit;", "&notit;"),    # legacy prefix + alnum: literal
        ("&notin;", "∉"),     # full named ref: decoded
        ("?a=1&ampb=2", "?a=1&ampb=2"),  # the URL-breaking classic
        ("&#65;&#x2f;", "A/"),     # numeric: same as text mode
    ]
    for src, want in cases:
        got = parse(f'<a href="{src}">x</a>')
        assert got == [
            TagOpen("a", (("href", want),)),
            Text("x"),
            TagClose("a"),
        ], src
    # unquoted values follow the same attribute rule
    assert parse("<a href=x&ampy>")[0] == TagOpen("a", (("href", "x&ampy"),))


def test_raw_text_close_search_survives_multibyte_lowercase():
    """U+0130 'İ' lowers to TWO chars: a close-tag search over a
    .lower() copy desyncs its indices against the original string."""
    toks = parse("<p>İ</p><script>var x=1;</script><b>ok</b>")
    assert Text("var x=1;") in toks
    assert Text("ok") in toks
    assert not any(type(t) is Text and "<" in t.text for t in toks)


def test_raw_text_close_requires_tag_boundary():
    """htmlparser2 leaves script/style special mode only when the
    close-tag name is followed by '>' or whitespace — '</scripted>'
    stays raw text; '</SCRIPT >' (case-insensitive, space) closes."""
    assert parse("<script>x</scripted>y</script>") == [
        TagOpen("script", ()),
        Text("x</scripted>y"),
        TagClose("script"),
    ]
    assert parse("<script>x</SCRIPT >z") == [
        TagOpen("script", ()),
        Text("x"),
        TagClose("script"),
        Text("z"),
    ]


def test_text_trim_matches_js_not_python():
    """JS String.trim() does NOT strip \\x1c-\\x1f or \\x85 (category
    Cc); Python's default strip() does — the reference keeps them."""
    assert parse("<p>\x85abc\x85</p>")[1] == Text("\x85abc\x85")
    # a \x1c-only text node is NOT whitespace-only under JS trim
    assert Text("\x1c") in parse("<p>\x1c</p>")
    # the JS set itself still trims (NBSP, BOM, ideographic space)
    assert parse("<p>\xa0﻿　</p>") == [
        TagOpen("p", ()),
        TagClose("p"),
    ]


def test_fix_tree_linear_in_sibling_count():
    """A document that is one flat run of siblings (large tables/
    lists) must build its forest in linear time — the head/tail
    recursive fold was O(siblings^2): 9.5s at 16k siblings."""
    import time

    from scalpel_ts_spark.core.tag_forest import _fix_tree

    big = [TagNode(i, i, []) for i in range(30_000)]
    t0 = time.perf_counter()
    out = _fix_tree(big)
    assert len(out) == 30_000
    assert time.perf_counter() - t0 < 2.0  # old shape: ~30s+ here


def test_fix_tree_hoists_cascade_through_levels():
    """A grandchild whose span escapes both its parent AND grandparent
    is hoisted to the top level, between the grandparent and its right
    siblings (reference fixTree fold order)."""
    from scalpel_ts_spark.core.tag_forest import _fix_tree

    escape = TagNode(2, 99, [])
    child = TagNode(1, 3, [escape])
    root = TagNode(0, 4, [child])
    sibling = TagNode(5, 6, [])
    got = _fix_tree([root, sibling])
    assert got == [
        TagNode(0, 4, [TagNode(1, 3, [])]),
        TagNode(2, 99, []),
        TagNode(5, 6, []),
    ]
