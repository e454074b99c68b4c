"""Golden corpus: scraper combinators (reference test/Scraper.test.ts)."""

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel

from tests.golden import right, scrape_test


def test_chroots_limits_context_to_all_matching_nodes():
    scrape_test(
        "<a><b>foo</b></a><a><b>bar</b></a>",
        right(["foo", "bar"]),
        S.chroots(Sel.tag("a"), S.text(Sel.tag("b"))),
    )


def test_chroot_limits_context_to_first_node():
    scrape_test(
        "<a><b>foo</b></a><a><b>bar</b></a>",
        right(["foo"]),
        S.chroot(Sel.tag("a"), S.texts(Sel.tag("b"))),
    )


def test_matches_results_in_void():
    scrape_test("<a>1</a>", right(None), S.matches(Sel.tag("a")))


def test_text_first_matching_tag():
    scrape_test("<a>foo</a>", right("foo"), S.text(Sel.tag("a")))


def test_text_only_first_matching_tag():
    scrape_test("<a>foo</a><a>bar</a>", right("foo"), S.text(Sel.tag("a")))


def test_texts_all_matching_tags():
    scrape_test(
        "<a>foo</a><a>bar</a>", right(["foo", "bar"]), S.texts(Sel.tag("a"))
    )


def test_texts_empty_selector():
    scrape_test("<a>foo</a><a>bar</a>", right([]), S.texts(()))


def test_texts_does_not_extract_comments():
    scrape_test(
        "<a><!-- Comment -->foo</a><a>bar</a>",
        right(["foo", "bar"]),
        S.texts(Sel.tag("a")),
    )


def test_attr_first_matching():
    scrape_test('<a key="foo" />', right("foo"), S.attr("key", Sel.tag("a")))


def test_attr_complex_predicates():
    scrape_test(
        "<a key1=foo/><b key1=bar key2=foo /><a key1=bar key2=baz />",
        right("baz"),
        S.attr(
            "key2", Sel.with_attributes("a", [Sel.attribute("key1", "bar")])
        ),
    )


def test_attr_unclosed_tag_immediately_closed():
    scrape_test(
        "<img src='foobar'>", right("foobar"), S.attr("src", Sel.tag("img"))
    )


def test_attr_self_closing():
    scrape_test(
        "<img src='foobar' />", right("foobar"), S.attr("src", Sel.tag("img"))
    )


def test_attrs_all_matching():
    scrape_test(
        "<a key1=foo /><b key1=bar key2=foo /><a key1=bar key2=baz />",
        right(["foo", "bar"]),
        S.attrs("key1", Sel.tag("a")),
    )


def test_attrs_ignores_closing_text_comments():
    scrape_test(
        "<a><!-- Comment -->foo</a><a key1=foo></a><a key1=bar>bar</a>",
        right(["foo", "bar"]),
        S.attrs("key1", Sel.tag("a")),
    )


def test_html_extracts_matching_tag():
    scrape_test("<a>foo</a>", right("<a>foo</a>"), S.html(Sel.tag("a")))


def test_html_matches_root_node():
    scrape_test("<a>foo</a>", right("<a>foo</a>"), S.html(Sel.tag("a")))


def test_html_matches_nested_node():
    scrape_test(
        "<body><div><ul><li>1</li><li>2</li></ul></div></body>",
        right("<li>1</li>"),
        S.html(Sel.tag("li")),
    )


def test_html_node_without_inner_text():
    scrape_test(
        "<body><div></div></body>", right("<div></div>"), S.html(Sel.tag("div"))
    )


def test_htmls_extract_matching_tags():
    scrape_test(
        "<a>foo</a><a>bar</a>",
        right(["<a>foo</a>", "<a>bar</a>"]),
        S.htmls(Sel.tag("a")),
    )


def test_htmls_nested_nodes():
    scrape_test(
        "<body><div><ul><li>1</li><li>2</li></ul></div></body>",
        right(["<li>1</li>", "<li>2</li>"]),
        S.htmls(Sel.tag("li")),
    )


def test_htmls_nested_without_inner_text():
    scrape_test(
        "<body><div></div></body>", right(["<div></div>"]), S.htmls(Sel.tag("div"))
    )


def test_htmls_matching_tag_even_when_nested():
    scrape_test(
        "<b><a>foo</a><b>", right(["<a>foo</a>"]), S.htmls(Sel.tag("a"))
    )


def test_htmls_empty_when_no_match():
    scrape_test("<a>foo</a>", right([]), S.htmls(Sel.tag("b")))


def test_htmls_unclosed_treated_as_closed():
    scrape_test("<a>foo", right(["<a>foo</a>"]), S.htmls(Sel.tag("a")))


def test_inner_html_excludes_root_tags():
    scrape_test("<a>1<b>2</b>3</a>", right("1<b>2</b>3"), S.inner_html(Sel.any_node))


def test_inner_html_empty_for_self_closed():
    scrape_test("<a>", right(""), S.inner_html(Sel.any_node))


def test_inner_htmls_matches_root_nodes():
    scrape_test(
        "<a>foo</a><a>bar</a>", right(["foo", "bar"]), S.inner_htmls(Sel.tag("a"))
    )


def _bind_content(ctx):
    return S.text(Sel.any_node)


def test_position_returns_index_of_matched_node():
    scrape_test(
        "<article><p>A</p><p>B</p><p>C</p></article>",
        right(
            [
                {"index": 0, "content": "A"},
                {"index": 1, "content": "B"},
                {"index": 2, "content": "C"},
            ]
        ),
        S.chroots(
            Sel.nested(Sel.tag("article"), Sel.tag("p")),
            S.position.bind_to("index").bind("content", _bind_content),
        ),
    )


def test_position_most_recently_matched_node():
    scrape_test(
        "<article><p>A</p></article><article><p>B</p><p>C</p></article>",
        right(
            [
                [{"index": 0, "content": "A"}],
                [{"index": 0, "content": "B"}, {"index": 1, "content": "C"}],
            ]
        ),
        S.chroots(
            Sel.tag("article"),
            S.chroots(
                Sel.tag("p"),
                S.position.bind_to("index").bind("content", _bind_content),
            ),
        ),
    )


def _is_foo_list(texts):
    return [t == "foo" for t in texts]


def test_functor_map():
    scrape_test(
        "<a>foo</a><a>bar</a>",
        right([True, False]),
        S.texts(Sel.tag("a")).map(_is_foo_list),
    )


def test_alternative_first_match():
    scrape_test(
        "<a><b>foo</b></a><a><c>bar</c></a>",
        right("foo"),
        S.text(Sel.nested(Sel.tag("a"), Sel.tag("b"))).alt(
            S.text(Sel.nested(Sel.tag("a"), Sel.tag("c")))
        ),
    )


def test_alternative_second_match():
    scrape_test(
        "<a><b>foo</b></a><a><c>bar</c></a>",
        right("bar"),
        S.text(Sel.nested(Sel.tag("a"), Sel.tag("d"))).alt(
            S.text(Sel.nested(Sel.tag("a"), Sel.tag("c")))
        ),
    )


def _contains_b(t):
    return "b" in t


def _then_html(_):
    return S.html(Sel.any_node)


def test_filterable_removes_filtered():
    scrape_test(
        "<a>foo</a><a>bar</a><a>baz</a>",
        right("<a>bar</a>"),
        S.chroot(
            Sel.tag("a"),
            S.text(Sel.any_node).filter(_contains_b).chain(_then_html),
        ),
    )
