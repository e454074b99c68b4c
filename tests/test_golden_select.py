"""Golden corpus: selector behavior (reference test/Select.test.ts:79-496)."""

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel
import scalpel_ts_spark.core.serial as Serial
from scalpel_ts_spark.core.select import MATCH_OK, _check_settings, lift_siblings
from scalpel_ts_spark.core.tag_forest import TagNode
from scalpel_ts_spark.core.tag_spec import tags_to_spec
from scalpel_ts_spark.core.tokenizer import parse

from tests.golden import right, scrape_test


# --- tag (Select.test.ts:79-91) ---

def test_tag_selects_specified_tag():
    scrape_test("<a>1</a>", right("1"), S.text(Sel.tag("a")))


def test_tag_lowercase_selector_matches_any_case():
    scrape_test(
        "<a>foo</a><A>bar</A>", right(["foo", "bar"]), S.texts(Sel.tag("a"))
    )


def test_tag_uppercase_selector_matches_any_case():
    scrape_test(
        "<a>foo</a><A>bar</A>", right(["foo", "bar"]), S.texts(Sel.tag("A"))
    )


# --- any (Select.test.ts:93-109) ---

def test_any_selects_any_node():
    scrape_test("<a>1</a>", right("1"), S.text(Sel.any_node))


def test_any_matches_root_node():
    scrape_test("<a>1<b>2<c>3</c>4</b>5</a>", right("12345"), S.text(Sel.any_node))


def test_any_selects_text_nodes_at_depth_0():
    scrape_test(
        "1<a>2</a>3<b>4<c>5</c>6</b>7",
        right(["1", "2", "3", "456", "7"]),
        S.texts(Sel.at_depth(Sel.any_node, 0)),
    )


# --- text (Select.test.ts:111-123) ---

def test_text_selects_a_text_node():
    scrape_test("<a>1</a>", right("1"), S.text(Sel.text_node))


def test_text_selects_each_text_node():
    scrape_test(
        "1<a>2</a>3<b>4<c>5</c>6</b>7",
        right(["1", "2", "3", "4", "5", "6", "7"]),
        S.texts(Sel.text_node),
    )


# --- withAttributes (Select.test.ts:125-133) ---

def test_with_attributes_obeys_predicates():
    scrape_test(
        '<a>foo</a><a key="value">bar</a>',
        right(['<a key="value">bar</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.attribute("key", "value")])),
    )


# --- anyWithAttributes (Select.test.ts:135-151) ---

def test_any_with_attributes_matches_any_tag():
    scrape_test(
        '<a foo="value">foo</a><b bar="value">bar</b>',
        right(['<a foo="value">foo</a>', '<b bar="value">bar</b>']),
        S.htmls(Sel.any_with_attributes([Sel.any_attribute("value")])),
    )


def test_any_with_attributes_requires_attribute():
    scrape_test(
        '<a foo="other">foo</a><b bar="value">bar</b>',
        right(['<b bar="value">bar</b>']),
        S.htmls(Sel.any_with_attributes([Sel.any_attribute("value")])),
    )


# --- attribute (Select.test.ts:153-177) ---

def test_attribute_key_case_insensitive():
    scrape_test(
        "<a B=C>foo</a>",
        right(["foo"]),
        S.texts(Sel.with_attributes("A", [Sel.attribute("b", "C")])),
    )


def test_attribute_value_case_sensitive():
    scrape_test(
        "<a B=C>foo</a>",
        right([]),
        S.texts(Sel.with_attributes("A", [Sel.attribute("b", "c")])),
    )


def test_attribute_not_p_inverts():
    scrape_test(
        "<a>foo</a><a B=C>bar</a><a B=D>baz</a>",
        right(["foo", "baz"]),
        S.texts(Sel.with_attributes("a", [Sel.not_p(Sel.attribute("b", "C"))])),
    )


# --- anyAttribute (Select.test.ts:179-195) ---

def test_any_attribute_matches_any_key():
    scrape_test(
        '<a foo="value">foo</a><a bar="value">bar</a>',
        right(['<a foo="value">foo</a>', '<a bar="value">bar</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.any_attribute("value")])),
    )


def test_any_attribute_requires_value():
    scrape_test(
        '<a foo="other">foo</a><a bar="value">bar</a>',
        right(['<a bar="value">bar</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.any_attribute("value")])),
    )


# --- attributeRegex / anyAttributeRegex (Select.test.ts:197-225) ---

def test_attribute_regex():
    scrape_test(
        '<a key="value">foo</a>',
        right(['<a key="value">foo</a>']),
        S.htmls(
            Sel.with_attributes("a", [Sel.attribute_regex("key", "va(foo|bar|lu)e")])
        ),
    )


def test_any_attribute_regex_matches_any_key():
    scrape_test(
        '<a foo="value">foo</a><a bar="value">bar</a>',
        right(['<a foo="value">foo</a>', '<a bar="value">bar</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.any_attribute_regex("va(foo|bar|lu)e")])),
    )


def test_any_attribute_regex_requires_value_match():
    scrape_test(
        '<a foo="other">foo</a><a bar="value">bar</a>',
        right(['<a bar="value">bar</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.any_attribute_regex("va(foo|bar|lu)e")])),
    )


# --- atDepth (Select.test.ts:227-296) ---

def test_at_depth_children_at_depth():
    scrape_test(
        "<a><b>1</b><c><b>2</b></c></a>",
        right(["2"]),
        S.texts(Sel.nested(Sel.tag("a"), Sel.at_depth(Sel.tag("b"), 2))),
    )
    scrape_test(
        "<a><b>1</b><c><b>2</b></c></a>",
        right(["2"]),
        S.texts(Sel.at_depth(Sel.nested(Sel.tag("a"), Sel.tag("b")), 2)),
    )


def test_at_depth_no_selector_no_effect():
    scrape_test(
        "<a><b>1</b><c><b>2</b></c></a>",
        right(["12"]),
        S.texts(Sel.nested(Sel.tag("a"), Sel.at_depth((), 2))),
    )


def test_at_depth_composes_with_attribute_predicates():
    scrape_test(
        "<a><b class='foo'>1</b><c><b class='foo'>2</b></c></a>",
        right(["2"]),
        S.texts(
            Sel.nested(
                Sel.tag("a"),
                Sel.at_depth(Sel.with_attributes("b", [Sel.has_class("foo")]), 2),
            )
        ),
    )


def test_at_depth_tags_closed_out_of_order_full_context():
    scrape_test(
        "<a><b><c><d>1</d></b></c></a>",
        right(["1"]),
        S.texts(Sel.nested(Sel.tag("a"), Sel.at_depth(Sel.tag("d"), 3))),
    )


def test_at_depth_culls_matches_exceeding_depth():
    scrape_test(
        "<a><b><c>1</c><a><b><c></c></b></a></b></a>",
        right([]),
        Serial.in_serial(
            Serial.repeat(
                Serial.seek_next(
                    S.html(
                        Sel.nested(
                            Sel.nested(
                                Sel.tag("a"), Sel.at_depth(Sel.tag("b"), 2)
                            ),
                            Sel.tag("c"),
                        )
                    )
                )
            )
        ),
    )


# --- nested (Select.test.ts:324-382) ---

def test_nested_matches_deepest_node():
    scrape_test(
        "<a><b><c>foo</c></b></a>",
        right(["<c>foo</c>"]),
        S.htmls(
            Sel.nested(Sel.nested(Sel.tag("a"), Sel.tag("b")), Sel.tag("c"))
        ),
    )


def test_nested_skips_irrelevant_nodes():
    scrape_test(
        "<c><a><b>foo</b></a></c><c><a><d><b>bar</b></d></a></c><b>baz</b>",
        right(["<b>foo</b>", "<b>bar</b>"]),
        S.htmls(Sel.nested(Sel.tag("a"), Sel.tag("b"))),
    )


def test_nested_forces_descent_before_matching():
    scrape_test(
        '<div id="outer"><div id="inner">inner text</div></div>',
        right(["inner"]),
        S.attrs("id", Sel.nested(Sel.tag("div"), Sel.tag("div"))),
    )


def test_nested_div_div_div_matches_twice():
    scrape_test(
        '<div id="a"><div id="b"><div id="c"></div></div></div>',
        right(["b", "c"]),
        S.attrs("id", Sel.nested(Sel.tag("div"), Sel.tag("div"))),
    )


def test_nested_tags_closed_out_of_order():
    scrape_test(
        "<a><b><c><d>2</d></b></c></a>",
        right(["2"]),
        S.texts(Sel.nested(Sel.tag("b"), Sel.tag("d"))),
    )


def test_nested_out_of_order_root_1():
    scrape_test(
        "<b><c><d>2</d></b></c>",
        right(["2"]),
        S.texts(Sel.nested(Sel.tag("b"), Sel.tag("d"))),
    )


def test_nested_out_of_order_root_2():
    scrape_test(
        "<b><c><d>2</d></b></c>",
        right(["2"]),
        S.texts(Sel.nested(Sel.tag("c"), Sel.tag("d"))),
    )


# --- hasClass (Select.test.ts:384-400) ---

def test_has_class_multiple_classes():
    scrape_test(
        '<a class="a b">foo</a>',
        right(['<a class="a b">foo</a>']),
        S.htmls(Sel.with_attributes("a", [Sel.has_class("a")])),
    )


def test_has_class_requires_class():
    scrape_test(
        '<a class="a b">foo</a>',
        right([]),
        S.htmls(Sel.with_attributes("a", [Sel.has_class("c")])),
    )


# --- notP (Select.test.ts:402-410) ---

def test_not_p_negates():
    scrape_test(
        '<a>foo</a><a class="a b">bar</a><a class="b">baz</a>',
        right(["foo", "baz"]),
        S.texts(Sel.with_attributes("a", [Sel.not_p(Sel.has_class("a"))])),
    )


# --- match (Select.test.ts:412-420) ---

def _key_equals_value(key, value):
    return key == value


def test_match_custom_predicate():
    scrape_test(
        '<a foo="bar">1</a><a foo="foo">2</a><a bar="bar">3</a>',
        right(['<a foo="foo">2</a>', '<a bar="bar">3</a>']),
        S.htmls(Sel.any_with_attributes([Sel.match(_key_equals_value)])),
    )


# --- checkSettings (Select.test.ts:424-435) ---

def test_check_settings_empty_hierarchy_ok():
    spec = tags_to_spec(parse(""))
    assert _check_settings(1, spec.hierarchy, spec.hierarchy) == MATCH_OK


# --- liftSiblings (Select.test.ts:437-461) ---

def test_lift_siblings_none_found():
    forest = [TagNode(4, 10, [])]
    assert lift_siblings([], 3, 9, forest) == []


def test_lift_siblings_lifts_valid():
    forest = [TagNode(5, 6, [])]
    assert lift_siblings([], 3, 9, forest) == [TagNode(5, 6, [])]


def test_lift_siblings_lifts_from_subforests():
    forest = [TagNode(4, 10, [TagNode(5, 6, []), TagNode(7, 8, [])])]
    assert lift_siblings([], 3, 9, forest) == [
        TagNode(5, 6, []),
        TagNode(7, 8, []),
    ]


# --- DFS traversal (Select.test.ts:464-496) ---

def test_dfs_1():
    scrape_test(
        "<div><p>p1</p><p>p2</p><blockquote><p>p3</p></blockquote><p>p4</p>",
        right(["p1", "p2", "p3", "p4"]),
        S.texts(Sel.tag("p")),
    )


def test_dfs_2():
    scrape_test(
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        right(["1", "2", "3"]),
        S.texts(Sel.tag("a")),
    )


def test_dfs_3():
    scrape_test(
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        right(["1", "2", "3"]),
        S.texts(Sel.nested(Sel.tag("a"), Sel.tag("b"))),
    )


def test_dfs_4():
    scrape_test(
        "<a><b>1</b></a><a><b>2</b></a><a><b>3</b></a>",
        right(["1", "2", "3"]),
        S.texts(Sel.tag("b")),
    )
