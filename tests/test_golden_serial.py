"""Golden corpus: serial scrapers (reference test/SerialScraper.test.ts)."""

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel
import scalpel_ts_spark.core.serial as Z

from tests.golden import FAIL, right, scrape_test


def test_in_serial_visits_immediate_children_in_chroot():
    scrape_test(
        "<parent><a>1</a><b>2</b></parent>",
        right(["1", "2"]),
        S.chroot(
            Sel.tag("parent"),
            Z.in_serial(Z.repeat(Z.step_next(S.text(Sel.any_node)))),
        ),
    )


def test_in_serial_fails_on_empty_source():
    scrape_test(
        "",
        FAIL,
        Z.in_serial(Z.repeat(Z.seek_next(S.text(Sel.any_node)))),
    )


def test_repeat_matches_repeatedly():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right(["1", "2", "3"]),
        Z.in_serial(Z.repeat(Z.step_next(S.text(Sel.any_node)))),
    )


def test_repeat_empty_when_no_match():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right([]),
        Z.in_serial(Z.repeat(Z.step_next(S.text(Sel.tag("p"))))),
    )


def test_repeat1_matches_repeatedly():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right(["1", "2", "3"]),
        Z.in_serial(Z.repeat1(Z.step_next(S.text(Sel.any_node)))),
    )


def test_repeat1_fails_when_no_match():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        FAIL,
        Z.in_serial(Z.repeat1(Z.step_next(S.text(Sel.tag("p"))))),
    )


def test_step_back_moves_context_back():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right(["1", "2", "3", "2", "1"]),
        Z.in_serial(
            Z.sequence(
                [
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_back(S.text(Sel.any_node)),
                    Z.step_back(S.text(Sel.any_node)),
                ]
            )
        ),
    )


def test_step_next_off_end_without_reading():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right(["1", "2", "3", "2", "1"]),
        Z.in_serial(
            Z.sequence(
                [
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_next(S.text(Sel.any_node)),
                    Z.step_back(S.text(Sel.any_node)),
                    Z.step_back(S.text(Sel.any_node)),
                ]
            )
        ),
    )


def test_step_next_fails_off_end_and_reading():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        FAIL,
        Z.in_serial(
            Z.sequence([Z.step_next(S.text(Sel.any_node))] * 4)
        ),
    )


def _then_step_p(_):
    return Z.step_next(S.text(Sel.tag("p")))


def test_step_next_selecting_siblings():
    scrape_test(
        "<p class='something'>Here</p><p>Other stuff that matters</p>",
        right("Other stuff that matters"),
        Z.in_serial(
            Z.seek_next(
                S.matches(Sel.with_attributes("p", [Sel.has_class("something")]))
            ).chain(_then_step_p)
        ),
    )


def test_seek_back_off_end_without_reading():
    scrape_test(
        "<a>1</a><b>2</b><c>3</c>",
        right(["3", "1"]),
        Z.in_serial(
            Z.sequence(
                [
                    Z.seek_next(S.text(Sel.tag("c"))),
                    Z.seek_back(S.text(Sel.tag("a"))),
                ]
            )
        ),
    )


def test_seek_next_skips_nodes():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        right(["2", "3"]),
        Z.in_serial(
            Z.sequence(
                [
                    Z.seek_next(S.text(Sel.tag("b"))),
                    Z.seek_next(S.text(Sel.tag("a"))),
                ]
            )
        ),
    )


def test_seek_next_fails_without_match():
    scrape_test(
        "<a>1</a><b>2</b><a>3</a>",
        FAIL,
        Z.in_serial(Z.seek_next(S.text(Sel.tag("c")))),
    )


def _bind_paragraphs(ctx):
    return Z.repeat(Z.step_next(S.text(Sel.tag("p"))))


def test_seek_next_with_chroot_h2_p_sections():
    scrape_test(
        """ <body>
              <h1>title1</h1>
              <h2>title2 1</h2>
              <p>text 1</p>
              <p>text 2</p>
              <h2>title2 2</h2>
              <p>text 3</p>
              <h2>title2 3</h2>
            </body>""",
        right(
            [
                {"title": "title2 1", "paragraphs": ["text 1", "text 2"]},
                {"title": "title2 2", "paragraphs": ["text 3"]},
                {"title": "title2 3", "paragraphs": []},
            ]
        ),
        S.chroot(
            Sel.tag("body"),
            Z.in_serial(
                Z.repeat(
                    Z.seek_next(S.text(Sel.tag("h2")))
                    .bind_to("title")
                    .bind("paragraphs", _bind_paragraphs)
                )
            ),
        ),
    )


def _bind_backwards(ctx):
    return Z.until_back(
        S.matches(Sel.tag("b")),
        Z.repeat(Z.step_back(S.text(Sel.tag("a")))),
    )


def _bind_head(ctx):
    return Z.step_back(S.attr("foo", Sel.tag("b")))


def _to_tuple(ctx):
    return (ctx["head"], ctx["forwards"], ctx["backwards"])


def test_until_back_leaves_focus_at_end():
    scrape_test(
        "<b foo=bar /><a>1</a><a>2</a><a>3</a>",
        right(("bar", ["1", "2", "3"], ["2", "1"])),
        Z.in_serial(
            Z.repeat(Z.seek_next(S.text(Sel.tag("a"))))
            .bind_to("forwards")
            .bind("backwards", _bind_backwards)
            .bind("head", _bind_head)
            .map(_to_tuple)
        ),
    )


def test_until_next_stops_on_first_match():
    scrape_test(
        "1<a>2</a><b>3</b>",
        right(["1", "2"]),
        Z.in_serial(
            Z.until_next(
                S.matches(Sel.tag("b")),
                Z.repeat(Z.step_next(S.text(Sel.any_node))),
            )
        ),
    )


def test_until_next_exhausts_zipper_without_match():
    scrape_test(
        "1<a>2</a><b>3</b>",
        right(["1", "2", "3"]),
        Z.in_serial(
            Z.until_next(
                S.matches(Sel.tag("c")),
                Z.repeat(Z.step_next(S.text(Sel.any_node))),
            )
        ),
    )


def _then_read_b(_):
    return Z.step_next(S.text(Sel.tag("b")))


def test_until_next_leaves_focus_at_match():
    scrape_test(
        "1<a>2</a><b>3</b>",
        right("3"),
        Z.in_serial(
            Z.until_next(
                S.matches(Sel.tag("b")),
                Z.repeat(Z.step_next(S.text(Sel.any_node))),
            ).chain(_then_read_b)
        ),
    )


def test_until_next_creates_valid_empty_context():
    scrape_test(
        "<a>1</a><a>2</a>",
        right("1"),
        Z.in_serial(
            Z.until_next(S.matches(Sel.tag("a")), Z.of(None)).ap_second(
                Z.step_next(S.text(Sel.tag("a")))
            )
        ),
    )


def test_until_next_fails_to_scrape_empty_context():
    scrape_test(
        "<a>1</a><a>2</a>",
        FAIL,
        Z.in_serial(
            Z.until_next(
                S.matches(Sel.tag("a")),
                Z.step_next(S.text(Sel.any_node)),
            ).ap_second(Z.step_next(S.text(Sel.tag("a"))))
        ),
    )


def test_alternative_serial_contexts():
    scrape_test(
        "1<a foo=bar>2</a>3",
        right(["1", "bar", "3"]),
        Z.in_serial(
            Z.repeat(
                Z.step_next(
                    S.text(Sel.at_depth(Sel.text_node, 0))
                ).alt(
                    Z.step_next(
                        S.attr("foo", Sel.at_depth(Sel.tag("a"), 0))
                    )
                )
            )
        ),
    )
