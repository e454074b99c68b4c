"""Shared helpers for the golden corpus ported from the reference
test suite (reference: test/test-utils.ts:8-15)."""

from scalpel_ts_spark.core.scraper import scrape_either

FAIL = ("left", "Failed to scrape source")


def right(v):
    return ("right", v)


def scrape_test(html, expected, scraper):
    actual = scrape_either(html, scraper)
    assert actual == expected, f"{actual!r} != {expected!r} for {html!r}"
