"""RFC 9309 robots.txt parsing + the distributed filter stage."""

from pyspark.sql import functions as F

from scalpel_ts_spark.functions.robots import (
    is_allowed,
    parse_robots,
    robots_filter_stage,
)

RFC_EXAMPLE = """
# comments everywhere
User-agent: *
Disallow: /private/
Allow: /private/public.html

User-agent: examplebot
Allow: /
Disallow: /cgi-bin/

user-agent: otherbot
user-agent: thirdbot
disallow: /shared/
"""


def _decide(text, agent, path):
    return is_allowed(parse_robots(text, agent), path)


def test_fallback_star_group():
    assert not _decide(RFC_EXAMPLE, "randombot", "/private/secret.html")
    # longest-match: the Allow for public.html is longer than /private/
    assert _decide(RFC_EXAMPLE, "randombot", "/private/public.html")
    assert _decide(RFC_EXAMPLE, "randombot", "/open/page")


def test_specific_group_beats_star():
    assert _decide(RFC_EXAMPLE, "ExampleBot/1.2", "/private/secret.html")
    assert not _decide(RFC_EXAMPLE, "ExampleBot/1.2", "/cgi-bin/x")


def test_multi_agent_group_and_case_insensitive_fields():
    assert not _decide(RFC_EXAMPLE, "OtherBot", "/shared/a")
    assert not _decide(RFC_EXAMPLE, "ThirdBot", "/shared/a")
    assert _decide(RFC_EXAMPLE, "ThirdBot", "/else")


def test_wildcards_and_anchor():
    txt = """
User-agent: *
Disallow: /*.gif$
Disallow: /fish*.php
Allow: /fish-heads.php
"""
    assert not _decide(txt, "x", "/a/b/c.gif")
    assert _decide(txt, "x", "/a/b/c.gift")  # $ anchors the end
    assert not _decide(txt, "x", "/fishy.php")
    # tie-break: equal-length patterns -> Allow wins; here Allow is
    # longer anyway (longest match)
    assert _decide(txt, "x", "/fish-heads.php")


def test_empty_disallow_and_no_groups():
    assert _decide("User-agent: *\nDisallow:", "x", "/anything")
    assert _decide("", "x", "/anything")
    # rules before any user-agent line are ignored
    assert _decide("Disallow: /\nUser-agent: *\nAllow: /", "x", "/a")


def test_second_ua_block_starts_new_group():
    txt = """
User-agent: a
Disallow: /a-only/

User-agent: b
Disallow: /b-only/
"""
    assert not _decide(txt, "a", "/a-only/x")
    assert _decide(txt, "a", "/b-only/x")
    assert not _decide(txt, "b", "/b-only/x")


def test_robots_filter_stage_cogrouped(spark):
    robots = spark.createDataFrame(
        [
            (0, "User-agent: *\nDisallow: /blocked/"),
            (1, "User-agent: *\nDisallow: /\nAllow: /ok/"),
            # host 2 has no robots row: everything allowed
        ],
        ["host_id", "robots_txt"],
    )
    cand = spark.createDataFrame(
        [
            (0, "/blocked/a"),
            (0, "/fine"),
            (1, "/ok/page"),
            (1, "/nope"),
            (2, "/anything"),
        ],
        ["host_id", "path"],
    )
    kept = {
        (r["host_id"], r["path"])
        for r in robots_filter_stage(cand, robots).collect()
    }
    assert kept == {(0, "/fine"), (1, "/ok/page"), (2, "/anything")}
