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


def test_agent_matching_is_prefix_of_product_token():
    # substring-but-not-prefix groups must NOT capture us ("park" is
    # inside "scalpel-ts-spark" but is no prefix); prefix groups do
    txt = "User-agent: park\nDisallow: /\nUser-agent: *\nAllow: /"
    assert _decide(txt, "scalpel-ts-spark/0.2", "/x")
    pfx = "User-agent: scalpel\nDisallow: /priv/\nUser-agent: *\nAllow: /"
    assert not _decide(pfx, "scalpel-ts-spark/0.2", "/priv/x")


def test_non_group_fields_do_not_split_ua_runs():
    # Crawl-delay/Sitemap between UA lines must not orphan the first
    # agent into an empty group
    txt = "User-agent: a\nCrawl-delay: 10\nUser-agent: b\nDisallow: /x"
    assert not _decide(txt, "a", "/x/1")
    assert not _decide(txt, "b", "/x/1")


def test_null_path_candidates_are_dropped_not_crashing(spark):
    robots = spark.createDataFrame(
        [(0, "User-agent: *\nAllow: /")], ["host_id", "robots_txt"]
    )
    cand = spark.createDataFrame(
        [(0, "/fine"), (0, None), (1, None)], ["host_id", "path"]
    )
    kept = {
        (r["host_id"], r["path"])
        for r in robots_filter_stage(cand, robots).collect()
    }
    assert kept == {(0, "/fine")}


def test_crawl_delay_group_selection():
    from scalpel_ts_spark.functions.robots import crawl_delay

    body = """
User-agent: *
Crawl-delay: 2
Disallow: /tmp

User-agent: scalpel
Crawl-delay: 0.5
Allow: /
"""
    # longest matching group's delay wins; * is the fallback
    assert crawl_delay(body, "scalpel-ts-spark/0.2") == 0.5
    assert crawl_delay(body, "otherbot") == 2.0
    assert crawl_delay("User-agent: *\nDisallow:", "x") is None
    # invalid / negative values are ignored
    assert crawl_delay("User-agent: *\nCrawl-delay: soon", "x") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: -3", "x") is None
    # crawl-delay binds to the agents collected SO FAR but (like
    # sitemap) does not close the UA run: b joins a's group for the
    # Disallow, yet only a carries the delay
    two = "User-agent: a\nCrawl-delay: 7\nUser-agent: b\nDisallow: /x"
    assert crawl_delay(two, "a") == 7.0
    assert crawl_delay(two, "b") is None
    from scalpel_ts_spark.functions.robots import is_allowed, parse_robots

    assert not is_allowed(parse_robots(two, "a"), "/x/1")
    assert not is_allowed(parse_robots(two, "b"), "/x/1")


def test_host_crawl_delays_frame(spark):
    from scalpel_ts_spark.functions.robots import host_crawl_delays

    rows = [
        (1, "User-agent: *\nCrawl-delay: 3\nDisallow: /p"),
        (2, "User-agent: *\nDisallow: /p"),  # no delay declared
        (3, None),  # unreachable robots
        (4, "User-agent: scalpel\nCrawl-delay: 1.5"),
    ]
    robots = spark.createDataFrame(rows, "host_id long, robots_txt string")
    got = {
        r.host_id: r.crawl_delay for r in host_crawl_delays(robots).collect()
    }
    assert got == {1: 3.0, 4: 1.5}


def test_empty_user_agent_line_is_ignored():
    """A bare 'User-agent:' line must not create an empty group token
    (it would prefix-match every crawler and outrank the explicit '*'
    fallback); it is ignored like any unparseable line."""
    txt = "User-agent:\nDisallow: /\n\nUser-agent: *\nDisallow:\n"
    # the '*' group (allow everything) applies, not the malformed one
    assert parse_robots(txt, "scalpel-ts-spark") == []
    assert _decide(txt, "scalpel-ts-spark", "/anything")


def test_mislabeled_charset_robots_parsed_not_blacklisted(spark):
    """A 2xx robots.txt whose advertised utf-8 charset lies (cp1252
    bytes) decodes best-effort — RFC 9309 scopes complete-disallow to
    5xx/unreachable, never to a decode hiccup on a SUCCESSFUL fetch."""
    from scalpel_ts_spark.functions.robots import (
        DISALLOW_ALL,
        http_robots_stage,
    )

    body = b"User-agent: *\nDisallow: /priv\x92ate\n"  # invalid utf-8

    def fetch_fn(url):
        return 200, "text/plain; charset=utf-8", body

    df = spark.createDataFrame(
        [("http://h0.test/", 0)], "url string, host_id bigint"
    )
    row = http_robots_stage(fetch_fn)(df).collect()[0]
    assert row["robots_txt"] != DISALLOW_ALL
    assert "User-agent: *" in row["robots_txt"]
