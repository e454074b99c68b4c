"""Golden corpus: fetch + charset decoding (reference test/Fetch.test.ts
:14-96, with jest-fetch-mock replaced by an injected FetchFn — the same
seam the reference's FetchConfig provides)."""

import pytest

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel
from scalpel_ts_spark.core.tokenizer import TagClose, TagOpen
from scalpel_ts_spark.sources.fetch import (
    decode_iso8859_1,
    decode_response,
    decode_response_either,
    fetch_tags,
    fetch_tags_raw,
    scrape_url,
)

A_TOKENS = [TagOpen("a", ()), TagClose("a")]


def mock_response(body: bytes, content_type=None, status=200):
    """jest-fetch-mock's mockResponseOnce as a one-shot FetchFn: the
    second call returns an empty 200 body, matching fetch-mock's
    exhausted-mock behavior exercised at Fetch.test.ts:58-66."""
    calls = {"n": 0}

    def _fetch(url):
        calls["n"] += 1
        if calls["n"] == 1:
            return (status, content_type, body)
        return (200, None, b"")

    return _fetch


# --- Fetch.test.ts:15-17 ---------------------------------------------------


def test_fetch_tags_raw():
    assert fetch_tags_raw("<a></a>") == A_TOKENS


# --- Fetch.test.ts:19-26 (fetchTags) and :28-35 (fetchTagsWithConfig:
# the same path with an explicit config — one seam here) ---------------------


def test_fetch_tags():
    assert fetch_tags("", mock_response(b"<a></a>")) == ("right", A_TOKENS)


# --- Fetch.test.ts:37-42 (scrapeRaw right/left) — already covered by the
# scrape_test golden corpus; re-asserted via the url path below -------------

# --- Fetch.test.ts:44-50 (scrapeURL) and :52-66 (scrapeURLWithConfig:
# first response right, exhausted mock => left) ------------------------------


def test_scrape_url_right():
    scraper = S.html(Sel.tag("a"))
    fetch = mock_response(b"<a>1</a>")
    assert scrape_url("", scraper, fetch) == ("right", "<a>1</a>")
    # second call: the mock is exhausted (empty body) and the scraper
    # fails -> Left, matching Fetch.test.ts:63-65
    assert scrape_url("", scraper, fetch) == (
        "left",
        "Failed to scrape source",
    )


def test_scrape_url_fetch_error_is_left():
    def boom(url):
        raise OSError("connection refused")

    assert scrape_url("", S.html(Sel.tag("a")), boom) == (
        "left",
        "connection refused",
    )


# --- Fetch.test.ts:68-96 (defaultDecoder charset selection) -----------------


def test_default_decoder_uses_utf8_when_content_type_says_so():
    fetch = mock_response(
        "<a>é</a>".encode("utf-8"), "text/html; charset=UTF-8"
    )
    assert fetch_tags("", fetch) == ("right", fetch_tags_raw("<a>é</a>"))


def test_default_decoder_uses_iso_8859_1_on_unknown_charset():
    # Fetch.test.ts:85-96: charset=iso-8859-1 takes the latin-1 branch
    fetch = mock_response(b"<a></a>", "text/html; charset=iso-8859-1")
    assert fetch_tags("", fetch) == ("right", A_TOKENS)


def test_default_decoder_uses_iso_8859_1_when_header_absent():
    # Fetch.ts:129-135: missing content-type => ISO-8859-1
    body = "<a>café</a>".encode("latin-1")
    assert decode_response(body, None) == "<a>café</a>"


# --- decode rule unit cases (Fetch.ts:96-142) -------------------------------


def test_charset_match_is_case_insensitive_substring():
    body = "<p>ü</p>".encode("utf-8")
    assert decode_response(body, "TEXT/HTML; CHARSET=UTF-8") == "<p>ü</p>"
    # a utf-8 body read through the latin-1 branch mojibakes (two chars)
    assert len(decode_response(body, "text/html")) == len("<p>ü</p>") + 1


def test_fatal_utf8_decode_error_is_left():
    bad = b"<a>\xff\xfe</a>"  # invalid UTF-8
    with pytest.raises(UnicodeDecodeError):
        decode_response(bad, "text/html; charset=utf-8")
    side, msg = decode_response_either(bad, "text/html; charset=utf-8")
    assert side == "left" and "utf-8" in msg
    # ...and the same bytes decode fine via the default latin-1 branch
    assert decode_response_either(bad, None)[0] == "right"


def test_iso_8859_1_is_whatwg_windows_1252_and_total():
    # WHATWG: the iso-8859-1 label resolves to windows-1252 — 0x80 is
    # the euro sign, not a C1 control...
    assert decode_iso8859_1(b"\x80") == "€"
    assert decode_iso8859_1(b"\x93ok\x94") == "“ok”"
    # ...and the five cp1252 holes decode to same-valued controls, so
    # the decoder is total over all 256 byte values
    assert decode_iso8859_1(bytes(range(256))) is not None
    assert decode_iso8859_1(b"\x81\x8d\x8f\x90\x9d") == (
        "\x81\x8d\x8f\x90\x9d"
    )


# --- distributed fetch stage -------------------------------------------------


def _fake_http(url):
    """Deterministic network stand-in (top-level: must pickle into the
    grouped-map UDF)."""
    if url.endswith("/bad-utf8"):
        return (200, "text/html; charset=utf-8", b"<a>\xff</a>")
    if url.endswith("/boom"):
        raise OSError("connection reset")
    return (200, "text/html; charset=utf-8", f"<a>{url}</a>".encode())


def test_http_fetch_stage_per_host_either_columns(spark):
    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    rows = [
        ("http://h0.test/p/0", 0),
        ("http://h0.test/p/1", 0),
        ("http://h1.test/bad-utf8", 1),
        ("http://h2.test/boom", 2),
    ]
    df = spark.createDataFrame(rows, ["url", "host_id"])
    out = {r["url"]: r for r in http_fetch_stage(df, fetch_fn=_fake_http).collect()}
    ok = out["http://h0.test/p/0"]
    assert ok["status"] == 200 and ok["fetch_error"] is None
    assert ok["html"] == "<a>http://h0.test/p/0</a>"
    # fatal UTF-8 decode failure -> error column, stage survives
    bad = out["http://h1.test/bad-utf8"]
    assert bad["html"] is None and "utf-8" in bad["fetch_error"]
    # fetch exception -> error column, stage survives
    boom = out["http://h2.test/boom"]
    assert boom["html"] is None and "connection reset" in boom["fetch_error"]
