"""Fetching + response decoding (reference ``src/Fetch.ts``).

Two layers:

* **Pure decode + single-URL surface** — :func:`decode_response`
  implements the reference's charset rule (``Fetch.ts:96-142``):
  a response whose content-type contains ``charset=utf-8``
  (case-insensitive) is decoded as fatal UTF-8; any other or absent
  content-type decodes as ISO-8859-1.  Per the WHATWG Encoding
  Standard (which the reference's ``TextDecoder`` follows), the
  ``iso-8859-1`` label resolves to **windows-1252**, whose decoder is
  total — so only the UTF-8 branch can fail, and a fatal decode error
  surfaces as a ``('left', msg)`` Either, mirroring
  ``E.tryCatch(..., String)``.
  :func:`fetch_tags` / :func:`scrape_url` mirror ``fetchTags``
  (``Fetch.ts:188-193``) and ``scrapeURL`` (``Fetch.ts:239-247``) with
  an injectable fetch implementation (the reference's ``FetchConfig``,
  ``Fetch.ts:80-85``) — the sandbox has no network, so tests inject a
  mock exactly like the reference's jest-fetch-mock suite
  (``test/Fetch.test.ts:14-96``).

* **Distributed fetch stage** — :func:`http_fetch_stage` is the
  production fetch operator: ``applyInPandas`` grouped by host, so one
  task owns one host's batch and fetches it **serially** (politeness:
  per-host rate limiting composes with the engine's token-bucket
  budget, which bounds the batch size upstream; cross-host parallelism
  comes from Spark's partitioning).  The fetch implementation is a
  plain ``url -> (status, content_type, body_bytes)`` callable;
  :func:`urllib_fetch` is the real-network default, and the crawl
  engine's synthetic fetcher plugs into the same seam.
"""

from __future__ import annotations

import codecs
from typing import Callable, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from scalpel_ts_spark.core.scraper import NOTHING, scrape
from scalpel_ts_spark.core.tokenizer import parse

# url -> (http_status, content_type_header_or_None, body_bytes)
FetchFn = Callable[[str], Tuple[int, Optional[str], bytes]]


# ---------------------------------------------------------------------------
# charset decoding (Fetch.ts:96-142)
# ---------------------------------------------------------------------------


def _whatwg_c1_fallback(err):
    """WHATWG windows-1252: the five bytes cp1252 leaves undefined
    (0x81 0x8D 0x8F 0x90 0x9D) decode to the same-valued C1 controls,
    making the decoder total — Python's strict cp1252 codec instead
    raises, so this error handler supplies the WHATWG mapping."""
    chunk = err.object[err.start : err.end]
    return "".join(chr(b) for b in chunk), err.end


codecs.register_error("whatwg-windows-1252", _whatwg_c1_fallback)


def decode_iso8859_1(body: bytes) -> str:
    """The reference's ``iso88591Decoder`` (Fetch.ts:113-123).

    The WHATWG ``iso-8859-1`` label resolves to windows-1252 (bytes
    0x80-0x9F are the Windows punctuation set, not C1 controls), and
    the WHATWG windows-1252 decoder cannot fail — matching
    ``new TextDecoder('iso-8859-1', {fatal: true})``, which never
    throws either.
    """
    return body.decode("cp1252", "whatwg-windows-1252")


def is_utf8_type(content_type: str) -> bool:
    """``isType('utf-8')`` (Fetch.ts:96-97): case-insensitive
    substring test for ``charset=utf-8``."""
    return "charset=utf-8" in content_type.lower()


def decode_response(body: bytes, content_type: str | None) -> str:
    """Default decoder (Fetch.ts:125-142): content-type present AND
    advertising utf-8 => fatal UTF-8; otherwise ISO-8859-1.

    Raises ``UnicodeDecodeError`` on invalid UTF-8 (``fatal: true``);
    the ISO-8859-1 branch is total.
    """
    if content_type is not None and is_utf8_type(content_type):
        return body.decode("utf-8")  # strict == fatal
    return decode_iso8859_1(body)


def decode_response_either(body: bytes, content_type: str | None):
    """Either form: ('right', text) | ('left', str(error)) — the
    reference's ``E.tryCatch(decode, String)``."""
    try:
        return ("right", decode_response(body, content_type))
    except UnicodeDecodeError as e:  # only the fatal-UTF-8 branch
        return ("left", str(e))


# ---------------------------------------------------------------------------
# single-URL surface (Fetch.ts:154, :164-247)
# ---------------------------------------------------------------------------


def fetch_tags_raw(html: str) -> list:
    """``fetchTagsRaw`` (Fetch.ts:154): parse a raw HTML string."""
    return parse(html)


def fetch_tags(url: str, fetch_fn: FetchFn, decoder=decode_response_either):
    """``fetchTagsWithConfig``/``fetchTags`` (Fetch.ts:164-193):
    fetch -> decode -> parse, as ('right', tokens) | ('left', msg)."""
    try:
        _status, content_type, body = fetch_fn(url)
    except Exception as e:  # TE.tryCatch(() => fetch(url), String)
        return ("left", str(e))
    decoded = decoder(body, content_type)
    if decoded[0] == "left":
        return decoded
    return ("right", fetch_tags_raw(decoded[1]))


def scrape_url(url: str, scraper, fetch_fn: FetchFn,
               decoder=decode_response_either):
    """``scrapeURL(WithConfig)`` (Fetch.ts:216-247): fetch -> decode ->
    parse -> scrape, Either-style; a failed scraper is
    ('left', 'Failed to scrape source') like ``Fetch.ts:227-230``."""
    tokens = fetch_tags(url, fetch_fn, decoder)
    if tokens[0] == "left":
        return tokens
    value = scrape(scraper, tokens[1])
    if value is NOTHING:
        return ("left", "Failed to scrape source")
    return ("right", value)


def urllib_fetch(url: str, timeout: float = 10.0):
    """Real-network FetchFn on stdlib urllib (no extra deps).

    Unused in the sandbox (no egress) but the production default for
    :func:`http_fetch_stage`; returns (status, content-type, body).
    """
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "scalpel-ts-spark/0.2"})
    with urlopen(req, timeout=timeout) as resp:  # nosec - crawl target
        return (
            resp.status,
            resp.headers.get("Content-Type"),
            resp.read(),
        )


# ---------------------------------------------------------------------------
# distributed fetch stage
# ---------------------------------------------------------------------------

FETCH_RESULT_FIELDS = [
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", StringType()),
    StructField("fetch_error", StringType()),
]


def http_fetch_stage(
    df: DataFrame,
    host_col: str = "host_id",
    url_col: str = "url",
    fetch_fn: FetchFn = urllib_fetch,
) -> DataFrame:
    """Fetch every row's URL, grouped by host: one task = one host's
    batch, fetched serially within the group (per-host politeness),
    hosts in parallel across tasks.

    Output = input columns + (status, content_type, html, fetch_error);
    the body is decoded with the reference charset rule, and a fetch or
    fatal-decode failure lands in ``fetch_error`` with ``html = NULL``
    (Either as columns) rather than failing the stage — a crawl must
    survive bad pages.

    Error taxonomy (a crawl must distinguish "the server answered" from
    "we could not ask"):

    * HTTP responses — including 4xx — are RESULTS: ``status`` carries
      the code, the body decodes into ``html``, ``fetch_error`` stays
      NULL.  A 404/403/410 URL is therefore *fetched* (it enters the
      seen set and leaves the frontier) instead of being re-selected
      every round and starving its host's politeness budget.
      ``urllib.error.HTTPError`` (how urllib surfaces non-2xx) is
      caught specifically and unwrapped into a result.
    * 5xx responses and transport failures (DNS, reset, timeout) are
      RETRYABLE: ``fetch_error`` is set, ``html`` is NULL, and the
      engine leaves the row in the frontier with a bounded retry count
      (CrawlEngine ``max_fetch_retries``), so a transient outage is
      retried but a permanently failing URL is eventually dropped.

    The groupBy shuffles by host itself, so callers should NOT
    pre-repartition (plans/frontier.py skips its row-count repartition
    when a grouped fetch stage is plugged in).
    """
    from urllib.error import HTTPError

    out_schema = StructType(list(df.schema.fields) + FETCH_RESULT_FIELDS)
    in_names = [f.name for f in df.schema.fields]

    def _fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        statuses, ctypes, htmls, errors = [], [], [], []
        for url in pdf[url_col]:
            try:
                try:
                    status, ctype, body = fetch_fn(url)
                except HTTPError as he:
                    if he.code >= 500:
                        raise  # server error: retryable, not a result
                    # 4xx is a response: unwrap it into a result row
                    status = he.code
                    ctype = he.headers.get("Content-Type") if he.headers else None
                    body = he.read() if he.fp is not None else b""
                if status >= 500:
                    raise OSError(f"server error {status} for {url}")
                text = decode_response(body, ctype)
                statuses.append(status)
                ctypes.append(ctype)
                htmls.append(text)
                errors.append(None)
            except Exception as e:
                statuses.append(None)
                ctypes.append(None)
                htmls.append(None)
                errors.append(str(e))
        out = pdf[in_names].copy()
        out["status"] = pd.array(statuses, dtype="Int32")
        out["content_type"] = ctypes
        out["html"] = htmls
        out["fetch_error"] = errors
        return out

    return df.groupBy(host_col).applyInPandas(_fetch_group, out_schema)
