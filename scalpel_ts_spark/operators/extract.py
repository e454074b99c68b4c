"""Extraction operators: Arrow-batched pandas UDFs over the core.

The single-document core (scalpel_ts_spark.core) is pure Python and
picklable, so a compiled scraper travels to executors inside the UDF
closure — the Spark-side plan stays fully declarative and Catalyst can
prune/push down around the UDF.  Each UDF parses a document ONCE and
runs every requested scraper against the same TagSpec.

Scale notes:
* ``pandas_udf`` (Series -> Series/DataFrame) keeps transfer in Arrow
  batches (spark.sql.execution.arrow.maxRecordsPerBatch) — no
  per-row Python at the Spark boundary.
* Catalyst cannot see inside a UDF, so :func:`with_tag_signature`
  materializes a cheap per-doc ``tag_names`` column at ingest; filters
  like ``array_contains(tag_names, 'h2')`` then prune documents
  *before* the expensive extract UDF runs (and push down to the
  parquet/Iceberg scan on re-read).
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from scalpel_ts_spark.core.scraper import NOTHING, Scraper
from scalpel_ts_spark.core.tag_spec import TagSpec, tags_to_spec
from scalpel_ts_spark.core.tokenizer import TagOpen, Text, parse

# The interleaved text+media span schema (BASELINE.json input_hint).
SPAN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
)

# media tags -> span kind
MEDIA_KINDS = {
    "img": "image",
    "audio": "audio",
    "video": "video",
    "embed": "embed",
}


class SpanExtractor(Scraper):
    """Scraper producing the interleaved (kind, text, media_ref, offset)
    span sequence of a document in token order.

    Text tokens become ``text`` spans; media open tags (img/audio/
    video/embed) become media spans whose ``media_ref`` is their
    src attribute.  ``offset`` is the ordinal in the interleaved
    sequence — the per-row invariant checked against the reference is
    (kind, text, media_ref, order).
    """

    __slots__ = ()

    def __init__(self):
        super().__init__(self._run)

    def _run(self, spec: TagSpec):
        spans = []
        ordinal = 0
        for info in spec.tags:
            tok = info.token
            kind = type(tok)
            if kind is Text:
                spans.append(
                    {
                        "kind": "text",
                        "text": tok.text,
                        "media_ref": None,
                        "offset": ordinal,
                    }
                )
                ordinal += 1
            elif kind is TagOpen:
                media = MEDIA_KINDS.get(tok.name)
                if media is not None:
                    src = None
                    for k, v in tok.attributes:
                        if k == "src":
                            src = v
                            break
                    spans.append(
                        {
                            "kind": media,
                            "text": None,
                            "media_ref": src,
                            "offset": ordinal,
                        }
                    )
                    ordinal += 1
        return spans

    def __reduce__(self):
        return (SpanExtractor, ())


def scrape_udf(scraper: Scraper, return_type):
    """Generic factory: run ``scraper`` per document over Arrow batches.

    The scraper's result must be representable in ``return_type``
    (NOTHING becomes NULL).
    """

    @F.pandas_udf(return_type)
    def _udf(html: pd.Series) -> pd.Series:
        out = []
        run = scraper.run
        for doc in html:
            if doc is None:
                out.append(None)
                continue
            v = run(tags_to_spec(parse(doc)))
            out.append(None if v is NOTHING else v)
        return pd.Series(out)

    return _udf


def extract_spans_udf():
    """html -> interleaved span sequence (SPAN_SCHEMA)."""
    return scrape_udf(SpanExtractor(), SPAN_SCHEMA)


CRAWL_EXTRACT_SCHEMA = StructType(
    [
        StructField("spans", SPAN_SCHEMA),
        StructField("links", ArrayType(StringType())),
        StructField("title", StringType()),
    ]
)


def crawl_extract_udf(link_scraper: Optional[Scraper] = None):
    """(url, html) -> struct(spans, links, title) in ONE parse per doc.

    links are href attributes of anchor tags (reference combinator
    ``attrs('href', tag('a'))``) resolved against the document URL;
    title is ``text(tag('title'))``.
    """
    import scalpel_ts_spark.core.scraper as S
    import scalpel_ts_spark.core.select as Sel

    span_scraper = SpanExtractor()
    links_scraper = link_scraper or S.attrs("href", Sel.tag("a"))
    title_scraper = S.text(Sel.tag("title"))

    @F.pandas_udf(CRAWL_EXTRACT_SCHEMA)
    def _udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        spans_out, links_out, title_out = [], [], []
        for u, doc in zip(url, html):
            if doc is None:
                spans_out.append(None)
                links_out.append(None)
                title_out.append(None)
                continue
            spec = tags_to_spec(parse(doc))
            spans = span_scraper.run(spec)
            raw_links = links_scraper.run(spec)
            title = title_scraper.run(spec)
            if raw_links is NOTHING:
                links = []
            else:
                links = [urljoin(u, link) for link in raw_links]
            spans_out.append(None if spans is NOTHING else spans)
            links_out.append(links)
            title_out.append(None if title is NOTHING else title)
        return pd.DataFrame(
            {"spans": spans_out, "links": links_out, "title": title_out}
        )

    return _udf


def tag_signature_udf():
    """html -> sorted distinct tag names (materialized pushdown column)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(html: pd.Series) -> pd.Series:
        out = []
        for doc in html:
            if doc is None:
                out.append(None)
                continue
            names = {
                t.name for t in parse(doc) if type(t) is TagOpen
            }
            out.append(sorted(names))
        return pd.Series(out)

    return _udf


def with_tag_signature(df, html_col: str = "html", out_col: str = "tag_names"):
    return df.withColumn(out_col, tag_signature_udf()(F.col(html_col)))


def selector_prefilter(selector, tag_names_col: str = "tag_names"):
    """Cheap Column prefilter for a compiled selector: every SelectOne
    tag in the selector must appear in the doc's tag signature.

    This is the engine's materialized-signature pushdown: it prunes
    documents before the opaque extract UDF (SURVEY.md §4.2).
    """
    cond = F.lit(True)
    for selection in selector:
        if selection.strategy == "one" and selection.tag:
            cond = cond & F.array_contains(F.col(tag_names_col), selection.tag)
    return cond
