"""HTML -> Markdown, ported 1:1 from the reference's biggest example
(``examples/html-to-markdown.ts``, 393 LoC): a mutually recursive
scraper over a FormattedText union, driven by a serial sibling walk
(``stepNext`` + ``repeat`` + ``inSerial``) with an ``alt`` ladder per
node, then a pure FormattedText -> Markdown printer.

FormattedText is a tagged tuple: ``('PlainText', text)``,
``('PlainTexts', texts)``, ``('Header', level, texts)``,
``('Paragraph', texts)``, ``('Bold', texts)``, ``('Italic', texts)``,
``('Link', url, texts)``, ``('Newline',)``.

String cleanup reproduces the reference's *JS* semantics exactly:
``String.replace(str, str)`` rewrites only the FIRST occurrence, and
``removeIndents``/``collapseNewLines`` recurse to a fixpoint
(html-to-markdown.ts:155-196) — so the port uses ``str.replace(.., 1)``
plus the same fixpoint loops, in the same order (strip -> collapse ->
removeIndents).
"""

from __future__ import annotations

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel
import scalpel_ts_spark.core.serial as Serial
from scalpel_ts_spark.core.scraper import Scraper

# --- printer (html-to-markdown.ts:148-228) ---------------------------------


def _replace_first(s: str, old: str, new: str) -> str:
    return s.replace(old, new, 1)


def _escape_md(text: str) -> str:
    for old, new in (
        ("\n", ""),
        ("\\", "\\\\"),
        ("*", "\\*"),
        ("_", "\\_"),
        (">", "&gt;"),
    ):
        text = _replace_first(text, old, new)
    return text


def _fixpoint_replace(raw: str, old: str, new: str) -> str:
    # iterative fixpoint, NOT the reference's one-frame-per-occurrence
    # recursion: this runs inside Spark UDFs over arbitrary documents,
    # and ~1000 occurrences would hit Python's recursion limit
    while True:
        clean = _replace_first(raw, old, new)
        if clean == raw:
            return raw
        raw = clean


def _collapse_newlines(raw: str) -> str:
    return _fixpoint_replace(raw, "\n\n\n\n", "\n\n")


def _remove_indents(raw: str) -> str:
    return _fixpoint_replace(raw, "\n ", "\n")


def _texts_to_md(texts) -> str:
    return " ".join(text_to_markdown(t) for t in texts)


def text_to_markdown(ft) -> str:
    tag = ft[0]
    if tag == "PlainText":
        return _escape_md(ft[1].strip())
    if tag == "PlainTexts":
        return _texts_to_md(ft[1])
    if tag == "Header":
        return "\n" + "#" * ft[1] + " " + _texts_to_md(ft[2]) + "\n\n"
    if tag == "Paragraph":
        return _texts_to_md(ft[1]) + "\n\n"
    if tag == "Bold":
        return "**" + _texts_to_md(ft[1]) + "**"
    if tag == "Italic":
        return "*" + _texts_to_md(ft[1]) + "*"
    if tag == "Link":
        return "[" + _texts_to_md(ft[2]) + "](" + ft[1] + ")"
    if tag == "Newline":
        return "\n\n"
    raise ValueError(f"unknown FormattedText tag: {tag!r}")


def print_md(ft) -> str:
    return _remove_indents(_collapse_newlines(text_to_markdown(ft).strip()))


# --- scrapers (html-to-markdown.ts:252-363) --------------------------------

# formatted_texts is recursive (link/paragraph/bold/... re-enter it on
# the chroot'd child), so bind it late through a module-level trampoline
_inner_serial = None


def _formatted_texts_run(spec):
    return _inner_serial.run(spec)


formatted_texts = Scraper(_formatted_texts_run)


def _recurse_on(selector):
    return S.chroot(Sel.at_depth(selector, 0), formatted_texts)


def _k(value):
    return lambda _ignored: value


_newline = S.matches(Sel.at_depth(Sel.tag("br"), 0)).map(_k(("Newline",)))
_paragraph = _recurse_on(Sel.tag("p")).map(lambda ts: ("Paragraph", ts))
_bold = _recurse_on(Sel.tag("b")).map(lambda ts: ("Bold", ts))
_italic = _recurse_on(Sel.tag("em")).map(lambda ts: ("Italic", ts))
_header_tag = _recurse_on(Sel.tag("header")).map(lambda ts: ("Paragraph", ts))
_plain_text = S.text(Sel.at_depth(Sel.text_node, 0)).map(
    lambda t: ("PlainText", t)
)

_formatting = (
    _newline.alt(_paragraph).alt(_bold).alt(_italic).alt(_header_tag)
    .alt(_plain_text)
)

_headers = None
for _level in range(1, 7):
    _h = _recurse_on(Sel.tag(f"h{_level}")).map(
        (lambda lv: lambda ts: ("Header", lv, ts))(_level)
    )
    _headers = _h if _headers is None else _headers.alt(_h)

_unknown = _recurse_on(Sel.any_node).map(lambda ts: ("PlainTexts", ts))

_skip = None
for _name in ("nav", "noscript", "script"):
    _s = _recurse_on(Sel.tag(_name)).map(_k(("PlainTexts", ())))
    _skip = _s if _skip is None else _skip.alt(_s)

_link = S.chroot(
    Sel.at_depth(Sel.tag("a"), 0),
    S.attr("href", Sel.any_node)
    .bind_to("href")
    .bind("texts", lambda _: formatted_texts)
    .map(lambda d: ("Link", d["href"], d["texts"])),
)

_inner = _formatting.alt(_link).alt(_headers).alt(_skip).alt(_unknown)
_inner_serial = Serial.in_serial(Serial.repeat(Serial.step_next(_inner)))

formatted_text = formatted_texts.map(lambda ts: ("PlainTexts", ts))

#: prefer the article content; fall back to the whole body
content = S.chroot(Sel.tag("article"), formatted_text).alt(
    S.chroot(Sel.tag("body"), formatted_text)
)


def scrape_markdown(html: str):
    """Either form of the example's ``main``: ('right', markdown) |
    ('left', 'Failed to scrape source') — the core runner's Either
    conversion, with the printing mapped inside the scraper."""
    return S.scrape_either(html, content.map(print_md))
