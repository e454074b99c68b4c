"""HTML tokenizer with htmlparser2-compatible observable behavior.

The reference engine (scalpel-ts) tokenizes HTML with htmlparser2@5.0.1
(``recognizeSelfClosing: true``) and post-processes the callback stream
(reference: src/Internal/Html/Tokenizer.ts:183-242).  Span equality of
every downstream structure depends on reproducing that exact token
stream, so this module re-implements the *observable* behavior from
scratch as a small scanner:

* tag names and attribute keys are lowercased; attribute values are
  entity-decoded; duplicate attribute keys keep the first value
* attributes are exposed in sorted-key order (the reference collects
  the attribute record with fp-ts ``ReadonlyRecord.collect``, which
  iterates object keys in sorted order)
* text nodes are trimmed; whitespace-only text is dropped
  (Tokenizer.ts:225, canonicalizeTokens Tokenizer.ts:161-173)
* self-closing tags (``<x/>``) and void elements (``<img>``) emit a
  TagOpen but **no** TagClose (the reference suppresses the close
  callback via parser start/end-index equality, Tokenizer.ts:206-218)
* closing an outer tag emits implied closes for every inner open tag
  (htmlparser2 stack pop); unmatched close tags are dropped, except
  ``</p>``/``</br>`` which synthesize an immediately-closed open tag
* opening certain tags implies closing others (htmlparser2's
  ``openImpliesClose`` table), with the implied closes emitted
* at EOF, remaining open tags are closed in LIFO order *unless* the
  last emitted token was a TagOpen (in which case the parser indices
  never moved, so the reference's index-equality check suppresses all
  of the EOF closes)
* unquoted attribute values terminate at ``/`` as well as whitespace
  and ``>`` (contract pinned by the reference's own test
  test/Scraper.test.ts:69-74, where ``<a key1=foo/>`` yields ``foo``)
* comments keep their exact inner text; doctypes / processing
  instructions / CDATA produce no tokens

Tokens are plain namedtuples so they are cheap, hashable and picklable
(they travel into Arrow-batched pandas UDFs unchanged).
"""

from __future__ import annotations

import re
from html import unescape
from html.entities import html5 as _HTML5
from typing import NamedTuple, Union

# WHATWG character-reference shape (same pattern CPython's
# html.unescape uses): numeric, hex-numeric, or a named run of up to
# 32 non-terminator chars, each with an optional trailing ';'
_CHARREF_RE = re.compile(
    r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)"
)


def _replace_charref_attr(m: "re.Match[str]") -> str:
    g = m.group(1)
    if g.startswith("#"):
        # numeric references decode identically in both modes
        return unescape(m.group(0))
    if g in _HTML5:
        # exact table hit; if it lacks ';' the char after the match is
        # a terminator (alnum/'=' would have been inside the match), so
        # the attribute-mode exception cannot apply
        return _HTML5[g]
    for x in range(len(g) - 1, 1, -1):
        if g[:x] in _HTML5:
            nxt = g[x]
            if nxt == "=" or (nxt.isascii() and nxt.isalnum()):
                return "&" + g
            return _HTML5[g[:x]] + g[x:]
    return "&" + g


def unescape_attr(s: str) -> str:
    """Entity-decode an ATTRIBUTE value per WHATWG's attribute-mode
    rule: a legacy (semicolon-less) named reference followed by ``=``
    or an ASCII alphanumeric is left literal (``?a=1&ampb=2`` keeps
    ``&ampb``), unlike text content where ``&amp`` always decodes.
    htmlparser2's default ``decodeEntities: true`` (what the reference
    constructs at Tokenizer.ts:192 — no options) applies exactly this
    split via the ``entities`` decoder; Python's ``html.unescape`` only
    implements text mode, so attribute sites use this variant.
    """
    if "&" not in s:
        return s
    return _CHARREF_RE.sub(_replace_charref_attr, s)

# JS String.trim() strips exactly ECMAScript WhiteSpace (TAB VT FF SP
# NBSP ZWNBSP + category Zs) plus LineTerminator (LF CR LS PS) -- NOT
# Python's default strip() set, which adds \x1c-\x1f and \x85
# (category Cc, kept by the reference: a '\x85abc\x85' text node
# retains its padding) and misses the BOM.
_WS = '\t\x0b\x0c \xa0\ufeff\n\r\u2028\u2029\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u202f\u205f\u3000'


class TagOpen(NamedTuple):
    name: str
    attributes: tuple  # tuple[tuple[str, str], ...] sorted by key


class TagClose(NamedTuple):
    name: str


class Text(NamedTuple):
    text: str


class Comment(NamedTuple):
    comment: str


Token = Union[TagOpen, TagClose, Text, Comment]

# htmlparser2 void elements (never pushed on the open stack).
VOID_ELEMENTS = frozenset(
    "area base basefont br col command embed frame hr img input isindex "
    "keygen link meta param source track wbr".split()
)

_FORM_TAGS = frozenset(
    "input option optgroup select button datalist textarea".split()
)
_P = frozenset(("p",))

# htmlparser2's openImpliesClose table (html mode).
OPEN_IMPLIES_CLOSE = {
    "tr": frozenset(("tr", "th", "td")),
    "th": frozenset(("th",)),
    "td": frozenset(("thead", "th", "td")),
    "body": frozenset(("head", "link", "script")),
    "li": frozenset(("li",)),
    "p": _P,
    "h1": _P,
    "h2": _P,
    "h3": _P,
    "h4": _P,
    "h5": _P,
    "h6": _P,
    "select": _FORM_TAGS,
    "input": _FORM_TAGS,
    "output": _FORM_TAGS,
    "button": _FORM_TAGS,
    "datalist": _FORM_TAGS,
    "textarea": _FORM_TAGS,
    "option": frozenset(("option",)),
    "optgroup": frozenset(("optgroup", "option")),
    "dd": frozenset(("dt", "dd")),
    "dt": frozenset(("dt", "dd")),
    "address": _P,
    "article": _P,
    "aside": _P,
    "blockquote": _P,
    "details": _P,
    "div": _P,
    "dl": _P,
    "fieldset": _P,
    "figcaption": _P,
    "figure": _P,
    "footer": _P,
    "form": _P,
    "header": _P,
    "hr": _P,
    "main": _P,
    "nav": _P,
    "ol": _P,
    "pre": _P,
    "section": _P,
    "table": _P,
    "ul": _P,
    "rt": frozenset(("rt", "rp")),
    "rp": frozenset(("rt", "rp")),
    "tbody": frozenset(("thead", "tbody")),
    "tfoot": frozenset(("thead", "tbody")),
}

# Raw-text elements: content is opaque until the matching close tag.
_RAW_TEXT = frozenset(("script", "style"))

# Close-tag scanners for raw-text content, matching htmlparser2's
# special-mode exit (Tokenizer stateAfterSpecialLast): the name match
# is ASCII-case-insensitive CHARACTER BY CHARACTER (explicit [sS]
# classes — re.IGNORECASE would also casefold U+017F LONG S onto 's',
# which htmlparser2 does not), and the name must be followed by '>'
# or htmlparser2 whitespace (space \t \n \f \r) — '</scripted>' stays
# raw text.  Searching the ORIGINAL string (not a .lower() copy)
# keeps indices valid when lowercasing changes length (U+0130 'İ'
# lowers to two chars) and avoids an O(len(doc)) copy per element.
_RAW_CLOSE_RE = {
    name: re.compile(
        "</"
        + "".join(f"[{c}{c.upper()}]" for c in name)
        + r"(?=[>\t\n\f\r ])"
    )
    for name in _RAW_TEXT
}

_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_NAME_END = frozenset(" \t\n\r\f/>")
_ATTR_NAME_END = frozenset(" \t\n\r\f/>=")
# Unquoted attribute values end at whitespace, '>', or '/'.
_UNQUOTED_END = frozenset(" \t\n\r\f>/")

# Fast path for the overwhelmingly common open-tag shapes.  The char
# classes mirror the scanner's EXACT whitespace/terminator sets (note:
# the scanner's whitespace is " \t\n\r\f" — not regex \s, which would
# also eat \v etc.).  Shapes the regex rejects (stray '/', attrs not
# whitespace-separated, '<a ="v">', '/' not directly before '>', ...)
# fall back to the character scanner, so the fast path can only ever
# agree with it — pinned by the golden corpus + round-trip fuzz.
_FAST_TAG_RE = re.compile(
    r"<([^ \t\n\r\f/>]+)"  # tag name (scanner's _NAME_END complement)
    r"((?:[ \t\n\r\f]+[^ \t\n\r\f/>=]+"  # ws+ attr key
    r"(?:[ \t\n\r\f]*=[ \t\n\r\f]*"  # = (ws-padded)
    # value: quoted, or unquoted NOT starting with a quote (a leading
    # quote means "quoted value" to the scanner even when unterminated)
    r"(?:\"[^\"]*\"|'[^']*'|(?![\"'])[^ \t\n\r\f>/]*))?"
    r")*)"
    r"[ \t\n\r\f]*(/?)>"
)
_FAST_ATTR_RE = re.compile(
    r"([^ \t\n\r\f/>=]+)"
    r"(?:[ \t\n\r\f]*=[ \t\n\r\f]*"
    r"(\"[^\"]*\"|'[^']*'|(?![\"'])[^ \t\n\r\f>/]*))?"
)


def canonicalize_tokens(tokens):
    """Drop whitespace-only Text tokens (reference Tokenizer.ts:161-173)."""
    return [
        t
        for t in tokens
        if not (type(t) is Text and len(t.text.strip(_WS)) == 0)
    ]


def parse(source: str) -> list:
    """Parse an HTML string into the reference's canonical token stream."""
    tokens: list = []
    stack: list = []  # names of open (non-void, non-self-closed) tags
    # True once any parse event happened after the last TagOpen emission
    # (models htmlparser2's start/end-index movement, which the
    # reference uses to suppress EOF closes).
    moved = [True]

    def emit_open(name, attrs, push):
        tokens.append(TagOpen(name, attrs))
        moved[0] = False
        if push:
            stack.append(name)

    def emit_text(raw):
        moved[0] = True
        stripped = raw.strip(_WS)
        if stripped:
            tokens.append(Text(stripped))

    def implied_closes_for_open(name):
        implied = OPEN_IMPLIES_CLOSE.get(name)
        if implied:
            while stack and stack[-1] in implied:
                tokens.append(TagClose(stack.pop()))
                moved[0] = True

    def handle_close(name):
        moved[0] = True
        if name not in VOID_ELEMENTS:
            if name in stack:
                while True:
                    top = stack.pop()
                    tokens.append(TagClose(top))
                    if top == name:
                        break
            elif name == "p":
                # htmlparser2 synthesizes <p> and closes it in place;
                # the in-place close is index-suppressed.
                emit_open("p", (), push=False)
        elif name in ("br", "p"):
            emit_open(name, (), push=False)
        # any other unmatched close is dropped

    s = source
    n = len(s)
    i = 0
    while i < n:
        lt = s.find("<", i)
        if lt == -1:
            emit_text(unescape(s[i:]))
            break
        if lt > i:
            # inlined emit_text for the hot between-tags site (skip
            # the unescape call when no entity can be present)
            seg = s[i:lt]
            if "&" in seg:
                seg = unescape(seg)
            moved[0] = True
            seg = seg.strip(_WS)
            if seg:
                tokens.append(Text(seg))
        if lt + 1 >= n:
            # lone '<' at EOF: htmlparser2 emits nothing further
            moved[0] = True
            break
        c = s[lt + 1]
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            if end == -1:
                tokens.append(Comment(s[lt + 4 :]))
                moved[0] = True
                break
            tokens.append(Comment(s[lt + 4 : end]))
            moved[0] = True
            i = end + 3
        elif c == "!" or c == "?":
            # doctype / declaration / processing instruction: no token
            gt = s.find(">", lt + 1)
            moved[0] = True
            if gt == -1:
                break
            i = gt + 1
        elif c == "/":
            j = lt + 2
            if j < n and s[j] in _ALPHA:
                k = j
                while k < n and s[k] != ">" and s[k] not in " \t\n\r\f":
                    k += 1
                name = s[j:k].lower()
                gt = s.find(">", k)
                if gt == -1:
                    moved[0] = True
                    break
                handle_close(name)
                i = gt + 1
            else:
                gt = s.find(">", j)
                moved[0] = True
                if gt == -1:
                    break
                i = gt + 1
        elif c in _ALPHA:
            m = _FAST_TAG_RE.match(s, lt)
            if m is not None:
                # hottest branch: the emit_open / implied-closes
                # closures are inlined (a function call per tag cost
                # ~25% of parse wall on the crawl corpus, r6 profile)
                name = m.group(1).lower()
                attr_str = m.group(2)
                if attr_str:
                    attrs_list: list = []
                    seen_keys = set()
                    for am in _FAST_ATTR_RE.finditer(attr_str):
                        key = am.group(1).lower()
                        if key in seen_keys:
                            continue
                        seen_keys.add(key)
                        raw = am.group(2)
                        if raw is None:
                            value = ""
                        elif raw[:1] in "\"'":
                            value = unescape_attr(raw[1:-1])
                        else:
                            value = unescape_attr(raw)
                        attrs_list.append((key, value))
                    attrs_list.sort(key=lambda kv: kv[0])
                    attrs = tuple(attrs_list)
                else:
                    attrs = ()
                implied = OPEN_IMPLIES_CLOSE.get(name)
                if implied:
                    while stack and stack[-1] in implied:
                        tokens.append(TagClose(stack.pop()))
                        moved[0] = True
                tokens.append(TagOpen(name, attrs))
                moved[0] = False
                if m.group(3) == "" and name not in VOID_ELEMENTS:
                    stack.append(name)
                i = m.end()
            else:
                i = _parse_tag(
                    s, lt, n, emit_open, implied_closes_for_open, moved
                )
            if i == -1:
                break
            # raw-text elements: consume until the matching close tag
            if stack and stack[-1] in _RAW_TEXT:
                raw_name = stack[-1]
                cm = _RAW_CLOSE_RE[raw_name].search(s, i)
                if cm is None:
                    emit_text(s[i:])
                    i = n
                else:
                    close_at = cm.start()
                    emit_text(s[i:close_at])
                    gt = s.find(">", close_at)
                    handle_close(raw_name)
                    i = n if gt == -1 else gt + 1
        else:
            # '<' followed by junk: literal text up to the next '<'
            nxt = s.find("<", lt + 1)
            if nxt == -1:
                emit_text(unescape(s[lt:]))
                break
            emit_text(unescape(s[lt:nxt]))
            i = nxt

    if stack and moved[0]:
        while stack:
            tokens.append(TagClose(stack.pop()))
    return tokens


def _parse_tag(s, lt, n, emit_open, implied_closes_for_open, moved):
    """Parse an open tag starting at ``s[lt] == '<'``.

    Returns the index just past the closing '>', or -1 if the tag never
    terminates (htmlparser2 emits nothing for an unterminated tag).
    """
    j = lt + 1
    k = j
    while k < n and s[k] not in _NAME_END:
        k += 1
    name = s[j:k].lower()
    attrs: list = []
    seen_keys = set()
    self_closing = False
    i = k
    while True:
        while i < n and s[i] in " \t\n\r\f":
            i += 1
        if i >= n:
            moved[0] = True
            return -1
        ch = s[i]
        if ch == ">":
            i += 1
            break
        if ch == "/":
            # potential self-closing; stray '/' is otherwise skipped
            if i + 1 < n and s[i + 1] == ">":
                self_closing = True
                i += 2
                break
            i += 1
            continue
        # attribute name
        a = i
        while i < n and s[i] not in _ATTR_NAME_END:
            i += 1
        key = s[a:i].lower()
        while i < n and s[i] in " \t\n\r\f":
            i += 1
        value = ""
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in " \t\n\r\f":
                i += 1
            if i < n and (s[i] == '"' or s[i] == "'"):
                q = s[i]
                v = i + 1
                endq = s.find(q, v)
                if endq == -1:
                    moved[0] = True
                    return -1
                value = unescape_attr(s[v:endq])
                i = endq + 1
            else:
                v = i
                while i < n and s[i] not in _UNQUOTED_END:
                    i += 1
                value = unescape_attr(s[v:i])
        if key and key not in seen_keys:
            seen_keys.add(key)
            attrs.append((key, value))
    attrs.sort(key=lambda kv: kv[0])
    implied_closes_for_open(name)
    push = (not self_closing) and (name not in VOID_ELEMENTS)
    emit_open(name, tuple(attrs), push)
    return i


def show_token(token: Token) -> str:
    """Serialize one token (reference ``showToken``, Tokenizer.ts:256-263)."""
    kind = type(token)
    if kind is TagOpen:
        attrs = "".join(f' {k}="{v}"' for k, v in token.attributes)
        return f"<{token.name}{attrs}>"
    if kind is TagClose:
        return f"</{token.name}>"
    if kind is Text:
        return token.text
    return f"<!--{token.comment}-->"


def show_tokens(tokens) -> str:
    return "".join(show_token(t) for t in tokens)
