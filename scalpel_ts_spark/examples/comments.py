"""The reference's three comment-scraping examples, ported 1:1.

* ``comments`` — ``examples/example-from-docs.ts:52-80``: tagged-union
  comment records via do-notation (``bindTo``/``bind``) and ``alt``.
* ``cat_comment`` — ``examples/complex-predicates.ts:36-46``:
  ``chroot`` + ``filter`` + ``chain`` (skip comments not mentioning
  "cat"; note ``chroot`` keeps the FIRST *success*, not the first
  match, because ``chroots`` drops failed inner runs).
* ``image_attributes`` — ``examples/generalized-repetition.ts:40-48``:
  per-``img`` record assembly with ``chroots``.

Tagged unions are plain dicts with a ``_tag`` key — the same shape the
reference's fp-ts records print.
"""

from __future__ import annotations

import scalpel_ts_spark.core.scraper as S
import scalpel_ts_spark.core.select as Sel

EXAMPLE_HTML = """
<html>
    <body>
        <div class="comments">
            <div class="comment container">
                <span class="comment author">Sally</span>
                <div class="comment text">Woo hoo!</div>
            </div>
            <div class="comment container">
                <span class="comment author">Bill</span>
                <img class="comment image" src="http://example.com/cat.gif" />
            </div>
            <div class="comment container">
                <span class="comment author">Bertrand</span>
                <div class="comment text">That sure is some cat!</div>
            </div>
            <div class="comment container">
                <span class="comment author">Susan</span>
                <div class="comment text">WTF!?!</div>
            </div>
        </div>
    </body>
</html>
"""

REPETITION_HTML = """
<html>
    <body>
        <div class="comments">
            <div class="comment container">
                <span class="comment author">Sally</span>
                <div class="comment text">Woo hoo!</div>
            </div>
            <div class="comment container">
                <span class="comment author">Bill</span>
                <img alt="A cat picture." class="comment image" src="http://example.com/cat.gif" />
            </div>
            <div class="comment container">
                <span class="comment author">Susan</span>
                <div class="comment text">WTF!?!</div>
            </div>
            <div class="comment container">
                <span class="comment author">Bill</span>
                <img alt="A dog picture." class="comment image" src="http://example.com/dog.gif" />
            </div>
        </div>
    </body>
</html>
"""

_author = S.text(Sel.with_attributes("span", [Sel.has_class("author")]))

text_comment = (
    S.of("TextComment")
    .bind_to("_tag")
    .bind("author", lambda _: _author)
    .bind(
        "text",
        lambda _: S.text(Sel.with_attributes("div", [Sel.has_class("text")])),
    )
)

image_comment = (
    S.of("ImageComment")
    .bind_to("_tag")
    .bind("author", lambda _: _author)
    .bind(
        "url",
        lambda _: S.attr(
            "src", Sel.with_attributes("img", [Sel.has_class("image")])
        ),
    )
)

#: Scraper<list[Comment]> — one record per comment container
comments = S.chroots(
    Sel.with_attributes("div", [Sel.has_class("container")]),
    text_comment.alt(image_comment),
)

#: Scraper<str> — html of the first comment div whose text contains "cat"
cat_comment = S.chroot(
    Sel.with_attributes("div", [Sel.has_class("comment"), Sel.has_class("text")]),
    S.text(Sel.any_node)
    .filter(lambda content: "cat" in content)
    .chain(lambda _: S.html(Sel.any_node)),
)

#: Scraper<list[{altText, url}]> — attribute record per img tag
image_attributes = S.chroots(
    Sel.tag("img"),
    S.attr("alt", Sel.any_node)
    .bind_to("altText")
    .bind("url", lambda _: S.attr("src", Sel.any_node)),
)
