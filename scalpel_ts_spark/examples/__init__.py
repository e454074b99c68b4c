"""Ports of the reference's ``examples/`` programs (same combinator
compositions, same inputs, same outputs) — runnable both as plain
Python and through the Spark extraction UDFs."""

from scalpel_ts_spark.examples.comments import (  # noqa: F401
    cat_comment,
    comments,
    image_attributes,
)
from scalpel_ts_spark.examples.html_to_markdown import (  # noqa: F401
    content,
    print_md,
    scrape_markdown,
)
