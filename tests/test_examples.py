"""Golden tests for the ported reference examples (reference
``examples/*.ts``), run pure-Python and through the Spark UDF path."""

from pyspark.sql import functions as F

from scalpel_ts_spark.core.scraper import scrape_either
from scalpel_ts_spark.examples.comments import (
    EXAMPLE_HTML,
    REPETITION_HTML,
    cat_comment,
    comments,
    image_attributes,
)
from scalpel_ts_spark.examples.html_to_markdown import scrape_markdown

MD_HTML = """
<body>
  <p>paragraph</p>
  <h1>h1</h1>
  <h2>h2</h2>
  <h3>h3</h3>
  <h4>h4</h4>
  <h5>h5</h5>
  <h6>h6</h6>
  <a href="https://www.github.com">link</a>
  <p>
    <b>bold</b>
    <i>italic</i>
    <b><i>bold italic</i></b>
  </p>
</body>
"""

EXPECTED_COMMENTS = [
    {"_tag": "TextComment", "author": "Sally", "text": "Woo hoo!"},
    {"_tag": "ImageComment", "author": "Bill",
     "url": "http://example.com/cat.gif"},
    {"_tag": "TextComment", "author": "Bertrand",
     "text": "That sure is some cat!"},
    {"_tag": "TextComment", "author": "Susan", "text": "WTF!?!"},
]


def test_example_from_docs_comments():
    assert scrape_either(EXAMPLE_HTML, comments) == (
        "right", EXPECTED_COMMENTS,
    )


def test_complex_predicates_cat_comment():
    # chroot keeps the first SUCCESS (chroots drops failed inner runs),
    # so the "Woo hoo!" div is skipped by the filter
    assert scrape_either(EXAMPLE_HTML, cat_comment) == (
        "right", '<div class="comment text">That sure is some cat!</div>',
    )


def test_generalized_repetition_image_attributes():
    assert scrape_either(REPETITION_HTML, image_attributes) == (
        "right",
        [
            {"altText": "A cat picture.", "url": "http://example.com/cat.gif"},
            {"altText": "A dog picture.", "url": "http://example.com/dog.gif"},
        ],
    )


def test_html_to_markdown():
    # matches the reference printer's JS semantics exactly: headers keep
    # the leading newline of their template (triple \n after cleanup),
    # <i> is NOT italic (the reference's italic combinator matches only
    # <em>), and the removeIndents fixpoint glues the link to the h6
    # block
    assert scrape_markdown(MD_HTML) == (
        "right",
        "paragraph\n\n"
        "\n# h1\n\n"
        "\n## h2\n\n"
        "\n### h3\n\n"
        "\n#### h4\n\n"
        "\n##### h5\n\n"
        "\n###### h6\n\n"
        "[link](https://www.github.com) **bold** italic **bold italic**",
    )
    assert scrape_markdown("<p>no body tag at all") == (
        "left", "Failed to scrape source",
    )


def test_examples_through_spark_udf(spark):
    # the same example scrapers travel into an Arrow-batched UDF: the
    # markdown pipeline end-to-end over a DataFrame of documents
    from pyspark.sql.types import StringType

    from scalpel_ts_spark.examples.html_to_markdown import content, print_md
    from scalpel_ts_spark.operators.extract import scrape_udf

    df = spark.createDataFrame(
        [(0, MD_HTML), (1, "<body><p>tiny</p></body>"), (2, None)],
        ["doc_id", "html"],
    )
    md_udf = scrape_udf(content.map(print_md), StringType())
    rows = {
        r["doc_id"]: r["md"]
        for r in df.select(
            "doc_id", md_udf(F.col("html")).alias("md")
        ).collect()
    }
    assert rows[0].startswith("paragraph\n\n\n# h1")
    assert rows[1] == "tiny"
    assert rows[2] is None
