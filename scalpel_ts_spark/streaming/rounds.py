"""Structured Streaming sugar over the batch round loop.

The north rule requires *resumable batch rounds from snapshots*, not
streaming (SURVEY.md §1.2) — the round loop in plans/frontier.py is
the engine.  This module adds the optional streaming face: continuous
span extraction over an append-only docs table, with exactly-once
progress via the streaming checkpoint.  ``Trigger.AvailableNow``
drains whatever snapshots exist and stops, which composes with the
round loop: each crawl round appends files, each stream run picks up
only the new ones — the streaming equivalent of resume-from-snapshot.

At scale this is the standing "extract everything ever crawled"
pipeline: new Iceberg snapshots arrive from the crawler, the stream
incrementally extracts them, watermarks are unnecessary because
docs are append-only facts keyed by (url, round), not event-time
aggregates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from scalpel_ts_spark.operators.extract import extract_spans_udf

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("html", StringType()),
    ]
)


def stream_extract_spans(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: StructType = DOCS_STREAM_SCHEMA,
    html_col: str = "html",
    available_now: bool = True,
):
    """Incrementally extract interleaved spans from an append-only
    parquet/Iceberg docs directory.  Returns the StreamingQuery.

    Resumability: the checkpoint records which input files are done;
    re-running after a crash (or after new snapshots land) processes
    only the remainder — exactly-once output for a deterministic
    extraction.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    extracted = stream.withColumn(
        "spans", extract_spans_udf()(F.col(html_col))
    ).drop(html_col)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
