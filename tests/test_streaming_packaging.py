"""Structured Streaming wrapper + --py-files packaging."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from scalpel_ts_spark.streaming import stream_extract_spans


def _write_docs(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(
            F.lit("<html><body><p>doc "), F.col("id").cast("string"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_extract_incremental_resume(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, 0, 20)
    q = stream_extract_spans(spark, src, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    assert first.count() == 20
    row = first.filter("doc_id = '7'").collect()[0]
    assert [s["text"] for s in row["spans"]] == ["doc 7"]

    # append a new snapshot; the resumed stream must process ONLY it
    _write_docs(spark, src, 20, 30)
    q2 = stream_extract_spans(spark, src, out, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out)
    assert again.count() == 30  # exactly-once: no reprocessing of 0..20


def test_py_files_zip_is_importable(tmp_path):
    from tools.package import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    assert os.path.exists(zip_path)
    # executors import the package from the zip exactly like this
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from scalpel_ts_spark.core.scraper import scrape_raw, text; "
        "from scalpel_ts_spark.core.select import tag; "
        "v = scrape_raw('<a><b>hi</b></a>', text(tag('b'))); "
        "assert v == 'hi', v; print('zip-import-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, timeout=60,
        cwd=str(tmp_path),  # away from the repo: zip must be self-contained
    )
    assert out.returncode == 0, out.stderr
    assert "zip-import-ok" in out.stdout
