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


def _write_candidates(spark, path, rows):
    spark.createDataFrame(rows, "host_id long, url string, seq long") \
        .coalesce(1).write.mode("append").parquet(path)


def test_stateful_host_budget_across_restarts(spark, tmp_path):
    from scalpel_ts_spark.streaming.politeness import stream_host_budget

    src = str(tmp_path / "cand")
    out = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "budget_ckpt")

    # trigger 1: host 1 has 5 candidates, cap 3 -> 3 fetch, 2 defer
    _write_candidates(
        spark, src, [(1, f"http://h1.test/p/{i}", i) for i in range(5)]
    )
    q = stream_host_budget(spark, src, out, ckpt, cap=3, refill=2)
    q.awaitTermination(120)
    first = {
        r["seq"]: r["decision"] for r in spark.read.parquet(out).collect()
    }
    assert [first[i] for i in range(5)] == [
        "fetch", "fetch", "fetch", "defer", "defer",
    ]

    # trigger 2 (new process-equivalent: same checkpoint): the balance
    # 0 survives in the state store and refills by 2 -> 2 fetch, 1 defer
    _write_candidates(
        spark, src, [(1, f"http://h1.test/p/{i}", i) for i in range(5, 8)]
    )
    q2 = stream_host_budget(spark, src, out, ckpt, cap=3, refill=2)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8
    second = {r["seq"]: r["decision"] for r in rows if r["seq"] >= 5}
    assert [second[i] for i in range(5, 8)] == ["fetch", "fetch", "defer"]
    # decisions follow seq order, not arrival order: token balances
    # decrease monotonically within the trigger
    afters = [r["tokens_after"] for r in sorted(rows, key=lambda r: r["seq"]) if r["seq"] < 5]
    assert afters == [2, 1, 0, 0, 0]


def test_stateful_budget_sorts_across_arrow_chunks(spark, tmp_path):
    # a host whose group spans multiple Arrow chunks must still give
    # its tokens to the globally smallest seqs (one sort per group,
    # not per chunk)
    from scalpel_ts_spark.streaming.politeness import stream_host_budget

    src = str(tmp_path / "cand2")
    out = str(tmp_path / "dec2")
    ckpt = str(tmp_path / "ckpt2")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        # write in DESCENDING seq order so naive per-chunk consumption
        # would spend tokens on the largest seqs first
        rows = [(1, f"http://h1.test/p/{i}", i) for i in range(399, -1, -1)]
        _write_candidates(spark, src, rows)
        q = stream_host_budget(spark, src, out, ckpt, cap=10, refill=5)
        assert q.awaitTermination(120)
        fetched = {
            r["seq"]
            for r in spark.read.parquet(out).collect()
            if r["decision"] == "fetch"
        }
        assert fetched == set(range(10))
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


def test_windowed_counts_complete_mode_equals_batch(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from scalpel_ts_spark.streaming.windows import stream_windowed_counts

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
    ])
    rows = [
        (f"2024-01-01 0{h}:{m:02d}:00", et, h * 10 + m)
        for h in range(3)
        for m in (5, 25, 45)
        for et in ("click", "view")
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, user_id long") \
        .select(F.col("ts").cast("timestamp"), "event_type", "user_id")
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    df.write.mode("overwrite").parquet(src)
    q = stream_windowed_counts(spark, src, out, ckpt, schema)
    assert q.awaitTermination(120)
    got = {
        (str(r.win_start), r.event_type): r.n
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        (str(r.win_start), r.event_type): r.n
        for r in df.groupBy(
            F.window("ts", "1 hour")["start"].alias("win_start"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect and len(got) == 6


def test_windowed_counts_watermark_emits_closed_and_drops_late(
    spark, tmp_path
):
    """Pin the append-mode watermark contract: a window is emitted
    only once the watermark (max prior event time - delay) passes its
    end — and a row arriving later than the watermark is dropped
    before aggregation, never resurrecting an emitted window."""
    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampType,
    )

    from scalpel_ts_spark.streaming.windows import stream_windowed_counts

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ])
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    def drop(rows):
        spark.createDataFrame(rows, "ts string, event_type string").select(
            F.col("ts").cast("timestamp"), "event_type"
        ).write.mode("append").parquet(src)

    # invocation 1: hours 0..2; watermark after it = 02:10 - 1h = 01:10
    drop(
        [("2024-01-01 00:10:00", "x"), ("2024-01-01 01:10:00", "x"),
         ("2024-01-01 01:20:00", "x"), ("2024-01-01 02:10:00", "x")],
    )
    q = stream_windowed_counts(
        spark, src, out, ckpt, schema, watermark="1 hour"
    )
    assert q.awaitTermination(120)
    # invocation 2: a new on-time row plus a LATE row for hour 0.
    # The late row (00:20) is older than the restored watermark 01:10
    # -> dropped before aggregation, so window [00:00, 01:00) emits
    # with count 1, NOT 2.  AvailableNow runs a final flush batch, so
    # the watermark also advances to 03:10 - 1h = 02:10 within this
    # invocation and closes window [01:00, 02:00) (count 2).  Window
    # [02:00, 03:00) and the new row's window stay in state (end >
    # watermark) — bounded-state eviction, exactly once.
    drop([("2024-01-01 03:10:00", "x"), ("2024-01-01 00:20:00", "x")])
    q2 = stream_windowed_counts(
        spark, src, out, ckpt, schema, watermark="1 hour"
    )
    assert q2.awaitTermination(120)
    got = {
        (str(r.win_start), r.n)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 01:00:00", 2),
    }


def test_per_host_refill_column_overrides_global(spark, tmp_path):
    """Crawl-delay integration: a 'refill' column (joined from
    functions.robots.host_crawl_delays by the scheduler) replaces the
    global per-trigger refill for that host only."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from scalpel_ts_spark.streaming.politeness import stream_host_budget

    schema = StructType([
        StructField("host_id", LongType()),
        StructField("url", StringType()),
        StructField("seq", LongType()),
        StructField("refill", DoubleType()),
    ])
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    def drop(batch, rows):
        spark.createDataFrame(
            [(h, f"http://h{h}.test/p/{s}", s, rf) for h, s, rf in rows],
            schema,
        ).write.mode("append").parquet(src)

    # host 1 declares a slow crawl-delay (refill 1); host 2 uses the
    # global default (refill NULL); host 3 declares a FRACTIONAL
    # refill (Crawl-delay longer than the trigger period) that must
    # accumulate as credit, not truncate to starvation. All exhaust
    # cap=4 in trigger 1.
    batch1 = (
        [(1, s, 1.0) for s in range(6)]
        + [(2, s, None) for s in range(6)]
        + [(3, s, 0.5) for s in range(6)]
    )
    drop(1, batch1)
    q = stream_host_budget(
        spark, src, out, ckpt, cap=4, refill=2, schema=schema
    )
    assert q.awaitTermination(120)
    batch2 = (
        [(1, 100 + s, 1.0) for s in range(3)]
        + [(2, 100 + s, None) for s in range(3)]
        + [(3, 100 + s, 0.5) for s in range(3)]
    )
    drop(2, batch2)
    q2 = stream_host_budget(
        spark, src, out, ckpt, cap=4, refill=2, schema=schema
    )
    assert q2.awaitTermination(120)

    def fetched_ge(lo):
        rows = spark.read.parquet(out).collect()
        return {
            h: sum(1 for r in rows if r.host_id == h and r.seq >= lo
                   and r.decision == "fetch")
            for h in (1, 2, 3)
        }

    # trigger 2 balances: host 1 = int(0+1.0) = 1, host 2 = default 2,
    # host 3 = int(0+0.5) = 0 with 0.5 credit carried in state
    assert fetched_ge(100) == {1: 1, 2: 2, 3: 0}
    batch3 = (
        [(1, 200 + s, 1.0) for s in range(3)]
        + [(2, 200 + s, None) for s in range(3)]
        + [(3, 200 + s, 0.5) for s in range(3)]
    )
    drop(3, batch3)
    q3 = stream_host_budget(
        spark, src, out, ckpt, cap=4, refill=2, schema=schema
    )
    assert q3.awaitTermination(120)
    # trigger 3: host 3's credit reaches 0.5 + 0.5 = 1.0 -> one fetch
    # (a 2-trigger crawl-delay crawls at half rate, never starves)
    assert fetched_ge(200) == {1: 1, 2: 2, 3: 1}


def test_stateful_budget_large_group_bounded_buffer(spark, tmp_path):
    # VERDICT r3 finding #2: a hot host's whole backlog must not
    # materialize in one pandas frame.  With tiny Arrow chunks, a
    # 2000-row group streams through the bounded top-cap merge and
    # still gives its tokens to the globally smallest seqs, with
    # every other row deferred at tokens_after=0.
    from scalpel_ts_spark.streaming.politeness import stream_host_budget

    src = str(tmp_path / "cand_big")
    out = str(tmp_path / "dec_big")
    ckpt = str(tmp_path / "ckpt_big")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        # descending + interleaved across two writes: the winners span
        # chunk boundaries in both files
        rows = [(1, f"http://h1.test/p/{i}", i) for i in range(1999, -1, -2)]
        rows += [(1, f"http://h1.test/p/{i}", i) for i in range(1998, -1, -2)]
        _write_candidates(spark, src, rows)
        q = stream_host_budget(spark, src, out, ckpt, cap=7, refill=3)
        assert q.awaitTermination(180)
        got = spark.read.parquet(out).collect()
        assert len(got) == 2000
        fetched = sorted(r["seq"] for r in got if r["decision"] == "fetch")
        assert fetched == list(range(7))
        afters = {
            r["seq"]: r["tokens_after"]
            for r in got
            if r["decision"] == "fetch"
        }
        assert [afters[s] for s in range(7)] == [6, 5, 4, 3, 2, 1, 0]
        assert all(
            r["tokens_after"] == 0 for r in got if r["decision"] == "defer"
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
