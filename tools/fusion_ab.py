"""Interleaved A/B: fused fetch+parse UDF vs the two-stage chain.

The round-5 crawl change runs the synthetic fetch and the
parse+extract pass inside ONE pandas UDF (bodies never cross the
JVM<->Arrow boundary; operators/extract.fused_fetch_extract_udf)
instead of two chained ArrowEvalPython stages.  This measures that
change at the OPERATOR level — one session, variants alternating
A,B,A,B..., medians compared — so the host's 1.6-2x regime swings
cannot own the verdict (the discipline every A/B in this repo uses).

Both variants end in the same checksum aggregate
(sum of span/link counts), which (a) forces full UDF evaluation —
a bare count() would let Catalyst prune a deterministic UDF
projection — and (b) asserts output parity per rep.

Usage: python tools/fusion_ab.py [n_pages_per_host] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_HOSTS = 500
PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 400
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from scalpel_ts_spark.operators.extract import (
        crawl_extract_udf,
        fused_fetch_extract_udf,
    )
    from scalpel_ts_spark.sources.session import get_spark, tmpfs_local_dir
    from scalpel_ts_spark.sources.synthetic import fetch_udf, html_for_url, make_url

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmpfs = tmpfs_local_dir()
    spark = get_spark(
        "fusion_ab", cores=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": tmpfs} if tmpfs else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    urls = spark.range(N_HOSTS * PAGES).select(
        F.udf(lambda i: make_url(i % N_HOSTS, i // N_HOSTS), "string")(
            F.col("id")
        ).alias("url")
    ).repartition(cpus * 2).persist()
    n = urls.count()

    def _checksum(ex_df):
        row = ex_df.agg(
            F.sum(F.size("ex.spans")).alias("spans"),
            F.sum(F.size("ex.links")).alias("links"),
        ).collect()[0]
        return (row["spans"], row["links"])

    def two_stage():
        return _checksum(
            urls.withColumn("html", fetch_udf(N_HOSTS)(F.col("url")))
            .withColumn(
                "ex", crawl_extract_udf()(F.col("url"), F.col("html"))
            )
            .select("ex")
        )

    def fused():
        return _checksum(
            urls.withColumn(
                "ex",
                fused_fetch_extract_udf(
                    lambda u: html_for_url(u, N_HOSTS)
                )(F.col("url")),
            ).select("ex")
        )

    variants = {"two_stage": two_stage, "fused": fused}
    sums = {v: fn() for v, fn in variants.items()}  # warm-up, untimed
    assert sums["two_stage"] == sums["fused"], sums
    times: dict[str, list] = {v: [] for v in variants}
    for _ in range(REPS):
        for v, fn in variants.items():
            t0 = time.time()
            s = fn()
            times[v].append(round(time.time() - t0, 3))
            assert s == sums[v], (v, s, sums[v])
    spark.stop()
    print(json.dumps({
        "n_urls": n,
        "reps": REPS,
        "cpus": cpus,
        "local_dir": tmpfs or "disk-default",
        "checksum": list(sums["fused"]),
        **{
            v: {"median": round(statistics.median(ts), 3), "runs": ts}
            for v, ts in times.items()
        },
    }))


if __name__ == "__main__":
    main()
