"""Operator-level A/B: wide vs narrow seen-dedup probe, one session.

Isolates `new_urls` (bloom bucket cogroup + dedup + anti-join + —
narrow only — string re-attach) from crawl and host-regime noise:
same session, interleaved reps, fixed synthetic discovery volume at a
configurable ALREADY-SEEN fraction.  The seen fraction is the regime
knob: a young crawl discovers mostly-new links (the re-attach's
post-filter agg then carries ~the full string volume, so narrow pays
its extra stage for nothing), a steady-state 10^10-URL crawl
discovers mostly-seen links (the narrow path's string exchange
shrinks by the seen fraction while the wide path still ships every
string through Arrow).

Three variants: wide (fused in-cogroup dedup, r4 engine default),
narrow (hash-only cogroup + string re-attach), preagg (JVM map-side
partial-combine dedup BEFORE a probe-only cogroup — Arrow volume
shrinks by the duplication factor).

Usage: python tools/probe_ab.py [n_rows] [seen_frac] [reps] [dup_factor]
Prints one JSON line with per-variant rep walls + medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scalpel_ts_spark.operators.seen import build_bloom, new_urls
from scalpel_ts_spark.sources.session import get_spark, tmpfs_local_dir

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SEEN_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
DUP_FACTOR = int(sys.argv[4]) if len(sys.argv) > 4 else 4  # avg in-degree
N_BUCKETS = 32


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmpfs = tmpfs_local_dir()
    spark = get_spark(
        "probe_ab", cores=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": tmpfs} if tmpfs else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_distinct = N_ROWS // DUP_FACTOR
    n_seen = int(n_distinct * SEEN_FRAC)
    key = F.col("id") % n_distinct
    cand = (
        spark.range(N_ROWS)
        .select(
            F.concat(
                F.lit("http://h"), (key % 1000).cast("string"),
                F.lit(".test/path/segment/"), key.cast("string"),
                F.lit("?q=abcdefghijklmnopqrstuvwxyz"),
            ).alias("url"),
            (key % 1000).alias("host_id"),
            key.alias("url_hash"),
        )
        .persist()
    )
    cand.count()
    seen = spark.range(n_seen).select(F.col("id").alias("url_hash")).persist()
    seen.count()
    blooms = build_bloom(seen, n_buckets=N_BUCKETS).persist()
    blooms.count()

    def run(**kw) -> float:
        t0 = time.time()
        caches: list = []
        n = new_urls(
            cand, seen, blooms, n_buckets=N_BUCKETS, dedup=True,
            persisted_out=caches, **kw,
        ).count()
        dt = time.time() - t0
        for c in caches:
            c.unpersist()
        assert n == n_distinct - n_seen, (n, n_distinct - n_seen)
        return round(dt, 3)

    variants = {
        "wide": {},
        "narrow": {"narrow": True},
        "preagg": {"preagg": True},
    }
    for kw in variants.values():  # warm every path, untimed
        run(**kw)
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(REPS):
        for v, kw in variants.items():  # interleaved
            walls[v].append(run(**kw))
    out: dict = {
        "n_rows": N_ROWS, "seen_frac": SEEN_FRAC, "dup_factor": DUP_FACTOR,
    }
    for v in variants:
        out[v] = walls[v]
        out[f"{v}_median"] = round(statistics.median(walls[v]), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
