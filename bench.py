"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line.

The headline metric mirrors BASELINE.json: URLs fetched+extracted per
second through the full crawl round loop (frontier scheduling ->
fetch -> parse -> extract -> link discovery -> seen dedup -> snapshot
commit), plus the training-data pipeline stages (span extraction,
minhash near-dup, ANN, text stats) at the same scale factor.

Scaling evidence (two-cluster-size rule): run with
SPARK_GRAFT_CPUS=8 and =32 on the same input; BASELINE.md records
throughput at both plus efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_ROUNDS = int(os.environ.get("BENCH_CRAWL_ROUNDS", "4"))
# crawl snapshots on tmpfs when available (same rationale as
# tools/scaling_bench.py, BASELINE.md r4): the sandbox's one shared
# virtio disk injected 2-40s of writeback noise into the commit
# section across rounds 1-3 ("loaded host" runs), while a production
# crawl commits to object storage that scales with the cluster.
# Override with BENCH_WORKDIR=/tmp to measure the disk path.
WORKDIR_BASE = os.environ.get(
    "BENCH_WORKDIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
)


def main() -> None:
    if not os.path.isdir(SF_DIR):
        sys.exit(f"bench: SPARK_GRAFT_SF_DIR does not exist: {SF_DIR}")
    from scalpel_ts_spark.sources.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # -- headline: the crawl round loop ------------------------------------
    from scalpel_ts_spark.plans.frontier import CrawlEngine
    from scalpel_ts_spark.sources.synthetic import make_url

    # JVM/codegen/Python-worker warm-up, EXCLUDED from the timed runs —
    # the same protocol tools/scaling_bench.py has used since round 1
    # (a fresh local JVM spends 10-15s on first-job class loading and
    # codegen that a long-lived cluster pays once, not per crawl).  The
    # miniature crawl touches every code path: parquet IO, pandas UDFs,
    # cogroups, broadcasts, window/top-k.
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_", dir=WORKDIR_BASE)
    weng = CrawlEngine(spark, warm_dir, n_hosts=5, cap=8, refill=4)
    weng.init([f"http://h{h}.test/p/{p}" for h in range(5) for p in range(3)])
    weng.run(1)
    shutil.rmtree(warm_dir, ignore_errors=True)

    workdir = tempfile.mkdtemp(prefix="bench_crawl_", dir=WORKDIR_BASE)
    urls_fetched = 0

    def crawl() -> None:
        nonlocal urls_fetched

        # large per-round politeness budget: rounds are macro-batches,
        # so fixed per-round scheduling cost amortizes over the batch
        eng = CrawlEngine(
            spark, workdir, n_hosts=200, cap=512, refill=256,
            salt_buckets=16, write_docs=True,
        )
        eng.init([make_url(h, p) for h in range(200) for p in range(25)])
        for m in eng.run(CRAWL_ROUNDS):
            urls_fetched += m["fetched"]
            for k, v in m.get("sections", {}).items():
                sections[k] = round(sections.get(k, 0.0) + v, 2)

    sections: dict[str, float] = {}
    run("crawl", crawl)
    shutil.rmtree(workdir, ignore_errors=True)
    extra["urls_fetched"] = urls_fetched
    extra["urls_per_sec"] = round(urls_fetched / timings["crawl"], 1)
    # per-stage breakdown (fetch_extract / robots / seen_dedup / commit)
    # so a slow run is diagnosable: this box's shared disk makes the
    # commit/robots sections swing 2-8s run-to-run (BASELINE.md)
    extra["crawl_sections"] = sections

    # -- pipeline stages over the sf tables --------------------------------
    n_docs = 0

    def extract() -> None:
        nonlocal n_docs
        df = E.q_extract_spans(spark, SF_DIR)
        n_docs = df.select("doc_id").distinct().count()
        df.count()

    run("extract_spans", extract)
    extra["docs_extracted"] = n_docs
    extra["docs_per_sec"] = round(n_docs / timings["extract_spans"], 1)

    run("dedup_minhash", lambda: E.q_dedup_minhash(spark, SF_DIR).count())
    run("dedup_exact", lambda: E.q_dedup_exact(spark, SF_DIR).count())
    run("dedup_simhash", lambda: E.q_dedup_simhash(spark, SF_DIR).count())
    run("text_stats", lambda: E.q_text_stats(spark, SF_DIR).count())
    run("ann_bruteforce", lambda: E.q_ann_bruteforce(spark, SF_DIR).count())
    run("ann_lsh", lambda: E.q_ann_lsh(spark, SF_DIR).count())
    run("ann_ivf", lambda: E.q_ann_ivf(spark, SF_DIR).count())
    run("embedding_neardup",
        lambda: E.q_embedding_neardup(spark, SF_DIR).count())
    run("topk_lineitem", lambda: E.q_topk_lineitem(spark, SF_DIR).count())
    run("seen_antijoin_bloom",
        lambda: E.q_seen_antijoin_bloom(spark, SF_DIR).count())
    run("url_canonicalize",
        lambda: E.q_url_canonicalize(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "crawl+pipeline wall time (headline: URLs fetched+"
                  "extracted/sec in 'urls_per_sec')",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        **extra,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
