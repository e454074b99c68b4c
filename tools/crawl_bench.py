"""Crawl-only bench: the bench.py headline crawl config, timed from
AFTER engine construction + init (``includes_init: false`` in the
output) — bench.py's headline includes init, so the two walls are NOT
directly comparable; compare crawl_bench runs only with each other.

Used for interleaved A/B runs of engine changes (this host swings
±30-50% run-to-run, so old/new must alternate).  Prints ONE JSON line
with wall, urls/sec and the per-stage sections.  Note the boundary
also means an init-affecting change (seed canonicalization, bloom
sizing at init) shows NO delta here — A/B such changes via bench.py.

Usage: python tools/crawl_bench.py [rounds]
Env: SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


from scalpel_ts_spark.sources.session import tmpfs_local_dir  # noqa: E402

_TMPFS = tmpfs_local_dir()  # capacity-gated; None => disk
WORKDIR_BASE = os.environ.get(
    "BENCH_WORKDIR", "/dev/shm" if _TMPFS else None
)  # tmpfs: same rationale as bench.py / scaling_bench.py (BASELINE.md r4)


def main() -> None:
    from scalpel_ts_spark.plans.frontier import CrawlEngine
    from scalpel_ts_spark.sources.session import get_spark
    from scalpel_ts_spark.sources.synthetic import make_url

    spark = get_spark(
        "crawl_bench", cores=CPUS, shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.local.dir": _TMPFS} if _TMPFS else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (untimed): JVM/codegen/Python-worker spin-up
    warm = tempfile.mkdtemp(prefix="cb_warm_", dir=WORKDIR_BASE)
    weng = CrawlEngine(spark, warm, n_hosts=5, cap=8, refill=4)
    weng.init([f"http://h{h}.test/p/{p}" for h in range(5) for p in range(3)])
    weng.run(1)
    shutil.rmtree(warm, ignore_errors=True)

    # CB_NARROW_PROBE=1/0 pins the probe shape for interleaved A/Bs of
    # the hash-only seen_dedup cogroup; unset = engine default (wide —
    # see plans/frontier.py narrow_probe rationale)
    env_narrow = os.environ.get("CB_NARROW_PROBE")
    probe_kw = (
        {} if env_narrow is None else {"narrow_probe": env_narrow != "0"}
    )
    workdir = tempfile.mkdtemp(prefix="cb_crawl_", dir=WORKDIR_BASE)
    eng = CrawlEngine(
        spark, workdir, n_hosts=200, cap=512, refill=256,
        salt_buckets=16, write_docs=True, **probe_kw,
    )
    eng.init([make_url(h, p) for h in range(200) for p in range(25)])
    t0 = time.time()
    fetched = 0
    sections: dict[str, float] = {}
    for m in eng.run(ROUNDS):
        fetched += m["fetched"]
        for k, v in m.get("sections", {}).items():
            sections[k] = round(sections.get(k, 0.0) + v, 2)
    wall = round(time.time() - t0, 3)
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    print(json.dumps({
        "crawl_sec": wall,
        "urls_fetched": fetched,
        "urls_per_sec": round(fetched / wall, 1),
        "sections": sections,
        "cpus": CPUS,
        "rounds": ROUNDS,
        "workdir": WORKDIR_BASE or tempfile.gettempdir(),
        "narrow_probe": eng.narrow_probe,
        "includes_init": False,
    }))


if __name__ == "__main__":
    main()
