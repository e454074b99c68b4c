"""Stage-level profile of one 4M-URL macro-round: run the crawl
engine's scaling job at a given core count and dump every Spark stage
with its wall time, task count, and callsite from the live UI's REST
API — the direct way to see WHICH exchange/UDF a slow section spends
its time in (the per-section marks bound a whole multi-job pipeline).

Usage: taskset -c 0-7 python tools/stage_profile.py 8 [pages_per_host]
Prints one JSON line: stages sorted by duration desc.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
N_HOSTS = 500


def main() -> None:
    from pyspark.sql import functions as F

    from scalpel_ts_spark.plans.frontier import CrawlEngine
    from scalpel_ts_spark.sources.session import get_spark, tmpfs_local_dir
    from scalpel_ts_spark.sources.synthetic import make_url

    os.environ["SPARK_DRIVER_MEM"] = f"{4 + 4 * CORES}g"
    tmpfs = tmpfs_local_dir()
    base = tmpfs and "/dev/shm" or None
    conf = {"spark.ui.enabled": "true"}  # the REST API IS the profiler
    if tmpfs:
        conf["spark.local.dir"] = tmpfs
    spark = get_spark(
        f"profile-{CORES}", cores=CORES, shuffle_partitions=max(CORES, 8),
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    wd = tempfile.mkdtemp(prefix="prof_warm_", dir=base)
    warm = CrawlEngine(spark, wd, n_hosts=5, cap=8, refill=4, salt_buckets=4)
    warm.init([make_url(h, 0) for h in range(5)])
    warm.run(1)
    shutil.rmtree(wd, ignore_errors=True)
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        warm_stage_ids = {s["stageId"] for s in json.load(r)}

    wd = tempfile.mkdtemp(prefix="prof_run_", dir=base)
    cap = max(4096, PAGES + 256)
    eng = CrawlEngine(spark, wd, n_hosts=N_HOSTS, cap=cap, refill=cap // 2,
                      salt_buckets=32, write_docs=True)
    seeds = spark.range(N_HOSTS * PAGES).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % N_HOSTS).cast("string"),
            F.lit(".test/p/"),
            (F.col("id") / N_HOSTS).cast("long").cast("string"),
        ).alias("url")
    )
    eng.init_df(seeds)
    t0 = time.time()
    metrics = eng.run(1)
    wall = round(time.time() - t0, 2)
    shutil.rmtree(wd, ignore_errors=True)

    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        if s["stageId"] in warm_stage_ids:
            continue
        dur = (s.get("executorRunTime") or 0) / 1000.0
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:90],
            "tasks": s.get("numCompleteTasks"),
            "exec_run_sec": round(dur, 1),
            "input_mb": round((s.get("inputBytes") or 0) / 1e6),
            "shuffle_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6),
            "shuffle_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6),
            "spill_mb": round((s.get("memoryBytesSpilled") or 0) / 1e6),
        })
    rows.sort(key=lambda x: -x["exec_run_sec"])
    out = {
        "cores": CORES,
        "pages_per_host": PAGES,
        "wall_sec": wall,
        "sections": metrics[0].get("sections", {}),
        "fetched": metrics[0]["fetched"],
        "top_stages": rows[:25],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
