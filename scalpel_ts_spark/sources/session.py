"""SparkSession factory with scale-oriented defaults.

Local runs model a multi-executor cluster via ``local[N]``; the knobs
here are the ones that matter at the 100 TB design point:

* AQE on (runtime coalescing, skew-join splitting)
* shuffle partitions scaled with cores (locally) — on a real cluster
  this is set to 2-3x total executor cores by the submitter
* Arrow batches sized so parse/extract pandas UDFs amortize the
  Python<->JVM hop without blowing executor memory on wide HTML rows
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scalpel-ts-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 1x cores locally; a real cluster submit would use 2-3x total cores
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill scratch on tmpfs when available: on a real cluster
    # every executor spills to ITS OWN local SSDs (a resource that
    # scales with the cluster), but this sandbox's lone virtio disk is
    # shared by all 32 "executor" threads — measured as a data-volume-
    # dependent, non-scaling ~50s drag on a 2M-URL crawl round's dedup
    # shuffle (BASELINE.md r4).  SPARK_GRAFT_LOCAL_DIR overrides; set
    # it to /tmp to measure the disk path.
    local_dir = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR",
        "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None,
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
