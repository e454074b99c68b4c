"""ANN recall measurement vs brute force (VERDICT r3 missing #1).

Prints ONE JSON line: recall@k of lsh_topk / ivf_topk against
brute_force_topk on the sandbox embeddings, across the parameter grid
a user would actually tune (tables, multi-probe radius, nprobe), plus
the planted-near-neighbor recall@1 (the near-dup operating point).
Numbers are recorded in BASELINE.md; tests/test_ann_recall.py pins
regression floors on the defaults.

Usage: python tools/recall_bench.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> None:
    from scalpel_ts_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from scalpel_ts_spark.sources.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("recall", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()

    def recall(exact, approx):
        total = exact.count()
        hit = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        return round(hit / total, 3)

    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = brute_force_topk(queries, emb, k=K).persist()
    exact.count()
    out = {"sf_dir": SF_DIR, "corpus": n, "k": K, "raw": {}, "planted": {}}
    grid = {
        "lsh_16t_8b": dict(n_tables=16, n_bits=8),
        "lsh_16t_8b_probe1": dict(n_tables=16, n_bits=8, probe_radius=1),
        "lsh_32t_8b_probe1": dict(n_tables=32, n_bits=8, probe_radius=1),
    }
    for name, kw in grid.items():
        out["raw"][name] = recall(
            exact, lsh_topk(queries, emb, dim=64, k=K, **kw)
        )
    for nprobe in (4, 8):
        out["raw"][f"ivf_16c_nprobe{nprobe}"] = recall(
            exact, ivf_topk(queries, emb, k=K, n_cells=16, nprobe=nprobe)
        )

    # planted near-neighbors: noisy copies at cos ~ 0.95
    rng = np.random.default_rng(99)
    rows = queries.collect()
    noisy = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        scale = np.linalg.norm(v) / np.sqrt(len(v)) * 0.25
        nv = v + rng.normal(size=v.shape) * scale
        noisy.append((r["vec_id"] + 1_000_000, [float(x) for x in nv]))
    nq = spark.createDataFrame(noisy, ["vec_id", "embedding"])
    ex1 = brute_force_topk(nq, emb, k=1).persist()
    ex1.count()
    out["planted"]["lsh_16t_8b@1"] = recall(ex1, lsh_topk(nq, emb, dim=64, k=1))
    out["planted"]["ivf_16c_nprobe4@1"] = recall(
        ex1, ivf_topk(nq, emb, k=1, n_cells=16, nprobe=4)
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
