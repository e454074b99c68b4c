"""Interleaved A/B medians for the two queries BENCH_r02 flagged as
regressed vs r01 (VERDICT r2 'what's wrong' #3).

This host swings ±30-50% run-to-run, so the only trustworthy
comparison is interleaved repetitions inside ONE session: variants
alternate A,B,A,B,... and medians are compared.  Variants:

* seen_antijoin_bloom —
  - ``split_union`` (current, r2): bloom-negative rows bypass the
    exact anti-join (operators/seen.new_urls)
  - ``all_through_anti`` (r1 shape): every tagged row rides the exact
    anti-join exchange
  - ``plain_anti`` (no bloom): single left_anti join
* embedding_neardup —
  - ``id_only`` (current, r2): band join + pair-dedup on ids, vectors
    re-joined once per side (operators/similarity.lsh_candidates)
  - ``vectors_ride`` (r1 shape): embeddings carried through the band
    join and the pair-distinct

Usage: python tools/ab_bench.py [sf_dir] [reps]
Prints one JSON line with per-variant medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from scalpel_ts_spark.functions.vector import (
        cosine,
        hyperplanes,
        lsh_buckets_udf,
    )
    from scalpel_ts_spark.operators.seen import (
        bloom_prefilter,
        build_bloom,
        new_urls,
    )
    from scalpel_ts_spark.sources.session import get_spark, tmpfs_local_dir

    import __spark_entry__ as E

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmpfs = tmpfs_local_dir()
    spark = get_spark(
        "ab_bench", cores=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": tmpfs} if tmpfs else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def tbl(name):
        return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))

    # --- seen_antijoin variants (same data as q_seen_antijoin_bloom) ---
    orders, customer = tbl("orders"), tbl("customer")
    cand = orders.select(F.col("o_custkey").alias("key")).distinct()
    seen = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key")
    )
    blooms = build_bloom(seen, hash_col="key", n_buckets=8).persist()
    blooms.count()

    def seen_split_union():
        return new_urls(cand, seen, blooms, hash_col="key", n_buckets=8)

    def seen_all_through_anti():
        tagged = bloom_prefilter(cand, blooms, "key", n_buckets=8)
        return tagged.drop("maybe_seen").join(seen, "key", "left_anti")

    def seen_plain_anti():
        return cand.join(seen, "key", "left_anti")

    # --- embedding_neardup variants (same data as q_embedding_neardup) ---
    corpus = E._emb_corpus(spark, SF_DIR).persist()
    corpus.count()
    dim, n_tables, n_bits, thr = 64, 16, 8, 0.95
    planes = hyperplanes(dim, n_tables, n_bits, 42)

    def emb_id_only():
        from scalpel_ts_spark.operators.similarity import (
            embedding_near_duplicates,
        )

        # pin the shape: the production auto-gate would pick
        # vectors-ride at this volume, which is the OTHER variant
        return embedding_near_duplicates(
            corpus, dim=dim, threshold=thr, carry_vectors=False
        )

    def emb_vectors_ride():
        udf = lsh_buckets_udf(planes, n_tables, n_bits)
        a = corpus.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("vec_a"),
            F.posexplode(udf(F.col("embedding"))).alias("table", "bucket"),
        )
        b = corpus.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vec_b"),
            F.posexplode(udf(F.col("embedding"))).alias("table", "bucket"),
        )
        pairs = (
            a.join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            pairs.withColumn("sim", cosine(F.col("vec_a"), F.col("vec_b")))
            .filter(F.col("sim") >= thr)
            .select("id_a", "id_b")
        )

    groups = {
        "seen_antijoin": {
            "split_union": seen_split_union,
            "all_through_anti": seen_all_through_anti,
            "plain_anti": seen_plain_anti,
        },
        "embedding_neardup": {
            "id_only": emb_id_only,
            "vectors_ride": emb_vectors_ride,
        },
    }

    results: dict = {}
    for gname, variants in groups.items():
        # warm-up every variant once, untimed
        counts = {v: fn().count() for v, fn in variants.items()}
        times: dict[str, list] = {v: [] for v in variants}
        for _ in range(REPS):  # interleaved: A,B,(C),A,B,(C),...
            for v, fn in variants.items():
                t0 = time.time()
                fn().count()
                times[v].append(round(time.time() - t0, 3))
        results[gname] = {
            v: {
                "median": round(statistics.median(ts), 3),
                "runs": ts,
                "rows": counts[v],
            }
            for v, ts in times.items()
        }

    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, **results}))


if __name__ == "__main__":
    main()
