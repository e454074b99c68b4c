"""Deterministic dataset splitting / stratified sampling
(functions/split.py): cross-engine parity, stability, proportions,
salt independence, monotone subsets, and dedup-key leakage safety."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from scalpel_ts_spark.functions import split as S
from scalpel_ts_spark.functions import text as T
from scalpel_ts_spark.operators.dedup import exact_duplicates

WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.createDataFrame(
        [(f"doc-{i:05d}",) for i in range(5000)], "k string"
    )


def test_bucket_matches_python_md5_reference(spark):
    """The contract everything rests on: bucket == int(md5[:15],16)%N,
    computed JVM-side."""
    got = (
        spark.createDataFrame([("a",), ("doc-42",), (None,)], "k string")
        .select("k", S.hash_bucket(F.col("k")).alias("b"))
        .collect()
    )
    for r in got:
        if r["k"] is None:
            assert r["b"] is None
        else:
            h = hashlib.md5(r["k"].encode()).hexdigest()
            assert r["b"] == int(h[:15], 16) % S.N_BUCKETS


def test_duckdb_mirror_agrees_per_row(spark):
    """Every SQL mirror must reproduce the Spark value bit-for-bit,
    including NULL keys and integer keys (cast-to-string path)."""
    import duckdb

    rows = [(i, f"doc-{i}" if i % 7 else None) for i in range(500)]
    fr = {"en": 0.5, "de": 0.25}
    got = (
        spark.createDataFrame(rows, "id bigint, k string")
        .select(
            "id",
            S.hash_bucket(F.col("k"), salt="split").alias("b_str"),
            S.hash_bucket(F.col("id")).alias("b_int"),
            S.split_assign(F.col("k"), WEIGHTS).alias("split"),
            S.stratified_keep(
                F.col("k"),
                F.when(F.col("id") % 2 == 0, "en").otherwise("de"),
                fr,
                default=0.1,
            ).alias("keep"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    stratum = "(CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END)"
    oracle = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT id, {S.hash_bucket_sql('k', salt='split')}, "
            f"{S.hash_bucket_sql('id')}, "
            f"{S.split_assign_sql('k', WEIGHTS)}, "
            f"{S.stratified_keep_sql('k', stratum, fr, default=0.1)} FROM t"
        ).fetchall()
    }
    for r in got:
        assert (r["b_str"], r["b_int"], r["split"], r["keep"]) == oracle[r["id"]]


def test_split_proportions_and_stability(spark, keys_df):
    labeled = keys_df.select(
        "k", S.split_assign(F.col("k"), WEIGHTS).alias("split")
    )
    counts = Counter(r["split"] for r in labeled.collect())
    n = sum(counts.values())
    assert counts["train"] / n == pytest.approx(0.9, abs=0.02)
    assert counts["val"] / n == pytest.approx(0.05, abs=0.01)
    assert counts["test"] / n == pytest.approx(0.05, abs=0.01)
    # stability: the same keys reversed and re-split agree per key
    again = {
        r["k"]: r["split"]
        for r in keys_df.orderBy(F.desc("k"))
        .select("k", S.split_assign(F.col("k"), WEIGHTS).alias("split"))
        .collect()
    }
    for r in labeled.collect():
        assert again[r["k"]] == r["split"]


def test_sampling_is_independent_of_split(spark, keys_df):
    """Distinct default salts: a 10% sample must NOT be drawn from one
    end of the split's bucket space — within the sample, the split
    distribution stays ~90/5/5."""
    sampled = keys_df.filter(
        S.stratified_keep(F.col("k"), F.lit("all"), {"all": 0.1})
    ).select("k", S.split_assign(F.col("k"), WEIGHTS).alias("split"))
    counts = Counter(r["split"] for r in sampled.collect())
    n = sum(counts.values())
    assert n == pytest.approx(500, abs=75)
    assert counts["train"] / n == pytest.approx(0.9, abs=0.05)


def test_samples_are_monotone_prefixes(spark, keys_df):
    """Raising a fraction strictly grows the kept set (bucket-prefix
    property) — the contract behind reproducible scaling-law chains."""

    def kept(frac):
        return {
            r["k"]
            for r in keys_df.filter(
                S.stratified_keep(F.col("k"), F.lit("all"), {"all": frac})
            ).collect()
        }

    small, large = kept(0.1), kept(0.3)
    assert small < large


def test_split_on_dedup_key_keeps_copies_together(spark):
    """Leakage safety: splitting on the dedup canonical_id puts every
    copy of a document in the same split."""
    docs = spark.createDataFrame(
        [(i, f"text number {i % 20}") for i in range(100)],
        "doc_id bigint, text string",
    )
    groups = exact_duplicates(docs)  # fp, canonical_id, n_dupes
    labeled = (
        docs.join(
            groups.select("canonical_id", "fp"),
            on=T.fingerprint(docs["text"]) == F.col("fp"),
        )
        .select(
            "doc_id",
            S.split_assign(F.col("canonical_id"), WEIGHTS).alias("split"),
            "fp",
        )
    )
    per_group = labeled.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert all(r["n_splits"] == 1 for r in per_group.collect())


def test_weight_validation():
    col = F.lit("x")
    with pytest.raises(ValueError, match="sum to 1"):
        S.split_assign(col, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="positive"):
        S.split_assign(col, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        S.split_assign(col, {})
    with pytest.raises(ValueError, match="zero buckets"):
        S.split_assign(col, {"a": 0.99999, "b": 0.00001})
    with pytest.raises(ValueError, match="zero buckets"):
        S.split_assign(col, {"a": 0.00001, "b": 0.99999})
    with pytest.raises(ValueError, match="out of \\[0,1\\]"):
        S.stratified_keep(col, col, {"a": 1.2})
    with pytest.raises(ValueError, match="single quotes"):
        S.hash_bucket(col, salt="bad'salt")


def test_single_split_and_null_keys(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    got = df.select(
        "k", S.split_assign(F.col("k"), {"all": 1.0}).alias("s")
    ).collect()
    by_key = {r["k"]: r["s"] for r in got}
    assert by_key["a"] == "all"
    assert by_key[None] is None
