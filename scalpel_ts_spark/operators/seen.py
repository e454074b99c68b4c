"""URL-seen set: bloom prefilter + exact anti-join.

North rule: "partitioned bloom-filter (cuckoo fallback for deletes)
URL-seen set keyed by canonicalized-URL hash" AND "URL-seen set
exactly".  Blooms alone would false-positive-drop real URLs, so the
architecture is:

    candidates --bloom prefilter--> probably-seen? --exact anti-join--> new

The bloom pass is partition-local (bitmaps keyed by
``bucket(url_hash)``) and cheaply removes the bulk of already-seen
URLs *before* the expensive exact anti-join shuffle; the anti-join
remains the authority, so correctness never depends on bloom FP rate.
At the 10^10-URL design point: 10 bits/key => ~12 GiB of bloom bits
across >= 512 buckets of ~24 MiB — each bucket fits comfortably in an
executor; buckets co-partition with the candidate side so the probe is
a map-side operation after one hash-partition exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("bits", BinaryType()),
    ]
)

_PROBE_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("url_hash", LongType()),
        StructField("maybe_seen", IntegerType()),
    ]
)


def bloom_bits_for(
    n_keys: int,
    n_buckets: int,
    bits_per_key: int = 10,
    floor: int = 1 << 17,
) -> int:
    """Per-bucket bitmap size (bits, power of two) for an expected key
    count.

    ~10 bits/key keeps a bloom's false-positive rate ~1%; a bitmap
    sized far below that saturates (FP -> 100%) and the anti-join
    bypass silently stops bypassing anything — still CORRECT (the
    exact anti-join is always the authority) but the whole discovery
    volume then rides the expensive exchange.  Callers pass the key
    count they expect the seen set to reach before the next rebuild
    (the crawl engine resizes at every compaction, where the full
    seen set is rewritten anyway)."""
    want = max(floor, (bits_per_key * max(1, n_keys)) // max(1, n_buckets))
    bits = floor
    while bits < want:
        bits <<= 1
    return bits


def _positions(hashes: np.ndarray, m_bits: int, n_funcs: int):
    """k derived hash positions per key (double hashing on xxhash64)."""
    h1 = hashes.astype(np.uint64)
    h2 = (h1 >> np.uint64(17)) | np.uint64(1)  # odd => full-period stride
    for i in range(n_funcs):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def build_bloom(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 32,
    bits_per_bucket: int = 1 << 17,
    n_funcs: int = 5,
) -> DataFrame:
    """Build partition-owned bloom bitmaps from the seen set.

    One output row per bucket: (bucket, bits).  Persisted alongside
    the seen snapshot so incremental rounds OR-in only new hashes.
    """
    bucketed = seen.select(
        F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(hash_col).alias("url_hash"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"bucket": [], "bits": []})
        bucket = int(pdf["bucket"].iloc[0])
        bits = np.zeros(bits_per_bucket // 8, dtype=np.uint8)
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        for pos in _positions(hashes, bits_per_bucket, n_funcs):
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()]})

    return bucketed.groupBy("bucket").applyInPandas(_build, BLOOM_SCHEMA)


def _probe_bits(arr: np.ndarray, hashes: np.ndarray, m_bits: int, n_funcs: int):
    """Vectorized membership test of ``hashes`` against one bitmap."""
    hit = np.ones(len(hashes), dtype=bool)
    for pos in _positions(hashes, m_bits, n_funcs):
        hit &= ((arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).astype(bool)
    return hit


def bloom_prefilter(
    candidates: DataFrame,
    blooms: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 32,
    n_funcs: int = 5,
    dedup_by_hash: bool = False,
    max_rows_per_bucket: int | None = None,
) -> DataFrame:
    """Tag candidates with ``maybe_seen``; definite-new rows (bloom
    miss) skip the exact anti-join entirely.

    There is no bitmap-size parameter: each bucket's geometry is
    derived from its stored bytes (self-describing — the engine
    resizes bitmaps at rebuilds, and a resumed or mid-resize probe
    must test against each bucket's actual size).  ``n_buckets`` MUST
    match the count the bitmaps were built with: a bucket with no
    bloom row means "no seen key hashes here", which is only true
    under the build-time bucketing.

    Cogroup by bucket: each task holds ONE bitmap and probes its whole
    candidate group in a few numpy passes — the bitmap is never
    duplicated per row, which is what lets 10^10-URL bloom state
    (GiBs of bits) stay partition-owned instead of broadcast.

    ``dedup_by_hash=True`` additionally drops duplicate ``hash_col``
    rows inside the probe: the bucket is a pure function of the hash,
    so equal hashes always land in the same task and an in-task
    ``drop_duplicates`` IS a global dedup — sharing the bucket
    exchange instead of paying a second, string-keyed shuffle (the
    round-3 verdict's top lever: the crawl's link-discovery
    ``dropDuplicates(url)`` was the widest exchange in the engine).
    Rows with equal hash are identical in every derived column (the
    64-bit hash is the engine-wide URL identity), so keeping the
    first is deterministic.
    """
    from pyspark.sql.types import StructType

    with_bucket = candidates.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    out_schema = StructType(
        with_bucket.schema.fields + [StructField("maybe_seen", IntegerType())]
    )

    def _probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if max_rows_per_bucket is not None and len(cand_pdf) > max_rows_per_bucket:
            # one bucket = one task's pandas heap; a silent 100x config
            # mismatch (huge discovery volume, tiny n_buckets) must
            # fail loudly, not OOM an executor (round-4 verdict #3)
            raise ValueError(
                f"bloom bucket overflow: {len(cand_pdf)} candidate rows in "
                f"one bucket exceeds max_rows_per_bucket="
                f"{max_rows_per_bucket}; raise n_buckets (CrawlEngine "
                f"auto-scales via bloom_target_rows_per_bucket)"
            )
        if dedup_by_hash and len(cand_pdf):
            cand_pdf = cand_pdf.drop_duplicates(
                subset=[hash_col], ignore_index=True
            )
        if len(cand_pdf) == 0:
            return cand_pdf.assign(maybe_seen=pd.array([], dtype="int32"))
        if len(bloom_pdf) == 0:
            return cand_pdf.assign(
                maybe_seen=np.zeros(len(cand_pdf), dtype=np.int32)
            )
        arr = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8)
        h = cand_pdf[hash_col].to_numpy(dtype=np.int64)
        # bitmap size is SELF-DESCRIBING (derived from the stored
        # bytes, not the config param): the engine resizes bitmaps at
        # compaction rebuilds, and a resumed/mid-resize probe must
        # test against each bucket's actual geometry
        hit = _probe_bits(arr, h, len(arr) * 8, n_funcs)
        return cand_pdf.assign(maybe_seen=hit.astype(np.int32))

    cg = with_bucket.groupBy("_bucket").cogroup(
        blooms.withColumnRenamed("bucket", "_bucket").groupBy("_bucket")
    )
    return cg.applyInPandas(_probe, out_schema).drop("_bucket")


def update_bloom(
    blooms: DataFrame,
    delta: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 32,
    bits_per_bucket: int = 1 << 17,
    n_funcs: int = 5,
) -> DataFrame:
    """OR new hashes into existing bitmaps — incremental, partition-
    local; never rescans the historical seen set."""
    bucketed = delta.select(
        F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int").alias("_bucket"),
        F.col(hash_col).alias("url_hash"),
    )

    def _merge(delta_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(bloom_pdf) > 0:
            bits = np.frombuffer(
                bloom_pdf["bits"].iloc[0], dtype=np.uint8
            ).copy()
            bucket = int(bloom_pdf["_bucket"].iloc[0])
        else:
            bits = np.zeros(bits_per_bucket // 8, dtype=np.uint8)
            bucket = int(delta_pdf["_bucket"].iloc[0])
        if len(delta_pdf) > 0:
            hashes = delta_pdf["url_hash"].to_numpy(dtype=np.int64)
            # existing bitmaps keep their own geometry (self-describing
            # — see bloom_prefilter); the param sizes only brand-new
            # buckets
            for pos in _positions(hashes, len(bits) * 8, n_funcs):
                np.bitwise_or.at(
                    bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()]})

    cg = bucketed.groupBy("_bucket").cogroup(
        blooms.withColumnRenamed("bucket", "_bucket").groupBy("_bucket")
    )
    return cg.applyInPandas(_merge, BLOOM_SCHEMA)


def new_urls(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
    hash_col: str = "url_hash",
    persisted_out: list | None = None,
    dedup: bool = False,
    narrow: bool = False,
    preagg: bool = False,
    broadcast_new: bool = True,
    **bloom_kwargs,
) -> DataFrame:
    """candidates ∖ seen — exact, with optional bloom prefilter.

    ``dedup=True`` also drops duplicate ``hash_col`` rows (the crawl's
    per-round link dedup): with blooms it rides the bucket cogroup for
    free (see :func:`bloom_prefilter`); without, it is a plain
    hash-keyed ``dropDuplicates`` before the anti-join.

    The exact ``left_anti`` join is the authority; when blooms are
    supplied, ONLY bloom-positive rows pay for it.  At 10^10 URLs the
    point of the bloom is that genuinely-new URLs (~all of the
    discovery volume) never enter the anti-join exchange at all:
    the tagged frame is persisted once, ``maybe_seen = 0`` rows pass
    straight to the union, and the anti-join shuffles just the suspect
    subset (bloom-positive: true seen + the small FP fraction).
    A single conditional anti-join (``ON hash = seen AND maybe_seen =
    1``) would be wrong-shaped — anti-join semantics force every tagged
    row through the exchange since non-matching rows must be kept.

    ``persisted_out``: callers running inside a loop (the crawl engine)
    pass a list; the internal persisted frame is appended so it can be
    unpersisted after the result is materialized.  One-shot callers may
    omit it (the cache dies with the session).

    ``narrow=True`` (requires blooms + dedup): the bucket cogroup
    carries ONLY the int64 hash — dedup and bloom probe never touch
    the URL strings, so the Arrow exchange is 8 bytes/row instead of
    the full (url, host_id, hash) width (round-4 verdict's top crawl
    lever: the cogroup was 41%% of crawl wall and the engine's worst
    1->4-core section, DRAM-bound on string traffic).  Strings are
    re-attached afterwards by semi-joining the raw candidate frame
    against the (small, post-dedup, post-anti-join) new-hash set —
    broadcast when the CALLER's a-priori bound on that set is small
    (``broadcast_new=True`` — the crawl engine gates on its per-round
    discovery budget, ~8 links x cap x n_hosts vs 4M rows = 32 MB of
    8-byte hashes; the same budget-conditional pattern as
    frontier_anti_join), a shuffle semi-join past it — then deduped
    with a hash-keyed aggregate
    whose exchange carries only the genuinely-NEW rows (duplicate
    in-links included), not the full discovery volume.  min() is the
    deterministic pick; rows with equal hash are identical anyway
    (the 64-bit hash is the engine-wide URL identity).

    ``preagg=True`` (requires dedup): dedup runs as a JVM hash
    aggregate (``groupBy(hash).agg(min(*))``) BEFORE the bucket
    cogroup instead of inside it.  Two exchanges instead of one, but
    both cheaper: the aggregate's map-side partial combine removes
    intra-partition duplicate links before anything is exchanged
    (strings ride JVM tungsten rows, never Arrow), and the cogroup
    then ships only DISTINCT URLs — the Arrow volume shrinks by the
    crawl's duplication factor (avg in-degree, ~4-8x on link graphs).
    min() is deterministic; rows with equal hash are identical (the
    64-bit hash is the engine-wide URL identity).
    """
    if blooms is None:
        if dedup:
            candidates = candidates.dropDuplicates([hash_col])
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    if preagg:
        assert dedup and not narrow, "preagg is a standalone dedup strategy"
        other = [c for c in candidates.columns if c != hash_col]
        candidates = (
            candidates.groupBy(hash_col)
            .agg(*[F.min(c).alias(c) for c in other])
            .select(candidates.columns)
        )
        dedup = False  # already exact-deduped; cogroup probes only

    def _probe_then_anti(cand: DataFrame, dedup_by_hash: bool) -> DataFrame:
        # shared tail of both probe shapes: tag via the bucket cogroup
        # (persisted once — both filter branches read it), let bloom
        # misses skip the anti-join, exact-check only the suspects
        tagged = bloom_prefilter(
            cand, blooms, hash_col, dedup_by_hash=dedup_by_hash,
            **bloom_kwargs,
        ).persist()
        if persisted_out is not None:
            persisted_out.append(tagged)
        definite_new = tagged.filter(F.col("maybe_seen") == 0).drop("maybe_seen")
        suspects = tagged.filter(F.col("maybe_seen") == 1).drop("maybe_seen")
        checked = suspects.join(seen.select(hash_col), hash_col, "left_anti")
        return definite_new.unionByName(checked)

    if narrow:
        assert dedup, "narrow probe implies hash dedup"
        new_hashes = _probe_then_anti(
            candidates.select(hash_col), dedup_by_hash=True
        )
        if broadcast_new:
            new_hashes = F.broadcast(new_hashes)
        other = [c for c in candidates.columns if c != hash_col]
        return (
            candidates.join(new_hashes, hash_col, "left_semi")
            .groupBy(hash_col)
            .agg(*[F.min(c).alias(c) for c in other])
            .select(candidates.columns)
        )
    return _probe_then_anti(candidates, dedup_by_hash=dedup)
