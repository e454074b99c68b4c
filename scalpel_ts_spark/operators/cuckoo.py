"""Partition-owned cuckoo filters — the deletable URL-seen prefilter.

North rule: "partitioned bloom-filter (with cuckoo-filter fallback
for deletes) URL-seen set".  Blooms cannot delete (clearing a bit may
clear other keys); a cuckoo filter stores displaceable 16-bit
fingerprints in two candidate buckets, so membership, insert AND
delete are all O(1) — the engine uses it where crawl policy must
*retract* URLs (robots rule changes, recrawl scheduling, GDPR purges)
without rebuilding the prefilter.

Same architecture as operators/seen.py blooms: one filter per
``pmod(url_hash, n_partitions)`` partition, stored as a binary column,
maintained/probed with cogrouped Arrow batches (numpy inside, no
per-row Python).  The exact seen table remains the authority; the
filter is only ever a prefilter (identical FP-safety argument as the
bloom path).

Layout per partition: ``n_buckets`` buckets x ``bucket_size`` slots of
uint16 fingerprints (0 = empty).  Classic Fan et al. partial-key
cuckoo hashing: bucket2 = bucket1 XOR H(fingerprint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

CUCKOO_SCHEMA = StructType(
    [
        StructField("part", IntegerType()),
        StructField("table", BinaryType()),
    ]
)

_FP_SEED = np.uint64(0x9E3779B97F4A7C15)
_MAX_KICKS = 500


class CuckooSaturationError(RuntimeError):
    """A partition's cuckoo table could not hold every key.

    Dropped fingerprints would be silent FALSE NEGATIVES — callers of
    :func:`cuckoo_prefilter` rely on "no false negatives" to let
    ``maybe_seen = 0`` rows skip the exact anti-join, so saturation
    must fail loudly instead of corrupting the seen set.  Fix by
    raising ``n_buckets``/``bucket_size`` (capacity per partition) or
    ``n_partitions`` (keys per partition).
    """


class CuckooDeleteError(RuntimeError):
    """A delete targeted a key whose fingerprint is absent.

    The engine only deletes keys it previously inserted; a miss means
    either misuse or an earlier (now impossible, see
    :class:`CuckooSaturationError`) dropped insert.  Deleting a
    never-inserted key is also unsafe in general: if its fingerprint
    collides with another key's, the eviction creates a false negative
    for that other key — hence deletes are validated, not best-effort.
    """


class CuckooTable:
    """In-memory cuckoo filter over uint16 fingerprints (one
    partition's state; (de)serialized to a binary column)."""

    __slots__ = ("n_buckets", "bucket_size", "slots")

    def __init__(self, n_buckets: int = 1 << 14, bucket_size: int = 4,
                 slots: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.slots = (
            slots
            if slots is not None
            else np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        )

    # --- key decomposition -------------------------------------------------

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h.astype(np.uint64) * _FP_SEED) >> np.uint64(48)).astype(
            np.uint16
        )
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _b1(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        step = (fp.astype(np.uint64) * _FP_SEED) >> np.uint64(32)
        return ((b.astype(np.uint64) ^ step) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    # --- operations (scalar insert loop; vectorized probe) -----------------

    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert; returns number of failed insertions (table full)."""
        fps = self._fp(hashes)
        b1s = self._b1(hashes)
        failed = 0
        rng = np.random.default_rng(12345)  # deterministic kick choice
        for fp, b1 in zip(fps, b1s):
            b2 = self._alt(np.array([b1]), np.array([fp]))[0]
            placed = False
            for b in (b1, b2):
                row = self.slots[b]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            b, cur = (b1 if rng.integers(2) else b2), fp
            for _ in range(_MAX_KICKS):
                slot = int(rng.integers(self.bucket_size))
                cur, self.slots[b, slot] = self.slots[b, slot], cur
                b = self._alt(np.array([b]), np.array([cur]))[0]
                row = self.slots[b]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur
                    cur = None
                    break
            if cur is not None:
                failed += 1
        return failed

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        fps = self._fp(hashes)
        b1 = self._b1(hashes)
        b2 = self._alt(b1, fps)
        in1 = (self.slots[b1] == fps[:, None]).any(axis=1)
        in2 = (self.slots[b2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns misses."""
        fps = self._fp(hashes)
        b1s = self._b1(hashes)
        b2s = self._alt(b1s, fps)
        misses = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            for b in (b1, b2):
                row = self.slots[b]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    break
            else:
                misses += 1
        return misses

    # --- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        return self.slots.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int = 1 << 14,
                   bucket_size: int = 4) -> "CuckooTable":
        slots = (
            np.frombuffer(data, dtype=np.uint16)
            .reshape(n_buckets, bucket_size)
            .copy()
        )
        return cls(n_buckets, bucket_size, slots)


def _partitioned(df: DataFrame, hash_col: str, n_partitions: int) -> DataFrame:
    return df.select(
        F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int").alias("part"),
        F.col(hash_col).alias("url_hash"),
    )


def build_cuckoo(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 32,
    n_buckets: int = 1 << 14,
    bucket_size: int = 4,
) -> DataFrame:
    """One cuckoo table per hash partition: (part, table)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"part": [], "table": []})
        part = int(pdf["part"].iloc[0])
        t = CuckooTable(n_buckets, bucket_size)
        failed = t.insert_many(pdf["url_hash"].to_numpy(dtype=np.int64))
        if failed:
            raise CuckooSaturationError(
                f"cuckoo partition {part} saturated: {failed}/{len(pdf)} "
                f"fingerprints dropped (capacity ~{n_buckets * bucket_size} "
                f"slots); raise n_buckets/bucket_size or n_partitions"
            )
        return pd.DataFrame({"part": [part], "table": [t.to_bytes()]})

    return (
        _partitioned(seen, hash_col, n_partitions)
        .groupBy("part")
        .applyInPandas(_build, CUCKOO_SCHEMA)
    )


def update_cuckoo(
    tables: DataFrame,
    inserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    hash_col: str = "url_hash",
    n_partitions: int = 32,
    n_buckets: int = 1 << 14,
    bucket_size: int = 4,
) -> DataFrame:
    """Apply inserts then deletes partition-locally (the delete path
    blooms cannot offer).  Either side may be None/empty."""
    spark = tables.sparkSession
    empty = spark.createDataFrame([], "url_hash long")
    ins = _partitioned(inserts if inserts is not None else empty,
                       hash_col if inserts is not None else "url_hash",
                       n_partitions).withColumn("op", F.lit(1))
    dels = _partitioned(deletes if deletes is not None else empty,
                        hash_col if deletes is not None else "url_hash",
                        n_partitions).withColumn("op", F.lit(-1))
    delta = ins.unionByName(dels)

    def _apply(delta_pdf: pd.DataFrame, tab_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(tab_pdf) > 0:
            t = CuckooTable.from_bytes(
                tab_pdf["table"].iloc[0], n_buckets, bucket_size
            )
            part = int(tab_pdf["part"].iloc[0])
        else:
            t = CuckooTable(n_buckets, bucket_size)
            part = int(delta_pdf["part"].iloc[0])
        if len(delta_pdf):
            ins_h = delta_pdf.loc[delta_pdf["op"] == 1, "url_hash"]
            del_h = delta_pdf.loc[delta_pdf["op"] == -1, "url_hash"]
            if len(ins_h):
                failed = t.insert_many(ins_h.to_numpy(dtype=np.int64))
                if failed:
                    raise CuckooSaturationError(
                        f"cuckoo partition {part} saturated on update: "
                        f"{failed}/{len(ins_h)} fingerprints dropped; raise "
                        f"n_buckets/bucket_size or n_partitions"
                    )
            if len(del_h):
                misses = t.delete_many(del_h.to_numpy(dtype=np.int64))
                if misses:
                    raise CuckooDeleteError(
                        f"cuckoo partition {part}: {misses}/{len(del_h)} "
                        f"deletes targeted keys never inserted"
                    )
        return pd.DataFrame({"part": [part], "table": [t.to_bytes()]})

    return (
        delta.groupBy("part")
        .cogroup(tables.withColumnRenamed("part", "part").groupBy("part"))
        .applyInPandas(_apply, CUCKOO_SCHEMA)
    )


def cuckoo_prefilter(
    candidates: DataFrame,
    tables: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 32,
    n_buckets: int = 1 << 14,
    bucket_size: int = 4,
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` (cogrouped, vectorized) —
    drop-in replacement for the bloom prefilter where deletes are
    required."""
    with_part = candidates.withColumn(
        "_part", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")
    )
    out_schema = StructType(
        with_part.schema.fields + [StructField("maybe_seen", IntegerType())]
    )

    def _probe(cand_pdf: pd.DataFrame, tab_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return cand_pdf.assign(maybe_seen=pd.array([], dtype="int32"))
        if len(tab_pdf) == 0:
            return cand_pdf.assign(
                maybe_seen=np.zeros(len(cand_pdf), dtype=np.int32)
            )
        t = CuckooTable.from_bytes(
            tab_pdf["table"].iloc[0], n_buckets, bucket_size
        )
        hit = t.contains_many(cand_pdf[hash_col].to_numpy(dtype=np.int64))
        return cand_pdf.assign(maybe_seen=hit.astype(np.int32))

    cg = with_part.groupBy("_part").cogroup(
        tables.withColumnRenamed("part", "_part").groupBy("_part")
    )
    return cg.applyInPandas(_probe, out_schema).drop("_part")
