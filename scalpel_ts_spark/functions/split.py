"""Deterministic dataset splitting and stratified sampling.

Training pipelines need train/val/test assignment and per-stratum
downsampling that are *reproducible* — the properties ``rand()`` and
``row_number()`` cannot give:

* **stable under reprocessing** — a document's split never changes
  when the corpus grows, is repartitioned, or rows are reordered;
  ``rand()`` reassigns every run and ``row_number()`` reassigns
  whenever any earlier row appears or disappears.
* **coordination-free** — assignment is a pure column expression
  (whole-stage codegen, no shuffle, no driver state), so at 100 TB it
  costs exactly one projection fused into the scan.
* **leakage-safe by key choice** — split on a dedup-cluster key (the
  ``canonical_id`` from :mod:`scalpel_ts_spark.operators.dedup`) and
  every near-copy of a document lands in the same split.

Cross-engine contract (the driver's DuckDB oracle mirrors every
function here): ``bucket = int(md5(key)[:15], 16) % n_buckets``.
Fifteen hex chars = 60 bits, which fits a signed 64-bit integer in
both engines, and md5 is bit-identical everywhere — never use
engine-internal hashes (xxhash64, DuckDB ``hash()``) for anything an
oracle must reproduce.

Salting: different consumers of the same key must use *different*
salts or their decisions correlate — e.g. an unsalted 10% sample
drawn over the same buckets that define a 90/5/5 split would select
documents exclusively from the train range.  ``split_assign`` and
``stratified_keep`` therefore default to distinct salts.

NULL keys hash to NULL (md5(NULL) is NULL in both engines), so NULL
rows get a NULL split / NULL keep (which a filter drops) — callers
decide their fate explicitly rather than inheriting a silent
bucket-0 assignment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bucket granularity: weights are quantized to 1/N_BUCKETS, so the
#: default supports fractions down to 0.01% exactly.
N_BUCKETS = 10_000


def _salted(key: Column, salt: str) -> Column:
    key = key.cast("string")
    if not salt:
        return key
    if "'" in salt:  # the SQL mirror inlines the salt as a literal
        raise ValueError(f"salt must not contain single quotes: {salt!r}")
    return F.concat(key, F.lit("|" + salt))


def _salted_sql(col: str, salt: str) -> str:
    expr = f"CAST({col} AS VARCHAR)"
    if salt:
        if "'" in salt:
            raise ValueError(f"salt must not contain single quotes: {salt!r}")
        expr = f"({expr} || '|{salt}')"
    return expr


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from md5 of the key.

    ``conv(hex, 16, 10)`` keeps the arithmetic JVM-side; the 15-char
    prefix guarantees the intermediate fits a signed long before the
    modulo (both engines would overflow on the full 128-bit digest).
    """
    if not 1 <= n_buckets <= (1 << 60):
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    h = F.md5(_salted(key, salt))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_buckets


def hash_bucket_sql(col: str, n_buckets: int = N_BUCKETS, salt: str = "") -> str:
    return (
        f"CAST(CAST(('0x' || substr(md5({_salted_sql(col, salt)}), 1, 15))"
        f" AS UBIGINT) % {n_buckets} AS BIGINT)"
    )


def _cuts(weights: dict[str, float], n_buckets: int) -> list[tuple[str, int]]:
    """(label, exclusive upper bucket bound) per split, validated.

    Bounds are integers computed ONCE in Python, so the runtime
    comparison is integer-vs-integer in both engines — no float
    thresholds that could round differently across them.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}: {weights}")
    out, acc = [], 0.0
    for label, w in weights.items():
        acc += w
        cut = round(acc * n_buckets)
        if cut <= (out[-1][1] if out else 0):
            raise ValueError(
                f"weight {w} for {label!r} quantizes to zero buckets at "
                f"n_buckets={n_buckets}; raise n_buckets"
            )
        out.append((label, cut))
    if len(out) > 1 and out[-2][1] >= n_buckets:
        raise ValueError(
            f"weight {weights[out[-1][0]]} for {out[-1][0]!r} quantizes to "
            f"zero buckets at n_buckets={n_buckets}; raise n_buckets"
        )
    out[-1] = (out[-1][0], n_buckets)  # absorb rounding in the last split
    return out


def split_assign(
    key: Column,
    weights: dict[str, float],
    n_buckets: int = N_BUCKETS,
    salt: str = "split",
) -> Column:
    """Split label ('train'/'val'/...) for the key, by bucket ranges.

    Weight order matters only for which bucket range a label owns;
    assignment is deterministic given (key, weights, n_buckets, salt).
    """
    bucket = hash_bucket(key, n_buckets, salt)
    labels = _cuts(weights, n_buckets)
    # NULL bucket (NULL key) must yield NULL, not the last label
    expr = F.when(bucket.isNull(), F.lit(None).cast("string"))
    for label, cut in labels[:-1]:
        expr = expr.when(bucket < cut, F.lit(label))
    return expr.otherwise(F.lit(labels[-1][0]))


def split_assign_sql(
    col: str,
    weights: dict[str, float],
    n_buckets: int = N_BUCKETS,
    salt: str = "split",
) -> str:
    bucket = hash_bucket_sql(col, n_buckets, salt)
    labels = _cuts(weights, n_buckets)
    whens = " ".join(
        f"WHEN {bucket} < {cut} THEN '{label}'" for label, cut in labels[:-1]
    )
    last = f"WHEN {bucket} IS NOT NULL THEN '{labels[-1][0]}'"
    return f"(CASE {whens} {last} END)"


def stratified_keep(
    key: Column,
    stratum: Column,
    fractions: dict[str, float],
    default: float = 0.0,
    n_buckets: int = N_BUCKETS,
    salt: str = "sample",
) -> Column:
    """TRUE iff the row survives per-stratum deterministic sampling.

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed use ``default``.  Keep = ``bucket < round(frac*n_buckets)``,
    so the kept set is a *prefix* of the bucket space per stratum:
    raising a fraction strictly grows the sample (monotone samples,
    the property needed for reproducible scaling-law subset chains).
    """
    for s, frac in list(fractions.items()) + [("default", default)]:
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {s!r} out of [0,1]: {frac}")
    bucket = hash_bucket(key, n_buckets, salt)
    thr: Column = F.lit(round(default * n_buckets))
    for value, frac in fractions.items():
        thr = F.when(stratum == value, F.lit(round(frac * n_buckets))).otherwise(thr)
    return bucket < thr


def stratified_keep_sql(
    col: str,
    stratum: str,
    fractions: dict[str, float],
    default: float = 0.0,
    n_buckets: int = N_BUCKETS,
    salt: str = "sample",
) -> str:
    bucket = hash_bucket_sql(col, n_buckets, salt)
    whens = " ".join(
        f"WHEN {stratum} = '{value}' THEN {round(frac * n_buckets)}"
        for value, frac in fractions.items()
    )
    thr = f"(CASE {whens} ELSE {round(default * n_buckets)} END)"
    return f"({bucket} < {thr})"
