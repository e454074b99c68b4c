"""Vector math over ``array<float>`` embedding columns.

Dot/norm/cosine are built-in higher-order functions (``zip_with`` +
``aggregate``) evaluated JVM-side in double precision with
left-to-right summation — the same order DuckDB's ``list_dot_product``
uses on DOUBLE[], so oracle comparisons are bit-stable.

The random-hyperplane signature (for LSH ANN / near-dup buckets) is a
vectorized pandas UDF: one numpy matmul per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from PRE-COMPUTED side norms: ``dot(a,b) / (na * nb)``.

    Bit-identical to :func:`cosine` when ``na``/``nb`` are
    :func:`norm` of the same vectors — the expression tree is the same
    IEEE-754 ops in the same order, only evaluated earlier.  The point
    is O(pairs) vs O(rows) work: a candidate join evaluates cosine once
    per PAIR, and the two norms are 2/3 of its higher-order-function
    lambda volume — attaching them per side before the join computes
    each norm once per row instead of once per pair (candidate volume
    is a multiple of row count for every ANN/near-dup operator here).
    """
    return dot(a, b) / (na * nb)


def cosine_sql(a: str, b: str) -> str:
    """DuckDB mirror of :func:`cosine` (double-precision, same op order)."""
    ad, bd = f"{a}::DOUBLE[]", f"{b}::DOUBLE[]"
    return (
        f"(list_dot_product({ad}, {bd}) / "
        f"(sqrt(list_dot_product({ad}, {ad})) * "
        f"sqrt(list_dot_product({bd}, {bd}))))"
    )


def hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes, shape (n_tables * n_bits, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * n_bits, dim)).astype(np.float64)


def lsh_buckets_udf(planes: np.ndarray, n_tables: int, n_bits: int):
    """embedding -> array of ``n_tables`` bucket ids (sign-bit packed).

    One numpy matmul per Arrow batch; the planes matrix rides in the
    closure (tiny: tables*bits*dim doubles) — effectively a broadcast.

    NULL / wrong-dimension embeddings must not fail the task (one bad
    corpus row would otherwise kill the whole job — the same contract
    the IVF cell-probe UDF keeps): such rows get a NULL bucket array,
    which ``posexplode`` then drops, so they simply generate no
    candidates.  The homogeneous batch (every row valid) keeps the
    single-matmul fast path.
    """
    weights = np.ascontiguousarray(planes.T)  # (dim, tables*bits)
    packer = (1 << np.arange(n_bits, dtype=np.int64))  # bit weights
    dim = weights.shape[0]

    def _pack(mat: np.ndarray) -> list:
        signs = (mat @ weights) > 0  # (rows, tables*bits)
        signs = signs.reshape(len(mat), n_tables, n_bits)
        return list((signs * packer).sum(axis=2).astype(np.int32))

    @F.pandas_udf(ArrayType(IntegerType()))
    def _udf(emb: pd.Series) -> pd.Series:
        vals = emb.to_list()
        if not vals:
            return pd.Series([], dtype=object)
        try:
            mat = np.asarray(vals, dtype=np.float64)  # (rows, dim)
            if mat.ndim == 2 and mat.shape[1] == dim:
                return pd.Series(_pack(mat))
        except (ValueError, TypeError):
            pass  # ragged / non-numeric batch: per-row salvage below
        ok = [
            i
            for i, v in enumerate(vals)
            if v is not None and hasattr(v, "__len__") and len(v) == dim
        ]
        out: list = [None] * len(vals)
        if ok:
            good = np.asarray([vals[i] for i in ok], dtype=np.float64)
            for j, b in zip(ok, _pack(good)):
                out[j] = b
        return pd.Series(out, dtype=object)

    return _udf
