"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` mirror on DuckDB at the given sf dir, then compares
row count, sorted column names, and exact values (columns sorted by
name, rows sorted) — the same shape as CORRECTNESS_r{N}.json.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, duck_rows, duck_cols):
    cols = sorted(spark_df.columns)
    if cols != sorted(duck_cols):
        return f"SCHEMA mismatch: spark={cols} duck={sorted(duck_cols)}"
    s_idx = [spark_df.columns.index(c) for c in cols]
    d_idx = [list(duck_cols).index(c) for c in cols]
    s_rows = sorted(
        tuple(_norm(r[i]) for i in s_idx) for r in spark_df.collect()
    )
    d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in duck_rows)
    if len(s_rows) != len(d_rows):
        return f"ROWS mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return f"VALUE mismatch at sorted row {i}: spark={a!r} duck={b!r}"
    return f"OK ({len(s_rows)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from scalpel_ts_spark.sources.session import get_spark

    qs, oracles = E.queries(), E.oracle_sql()
    unknown = [q for q in (only or []) if q not in qs]
    if unknown:
        # a misspelled filter must not skip every check and still
        # print ALL OK / exit 0 — that is a green gate that ran
        # nothing (validated BEFORE Spark startup: fail in <1s)
        print(f"unknown queries: {unknown}\navailable: {sorted(qs)}")
        sys.exit(2)

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"{name:24s} ROWS-ONLY ({n} rows) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            rel = con.execute(oracles[name])
            verdict = compare(df, rel.fetchall(), [d[0] for d in rel.description])
        except Exception as exc:  # noqa: BLE001
            verdict = f"ERROR {type(exc).__name__}: {exc}"
        flag = "" if verdict.startswith("OK") else "  <<< FAIL"
        if flag:
            failures += 1
        print(f"{name:24s} {verdict} [{time.time()-t0:.1f}s]{flag}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
