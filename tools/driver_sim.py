#!/usr/bin/env python
"""Simulate the correctness driver (see .claude/skills/verify):
vanilla SparkSession + DuckDB oracle compare at sf0.01.

Usage: python tools/driver_sim.py [query ...]   (default: all oracles)
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("UVDB_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """r1 driver post-mortem: 4 queries passed this float-normalized
    compare locally but FAILED the real driver's hash. The sim is now
    STRICTER than any plausible driver: raw reprs, no Decimal->float
    normalization — a Decimal on one side and a float on the other is
    a mismatch here even when the values are numerically equal.
    Repo policy (enforced by the decimal-column check in main): final
    outputs never carry DECIMAL columns; exact decimal accumulation is
    internal only, cast to DOUBLE in the last select on BOTH engines.
    """
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, osql = mod.queries(), mod.oracle_sql()
    names = sys.argv[1:] or sorted(osql)
    fails = []
    for name in [n for n in names if n in osql]:
        sdf = qs[name](spark, SF)
        dec_cols = [c for c, t in sdf.dtypes if "decimal" in t]
        if dec_cols:
            print(f"{name}: DECIMAL OUTPUT COLUMNS {dec_cols} — "
                  "driver-hash hazard, cast to double")
            fails.append(name)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.execute(osql[name])
        dcols = [c[0] for c in rel.description]
        drows = rel.fetchall()
        oi = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sm = sorted(tuple(repr(norm(r[i])) for i in oi) for r in srows)
        dm = sorted(tuple(repr(norm(r[i])) for i in di) for r in drows)
        ok = sorted(scols) == sorted(dcols) and sm == dm
        print(f"{name}: rows={len(srows)} {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails.append(name)
            for a, b in [(x, y) for x, y in zip(sm, dm) if x != y][:3]:
                print("   spark:", a, "\n   duck :", b)
    # rows-only queries: smoke them too
    for name in sorted(set(qs) - set(osql)):
        if sys.argv[1:] and name not in sys.argv[1:]:
            continue
        n = len(qs[name](spark, SF).collect())
        print(f"{name}: rows={n} (rows-only)")
    print("FAILS:", fails or "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
