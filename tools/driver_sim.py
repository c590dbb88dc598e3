#!/usr/bin/env python
"""Simulate the correctness driver: vanilla SparkSession + DuckDB
oracle compare at sf0.01.

r3 post-mortem (VERDICT.md "What's wrong" #3): the old repr-based
compare passed two queries the REAL driver failed —
(a) q12: DuckDB `sum(CASE…)` returns HUGEINT, which duckdb's pandas
    conversion widens to float64 while Spark emits int64 → `1085.0`
    vs `1085` hash-diverge;
(b) stateful_topk: an array<double> output column makes
    `pandas.sort_values` throw `unhashable type: 'list'`.
The sim now mimics the driver's canonicalization pipeline: Spark rows
→ `pd.DataFrame`, oracle via duckdb's `.df()` (so HUGEINT→float64
happens exactly as in the driver), columns sorted by name,
`sort_values` over all columns (arrays therefore crash here too),
then a cell-repr compare that is dtype-sensitive for numerics
(int64 1085 != float64 1085.0).

Repo output policy enforced here, not just in prose:
- no DECIMAL columns in a final output (cast to DOUBLE on BOTH sides);
- no ARRAY/LIST columns in a final output (posexplode / stringify);
- integer aggregates in oracle SQL must be CAST(... AS BIGINT) —
  DuckDB sum() over integers is HUGEINT and will not round-trip.

Usage: python tools/driver_sim.py [query ...]   (default: all oracles)
"""

from __future__ import annotations

import datetime
import importlib.util
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("UVDB_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell(v) -> str:
    """Canonical repr of one canonicalized-pandas cell. Numeric dtype
    matters (the q12 class): int-like and float-like of equal value
    repr differently. Timestamps normalize tz-naively (both engines
    emit the same wall instant through pandas)."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return "NULL" if math.isnan(v) else repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        ts = pd.Timestamp(v)
        return "NULL" if ts is pd.NaT else ts.isoformat()
    return repr(v)


def _canon(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """The driver's pipeline: sort columns by name, sort_values over
    every column (raises on unhashable cells, exactly like the
    driver), then dtype-sensitive cell reprs."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [tuple(_cell(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]


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
        hazards = [c for c, t in sdf.dtypes
                   if "decimal" in t or "array" in t or "map" in t
                   or "struct" in t]
        if hazards:
            print(f"{name}: HAZARD OUTPUT COLUMNS {hazards} — "
                  "driver cannot canonicalize; cast/flatten them")
            fails.append(name)
            continue
        spdf = pd.DataFrame(
            [tuple(r) for r in sdf.collect()], columns=sdf.columns)
        dpdf = con.execute(osql[name]).df()
        try:
            sm, dm = _canon(spdf), _canon(dpdf)
        except TypeError as e:
            print(f"{name}: CANONICALIZER ERROR {e!r} — the real "
                  "driver would record ERR for this entry")
            fails.append(name)
            continue
        ok = sorted(spdf.columns) == sorted(dpdf.columns) and sm == dm
        print(f"{name}: rows={len(sm)} {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails.append(name)
            if sorted(spdf.columns) != sorted(dpdf.columns):
                print("   cols spark:", sorted(spdf.columns))
                print("   cols duck :", sorted(dpdf.columns))
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
