#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r09/<q>_<suffix>.txt.

Usage: python /tmp/capture_plan.py <suffix> q1 q2 ...
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from unified_vector_database_spark import registry
from unified_vector_database_spark.session import get_spark

registry.load_all()

OUT = "/root/repo/plans/r09"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    os.environ.setdefault("UVDB_STREAM_REPLAY_FILES", "2")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("uvdb-plan-capture")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name} ({len(buf.getvalue())} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
