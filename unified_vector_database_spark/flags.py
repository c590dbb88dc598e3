"""Process-local execution flags.

SCHEMA_ONLY: when True, the streaming oracle queries skip the
parquet-rewrite + micro-batch replay and instead thread an empty
BATCH frame (same schema) through the same transformation code, so
plan/schema-only consumers — notably the output-schema policy gate in
tests/test_plans.py — can read `.schema` without executing a
streaming job (ADVICE r4). The transformations themselves
(withWatermark, window/session_window, dropDuplicatesWithinWatermark)
are batch-compatible no-ops, so the schema produced is the real one.
"""

from __future__ import annotations

from contextlib import contextmanager

SCHEMA_ONLY = False


@contextmanager
def schema_only():
    """Temporarily switch streaming queries to schema-only batch mode."""
    global SCHEMA_ONLY
    prev = SCHEMA_ONLY
    SCHEMA_ONLY = True
    try:
        yield
    finally:
        SCHEMA_ONLY = prev
