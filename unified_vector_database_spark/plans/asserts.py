"""Physical-plan assertions for tests (SURVEY §5d): the cheap way to
keep scale properties (pushdown, broadcast, no stray cartesian) from
regressing while iterating on operators.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    text = plan_text(df)
    assert "PushedFilters" in text, f"no pushed filters in plan:\n{text}"
    assert fragment in text, (
        f"expected pushed filter {fragment!r} in plan:\n{text}")


def assert_broadcast_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert ("BroadcastHashJoin" in text
            or "BroadcastNestedLoopJoin" in text), (
        f"expected a broadcast join in plan:\n{text}")


def assert_no_shuffle(df: DataFrame) -> None:
    text = plan_text(df)
    assert "Exchange hashpartitioning" not in text, (
        f"unexpected shuffle in plan:\n{text}")


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k compiled to TakeOrderedAndProject (per-partition heap),
    not a global Sort."""
    text = plan_text(df)
    assert "TakeOrderedAndProject" in text, (
        f"expected TakeOrderedAndProject in plan:\n{text}")


def assert_partition_pruned(df: DataFrame, fragment: str) -> None:
    """Hive-partition pruning reached the file listing: the scan node
    carries a PartitionFilters entry mentioning `fragment`."""
    text = plan_text(df)
    lines = [ln for ln in text.splitlines() if "PartitionFilters" in ln]
    assert lines, f"no PartitionFilters in plan:\n{text}"
    assert any(fragment in ln for ln in lines), (
        f"expected partition filter {fragment!r} in {lines}")


def assert_column_pruned(df: DataFrame, absent_column: str) -> None:
    text = plan_text(df)
    scan = [ln for ln in text.splitlines() if "ReadSchema" in ln]
    assert scan, f"no ReadSchema in plan:\n{text}"
    for ln in scan:
        assert absent_column not in ln, (
            f"column {absent_column!r} not pruned from scan: {ln}")
