"""Physical-plan assertions: the scale contract, checked in CI.

A plan that silently stops broadcasting or pushing filters down would
still pass correctness tests but collapse at 100 TB.  These helpers
inspect ``explain``-formatted plans so pytest can pin the physical
strategy: parquet filter pushdown, column pruning, broadcast joins,
whole-stage codegen coverage, partition pruning on ``doc_bucket``.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> str:
    p = plan_text(df)
    assert "PushedFilters" in p, p
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any(fragment in l for l in pushed), (
        f"filter on {fragment!r} not pushed to scan:\n" + "\n".join(pushed)
    )
    return p


def assert_broadcast_join(df: DataFrame) -> str:
    p = plan_text(df)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p
    return p


def assert_column_pruned(df: DataFrame, excluded_col: str, scan_of: str) -> str:
    """The scan of ``scan_of`` must not read ``excluded_col``."""
    p = plan_text(df)
    scans = [
        l for l in p.splitlines() if "ReadSchema" in l and scan_of in p
    ]
    assert scans, p
    offending = [l for l in scans if excluded_col in l and scan_of in l]
    assert not offending, f"{excluded_col} not pruned:\n" + "\n".join(offending)
    return p


def codegen_stage_count(df: DataFrame) -> int:
    p = plan_text(df, mode="simple")
    return p.count("WholeStageCodegen")
