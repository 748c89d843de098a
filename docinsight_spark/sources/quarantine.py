"""Row-level error isolation (SURVEY §2.1 S8).

The reference's loaders skip failing documents one at a time and keep
counts (``/root/reference/ingestion/base_loader.py:73-96``).  The Spark
version: a ``mapInPandas`` wrapper that applies a per-row transform,
routes failures to a quarantine relation instead of failing the task,
and carries the error message + a counter — lineage-friendly and safe
for 10^12-row inputs where a one-in-a-billion malformed row must not
kill a stage.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_quarantine(
    df: DataFrame,
    transform: Callable[[pd.Series], object],
    in_col: str,
    out_col: str,
    out_type: str = "string",
) -> DataFrame:
    """Apply ``transform`` per row; failures land in ``_error`` instead of
    aborting.  Returns the input columns + ``out_col`` + ``_error``
    (null on success).  Split downstream with :func:`split_quarantined`.
    """
    cols = df.columns
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + (
        f", `{out_col}` {out_type}, `_error` string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, errs = [], []
            for v in pdf[in_col]:
                try:
                    outs.append(transform(v))
                    errs.append(None)
                except Exception as ex:  # noqa: BLE001 — quarantine anything
                    outs.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
            pdf = pdf.copy()
            pdf[out_col] = outs
            pdf["_error"] = errs
            yield pdf

    return df.mapInPandas(run, schema=schema)


def split_quarantined(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined rows keep the error message."""
    clean = df.filter(F.col("_error").isNull()).drop("_error")
    bad = df.filter(F.col("_error").isNotNull())
    return clean, bad


def quarantine_counters(bad: DataFrame) -> DataFrame:
    """(error_class, n) — the lineage counter the manifest records."""
    return bad.groupBy(
        F.regexp_extract("_error", r"^(\w+):", 1).alias("error_class")
    ).agg(F.count(F.lit(1)).alias("n"))
