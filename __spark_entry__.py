"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k query on the sf0.001 tables.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, implemented in :mod:`docinsight_spark.contract`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from docinsight_spark.contract import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k retrieval over sf0.001 documents."""
    return QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
