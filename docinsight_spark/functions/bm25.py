"""Okapi BM25 as pure Catalyst column expressions.

The reference scores with normalized inner products over dense
embeddings (``/root/reference/index/faiss_index.py:162-199``); the new
engine's ranking function is Okapi BM25 with k1=1.2, b=0.75 (per the
build spec).  Expressed as column arithmetic it stays inside
whole-stage codegen — no UDF in the scoring hot path.

    idf(t)        = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(t, d)   = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from docinsight_spark import BM25_B, BM25_K1


def bm25_idf_col(df_col: Column, n_docs: Column | int) -> Column:
    """BM25+ style idf: ``ln((N - df + 0.5) / (df + 0.5) + 1)`` — always > 0."""
    n = F.lit(n_docs) if isinstance(n_docs, (int, float)) else n_docs
    return F.log((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def bm25_score_col(
    tf_col: Column,
    df_col: Column,
    dl_col: Column,
    n_docs: Column | int,
    avgdl: Column | float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Per-(term, doc) BM25 contribution; sum over query terms = score."""
    avg = F.lit(avgdl) if isinstance(avgdl, (int, float)) else avgdl
    idf = bm25_idf_col(df_col, n_docs)
    tf = tf_col.cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col.cast("double") / avg)
    return idf * tf * F.lit(k1 + 1.0) / denom
