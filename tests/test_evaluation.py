"""Model-quality evaluation (reference: scripts/evaluate_models.py
Spearman/Pearson): WAND fast path vs exact oracle must correlate at
exactly 1.0; a perturbed ranking must not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docinsight_spark.corpus import make_queries
from docinsight_spark.evaluation import (
    oracle_from_index,
    per_query_rank_correlation,
    rank_correlation_summary,
)
from docinsight_spark.index.builder import IndexBuilder
from docinsight_spark.index.wand import wand_search


@pytest.fixture(scope="module")
def eval_idx(spark, tmp_path_factory, tiny_corpus):
    d = str(tmp_path_factory.mktemp("evalidx"))
    IndexBuilder(spark, d, n_buckets=4).build(tiny_corpus)
    return d


def test_wand_vs_oracle_spearman_is_one(spark, eval_idx):
    q = make_queries(spark, corpus_n=200, n_queries=15)
    fast = wand_search(spark, eval_idx, q, k=10)
    oracle = oracle_from_index(spark, eval_idx, q, k=10)
    summary = rank_correlation_summary(per_query_rank_correlation(fast, oracle))
    assert summary["n_queries"] >= 10
    assert summary["mean_spearman"] == pytest.approx(1.0, abs=1e-12)
    assert summary["min_spearman"] == pytest.approx(1.0, abs=1e-12)
    assert summary["mean_pearson"] > 0.999999


def test_perturbed_ranking_detected(spark, eval_idx):
    q = make_queries(spark, corpus_n=200, n_queries=8)
    fast = wand_search(spark, eval_idx, q, k=10)
    # invert the scores → perfect anti-correlation on the common set
    inverted = fast.withColumn("score", -F.col("score"))
    summary = rank_correlation_summary(per_query_rank_correlation(fast, inverted))
    assert summary["mean_spearman"] == pytest.approx(-1.0, abs=1e-12)


def test_partial_overlap_uses_common_subset(spark, eval_idx):
    q = make_queries(spark, corpus_n=200, n_queries=5)
    fast = wand_search(spark, eval_idx, q, k=10)
    trimmed = fast.filter(F.col("rank") <= 5)  # one side cut harder
    per = per_query_rank_correlation(fast, trimmed).toPandas()
    assert (per["n"] <= 5).all()
    assert (per.loc[per["n"] >= 2, "spearman"] == 1.0).all()
