"""Scoring-operator semantics vs an imperative oracle mirroring the
reference algorithms (scoring/core.py, enhanced_pipeline.py:607-647)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docinsight_spark.operators.scoring import (
    classify_risk,
    cluster_risk_spans,
    fuse_scores,
    minmax_normalize,
    originality_scores,
    repeated_match_decay,
    top_risk_spans,
)

SENT_SCHEMA = (
    "doc_id long, idx long, semantic_score double, rerank_raw double, "
    "best_match string, tokens long"
)


@pytest.fixture(scope="module")
def sent(spark):
    rows = []
    # doc 1: riser — a HIGH run, a gap, a MEDIUM run
    vals = [0.9, 0.95, 0.92, 0.2, 0.6, 0.62, 0.1, 0.88, 0.3, 0.3]
    for i, v in enumerate(vals):
        rows.append((1, i, v, (i % 4) / 4.0, f"m{i % 3}", 10 + i))
    # doc 2: all identical scores (min-max degenerate → all norms 0)
    for i in range(5):
        rows.append((2, i, 0.8, 0.5, "mm", 7))
    # doc 3: repeated best_match to trigger decay
    for i in range(6):
        rows.append((3, i, 0.95 - i * 0.01, 0.9, "same_match", 9))
    return spark.createDataFrame(rows, SENT_SCHEMA).cache()


def pipeline(sent):
    df = minmax_normalize(sent, "semantic_score", ["doc_id"], "semantic_norm")
    df = minmax_normalize(df, "rerank_raw", ["doc_id"], "rerank_norm")
    df = df.withColumn("stylometry_score", F.lit(0.5))
    df = fuse_scores(df, alpha=0.6, beta=0.3, gamma=0.1)
    df = classify_risk(df)
    return df.withColumn("confidence_score", F.col("fused_score"))


def test_minmax_degenerate_group_is_zero(sent):
    out = pipeline(sent).filter(F.col("doc_id") == 2).toPandas()
    assert (out["semantic_norm"] == 0.0).all()


def test_gating_reference_semantics(sent):
    out = pipeline(sent).toPandas()
    for _, r in out.iterrows():
        if r["semantic_score"] < 0.35:
            want = "LOW"
        elif r["fused_score"] >= 0.7 and r["semantic_norm"] >= 0.60:
            want = "HIGH"
        elif r["fused_score"] >= 0.4 and r["semantic_norm"] >= 0.40:
            want = "MEDIUM"
        else:
            want = "LOW"
        assert r["risk_level"] == want, dict(r)


def test_decay_reference_semantics(sent):
    out = repeated_match_decay(pipeline(sent)).filter(F.col("doc_id") == 3).toPandas()
    out = out.sort_values("idx")
    # occurrences 1..6 of "same_match"; first 2 unpenalized
    assert out["occurrence"].tolist() == [1, 2, 3, 4, 5, 6]
    assert (out["decay_multiplier"].values[:2] == 1.0).all()
    assert abs(out["decay_multiplier"].values[2] - 0.85) < 1e-12
    assert abs(out["decay_multiplier"].values[5] - 0.85**4) < 1e-12


def span_oracle(pdf: pd.DataFrame) -> list[dict]:
    """Imperative re-statement of SpanClusterer.cluster_risk_spans."""
    spans, cur = [], None
    for _, r in pdf.sort_values("idx").iterrows():
        if r["risk_level"] in ("HIGH", "MEDIUM"):
            if cur is None or cur["risk"] != r["risk_level"] or r["idx"] - cur["end"] > 1:
                if cur:
                    spans.append(cur)
                cur = {
                    "start": r["idx"], "end": r["idx"], "risk": r["risk_level"],
                    "scores": [r["confidence_score"]], "tokens": r["tokens"],
                    "sem0": r["semantic_norm"],
                }
            else:
                cur["end"] = r["idx"]
                cur["scores"].append(r["confidence_score"])
                cur["tokens"] += r["tokens"]
        else:
            if cur:
                spans.append(cur)
            cur = None
    if cur:
        spans.append(cur)
    # weak single-sentence suppression
    return [
        s for s in spans
        if not (s["start"] == s["end"] and s["sem0"] < 0.55)
    ]


def test_span_clustering_matches_oracle(sent):
    scored = pipeline(sent)
    got = cluster_risk_spans(scored).toPandas()
    for doc in [1, 2, 3]:
        pdf = scored.filter(F.col("doc_id") == doc).toPandas()
        want = span_oracle(pdf)
        g = got[got["doc_id"] == doc].sort_values("start_index")
        assert len(g) == len(want), (doc, want, g)
        for (_, gr), wr in zip(g.iterrows(), sorted(want, key=lambda s: s["start"])):
            assert gr["start_index"] == wr["start"] and gr["end_index"] == wr["end"]
            assert gr["risk_level"] == wr["risk"]
            assert abs(gr["avg_score"] - sum(wr["scores"]) / len(wr["scores"])) < 1e-9
            assert gr["token_count"] == wr["tokens"]


def test_originality_bounds_and_empty_spans(spark, sent):
    scored = pipeline(sent)
    spans = cluster_risk_spans(scored)
    out = originality_scores(scored, spans).toPandas().set_index("doc_id")
    assert ((out["originality_score"] >= 0) & (out["originality_score"] <= 1)).all()
    # doc with no risky sentences → originality 1.0
    clean = spark.createDataFrame(
        [(9, 0, 0.1, 0.0, "x", 5)], SENT_SCHEMA
    )
    sc = pipeline(clean)
    o = originality_scores(sc, cluster_risk_spans(sc)).toPandas()
    assert o["originality_score"].iloc[0] == 1.0
    assert o["n_low"].iloc[0] == 1


def test_top_risk_spans_limit(sent):
    scored = pipeline(sent)
    spans = cluster_risk_spans(scored)
    top = top_risk_spans(spans, n=1).toPandas()
    assert top.groupby("doc_id").size().le(1).all()
