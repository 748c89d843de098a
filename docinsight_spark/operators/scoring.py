"""DocInsight report semantics as DataFrame operators.

Re-expresses the reference's sentence→document scoring pipeline
(``/root/reference/scoring/core.py``, ``enhanced_pipeline.py:607-647``)
as pure Catalyst column expressions + window functions — no Python in
the plan.  Constants mirror ``/root/reference/config.py``:

* fusion weights: semantic 0.6 / cross-encoder 0.3 / stylometry 0.25
  family defaults (parameterized here)
* gating: HIGH ≥ 0.7 ∧ sem_norm ≥ 0.60; MEDIUM ≥ 0.4 ∧ sem_norm ≥ 0.40;
  raw-semantic floor 0.35 (config.py:65-73)
* repeated-match decay: allowance 2, factor 0.85 (config.py:160-161)
* originality weights: α=0.55 coverage, β=0.30 severity, γ=0.15 span
  ratio (config.py:171-176)

In the new engine, "semantic score" = normalized BM25 and "rerank
score" = exact rescoring — the fusion/gating algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HIGH_RISK_THRESHOLD = 0.7
MEDIUM_RISK_THRESHOLD = 0.4
SEMANTIC_HIGH_FLOOR = 0.60
SEMANTIC_MEDIUM_FLOOR = 0.40
SEMANTIC_MIN_MATCH = 0.35
REUSE_DECAY_ALLOWANCE = 2
REUSE_DECAY_FACTOR = 0.85
AGG_ALPHA, AGG_BETA, AGG_GAMMA = 0.55, 0.30, 0.15
EPS = 1e-6


# -- W4: per-group min-max normalization (scoring/core.py:42-58) ------------

def minmax_normalize(
    df: DataFrame, value_col: str, group_cols: list[str], out_col: str | None = None
) -> DataFrame:
    """(v - min) / (max - min) within the group; all-equal group → 0.0
    (the reference zeroes the family when the spread is < 1e-6)."""
    out_col = out_col or f"{value_col}_norm"
    w = Window.partitionBy(*group_cols)
    mn, mx = F.min(value_col).over(w), F.max(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(mx - mn > EPS, (F.col(value_col) - mn) / (mx - mn)).otherwise(F.lit(0.0)),
    )


# -- A10-ish fusion (scoring/core.py:60-93) ----------------------------------

def fuse_scores(
    df: DataFrame,
    sem_norm: str = "semantic_norm",
    rerank_norm: str = "rerank_norm",
    styl_score: str = "stylometry_score",
    alpha: float = 0.6,
    beta: float = 0.3,
    gamma: float = 0.1,
) -> DataFrame:
    return df.withColumn(
        "fused_score",
        F.lit(alpha) * F.col(sem_norm)
        + F.lit(beta) * F.col(rerank_norm)
        + F.lit(gamma) * F.col(styl_score),
    )


# -- risk gating (scoring/core.py:95-133) ------------------------------------

def _gate(fused: Column, sem_norm: Column, sem_raw: Column) -> Column:
    return (
        F.when(sem_raw < SEMANTIC_MIN_MATCH, F.lit("LOW"))
        .when(
            (fused >= HIGH_RISK_THRESHOLD) & (sem_norm >= SEMANTIC_HIGH_FLOOR),
            F.lit("HIGH"),
        )
        .when(
            (fused >= MEDIUM_RISK_THRESHOLD) & (sem_norm >= SEMANTIC_MEDIUM_FLOOR),
            F.lit("MEDIUM"),
        )
        .otherwise(F.lit("LOW"))
    )


def classify_risk(
    df: DataFrame,
    fused: str = "fused_score",
    sem_norm: str = "semantic_norm",
    sem_raw: str = "semantic_score",
) -> DataFrame:
    """Adds ``risk_level`` and ``match_strength`` (labels per config.py:187)."""
    sn = F.col(sem_norm)
    strength = (
        F.when(sn >= 0.75, "STRONG")
        .when(sn >= 0.55, "MODERATE")
        .when(sn >= 0.40, "WEAK")
        .otherwise("VERY_WEAK")
    )
    return df.withColumn(
        "risk_level", _gate(F.col(fused), sn, F.col(sem_raw))
    ).withColumn("match_strength", strength)


# -- W3: repeated-match decay (enhanced_pipeline.py:607-647) ------------------

def repeated_match_decay(
    df: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "idx",
    match_col: str = "best_match",
    allowance: int = REUSE_DECAY_ALLOWANCE,
    decay: float = REUSE_DECAY_FACTOR,
) -> DataFrame:
    """Dampen confidence/fused score after a corpus match is reused more
    than ``allowance`` times in document order, then re-gate risk downward
    (a HIGH/MEDIUM may only stay if it still clears its thresholds)."""
    w = Window.partitionBy(doc_col, match_col).orderBy(idx_col)
    occ = F.when(
        F.col(match_col).isNull() | (F.col(match_col) == ""), F.lit(0)
    ).otherwise(F.row_number().over(w))
    df = df.withColumn("occurrence", occ)
    mult = F.pow(F.lit(decay), F.greatest(F.col("occurrence") - allowance, F.lit(0)))
    df = (
        df.withColumn("decay_multiplier", mult)
        .withColumn(
            "confidence_score",
            F.greatest(F.col("confidence_score") * mult, F.lit(0.0)),
        )
        .withColumn("fused_score", F.greatest(F.col("fused_score") * mult, F.lit(0.0)))
    )
    fused, sn = F.col("fused_score"), F.col("semantic_norm")
    downgraded = (
        F.when(
            (F.col("risk_level") == "HIGH")
            & ~((fused >= HIGH_RISK_THRESHOLD) & (sn >= SEMANTIC_HIGH_FLOOR)),
            F.when(
                (fused >= MEDIUM_RISK_THRESHOLD) & (sn >= SEMANTIC_MEDIUM_FLOOR),
                F.lit("MEDIUM"),
            ).otherwise(F.lit("LOW")),
        )
        .when(
            (F.col("risk_level") == "MEDIUM")
            & ~((fused >= MEDIUM_RISK_THRESHOLD) & (sn >= SEMANTIC_MEDIUM_FLOOR)),
            F.lit("LOW"),
        )
        .otherwise(F.col("risk_level"))
    )
    return df.withColumn("risk_level", downgraded)


# -- W1/W2/D3: span sessionization (scoring/core.py:139-170, 242-268) --------

def cluster_risk_spans(
    df: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "idx",
    risk_col: str = "risk_level",
    score_col: str = "confidence_score",
    tokens_col: str = "tokens",
    sem_norm_col: str = "semantic_norm",
    filter_weak_singles: bool = True,
) -> DataFrame:
    """Consecutive same-risk HIGH/MEDIUM sentences (gap ≤ 1) → spans.

    Classic sessionization: change-flag = risk differs from previous risky
    sentence OR index gap > 1; span_id = running sum of flags; then one
    groupBy per span.  Weak single-sentence spans (sem_norm < 0.55) are
    suppressed, mirroring the reference's noise filter."""
    risky = df.filter(F.col(risk_col).isin("HIGH", "MEDIUM"))
    w = Window.partitionBy(doc_col).orderBy(idx_col)
    flag = (
        F.when(F.lag(risk_col).over(w).isNull(), F.lit(1))
        .when(F.lag(risk_col).over(w) != F.col(risk_col), F.lit(1))
        .when(F.col(idx_col) - F.lag(idx_col).over(w) > 1, F.lit(1))
        .otherwise(F.lit(0))
    )
    spans = (
        risky.withColumn("_new_span", flag)
        .withColumn(
            "span_id",
            F.sum("_new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(doc_col, "span_id", risk_col)
        .agg(
            F.min(idx_col).alias("start_index"),
            F.max(idx_col).alias("end_index"),
            F.avg(score_col).alias("avg_score"),
            F.sum(tokens_col).alias("token_count"),
            F.count(F.lit(1)).alias("n_sentences"),
            F.min_by(sem_norm_col, idx_col).alias("first_sem_norm"),
        )
        .dropDuplicates([doc_col, "start_index", "end_index", risk_col])
    )
    if filter_weak_singles:
        spans = spans.filter(
            ~(
                (F.col("start_index") == F.col("end_index"))
                & (F.col("first_sem_norm") < 0.55)
            )
        )
    return spans.select(
        doc_col, "span_id", F.col(risk_col).alias("risk_level"),
        "start_index", "end_index", "avg_score", "token_count", "n_sentences",
    )


# -- A9: originality aggregation (scoring/core.py:181-224) --------------------

def originality_scores(
    sentences: DataFrame,
    spans: DataFrame,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-document originality roll-up:

    coverage = plagiarized tokens / total tokens;
    severity = token-weighted mean of span avg_score;
    span_ratio = spans / total sentences;
    originality = max(0, 1 − (0.55·cov + 0.30·sev + 0.15·ratio)).
    """
    sent_agg = sentences.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("total_sentences"),
        F.sum(tokens_col).alias("total_tokens"),
        F.sum(F.when(F.col("risk_level") == "HIGH", 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(F.col("risk_level") == "MEDIUM", 1).otherwise(0)).alias("n_medium"),
        F.sum(F.when(F.col("risk_level") == "LOW", 1).otherwise(0)).alias("n_low"),
    )
    span_agg = spans.groupBy(doc_col).agg(
        F.sum("token_count").alias("plag_tokens"),
        (F.sum(F.col("avg_score") * F.col("token_count")) / F.sum("token_count")).alias(
            "severity_index"
        ),
        F.count(F.lit(1)).alias("n_spans"),
    )
    joined = sent_agg.join(span_agg, doc_col, "left").fillna(
        {"plag_tokens": 0, "severity_index": 0.0, "n_spans": 0}
    )
    cov = F.col("plag_tokens") / F.col("total_tokens")
    ratio = F.col("n_spans") / F.col("total_sentences")
    factor = (
        F.lit(AGG_ALPHA) * cov
        + F.lit(AGG_BETA) * F.col("severity_index")
        + F.lit(AGG_GAMMA) * ratio
    )
    return joined.select(
        doc_col,
        "total_sentences",
        "total_tokens",
        cov.alias("plagiarized_coverage"),
        F.col("severity_index"),
        ratio.alias("risk_span_ratio"),
        F.greatest(F.lit(1.0) - factor, F.lit(0.0)).alias("originality_score"),
        "n_high", "n_medium", "n_low",
    )


# -- T5: top-N risk spans (scoring/core.py:226-234) ---------------------------

def top_risk_spans(spans: DataFrame, doc_col: str = "doc_id", n: int = 3) -> DataFrame:
    w = Window.partitionBy(doc_col).orderBy(
        F.col("avg_score").desc(), F.col("start_index")
    )
    return (
        spans.withColumn("span_rank", F.row_number().over(w))
        .filter(F.col("span_rank") <= n)
    )


# -- A7: semantic risk roll-up (scoring/aggregate.py:113-147) -----------------

def semantic_risk_rollup(
    sentences: DataFrame, doc_col: str = "doc_id",
    score_col: str = "semantic_score", risk_col: str = "risk_level",
) -> DataFrame:
    """avg similarity ×0.5 + HIGH ratio ×0.3 + MEDIUM ratio ×0.2."""
    return sentences.groupBy(doc_col).agg(
        (
            F.avg(score_col) * 0.5
            + F.avg(F.when(F.col(risk_col) == "HIGH", 1.0).otherwise(0.0)) * 0.3
            + F.avg(F.when(F.col(risk_col) == "MEDIUM", 1.0).otherwise(0.0)) * 0.2
        ).alias("semantic_risk"),
        F.avg(score_col).alias("avg_similarity"),
        F.avg(F.when(F.col(risk_col) == "HIGH", 1.0).otherwise(0.0)).alias("high_ratio"),
        F.avg(F.when(F.col(risk_col) == "MEDIUM", 1.0).otherwise(0.0)).alias("medium_ratio"),
    )


# -- A8: stylometric deviation roll-up (scoring/aggregate.py:149-183) ---------

def stylometric_deviation_rollup(
    profile: DataFrame, baseline: DataFrame, feature_cols: list[str],
    key: str = "doc_id",
) -> DataFrame:
    """Per-feature |Δ|/baseline capped at 2, averaged, sigmoid-squashed."""
    b = baseline.select(
        F.col(key).alias(key), *[F.col(c).alias(f"_b_{c}") for c in feature_cols]
    )
    joined = profile.join(b, key)
    deltas = [
        F.least(
            F.abs(F.col(c) - F.col(f"_b_{c}"))
            / F.greatest(F.abs(F.col(f"_b_{c}")), F.lit(1e-9)),
            F.lit(2.0),
        )
        for c in feature_cols
    ]
    raw = sum(deltas[1:], deltas[0]) / F.lit(float(len(feature_cols)))
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-(raw - F.lit(0.5)) * F.lit(4.0)))
    return joined.select(key, raw.alias("raw_deviation"), sig.alias("stylometric_deviation"))


# -- A11: confidence estimate (scoring/aggregate.py:306-332) ------------------

def confidence_estimate(
    sentences: DataFrame, doc_col: str = "doc_id", cap_at: int = 20,
) -> DataFrame:
    """Volume-based analysis confidence: mean of per-doc capped counts —
    more analyzed sentences → more confidence, capped at ``cap_at``."""
    return sentences.groupBy(doc_col).agg(
        F.round(
            F.least(F.count(F.lit(1)) / F.lit(float(cap_at)), F.lit(1.0)), 4
        ).alias("analysis_confidence")
    )
