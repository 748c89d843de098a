"""Stylometric features as groupBy / window aggregates (SURVEY §2.6 A3-A6).

The reference computes document-level stylometric features imperatively
(``/root/reference/stylometry/features.py:28-96``: type-token ratio,
average word length, punctuation density, stopword ratio, n-gram
entropy, sentence-length variance) and compares profiles by average
normalized delta (``features.py:234-273``).  Here each feature is a
single distributed aggregation over the exploded token relation, so the
same code handles 10^12 files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docinsight_spark.functions.tokenizer import simple_tokens_col

# Function-word list (reference: stylometry/features.py FUNCTION_WORDS —
# standard English closed-class words; code corpora reuse it for keyword
# ratio analysis).
FUNCTION_WORDS = [
    "the", "a", "an", "and", "or", "but", "if", "of", "to", "in", "on",
    "for", "with", "at", "by", "from", "as", "is", "was", "are", "be",
    "been", "it", "this", "that", "not", "no", "so", "than", "then",
]


def token_relation(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, term) — ordered exploded whitespace tokens."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(simple_tokens_col(text_col)).alias("pos", "term"),
    )


def stylo_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document feature vector (A4) in one hash aggregation."""
    toks = token_relation(docs, id_col, text_col)
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("token_count"),
        F.countDistinct("term").alias("unique_token_count"),
        F.avg(F.length("term")).alias("avg_word_length"),
        F.sum(F.when(F.col("term").isin(FUNCTION_WORDS), 1).otherwise(0)).alias(
            "function_word_count"
        ),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("char_count"),
        (
            F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"()-]", ""))
            / F.length(text_col)
        ).alias("punctuation_density"),
    )
    return (
        agg.join(base, "doc_id")
        .withColumn(
            "type_token_ratio", F.col("unique_token_count") / F.col("token_count")
        )
        .withColumn(
            "stopword_ratio", F.col("function_word_count") / F.col("token_count")
        )
    )


def ngram_entropy(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, entropy) — Shannon entropy of token n-grams (A3).

    n-grams via ``lead`` windows over the ordered token relation; entropy
    = −Σ p·log2 p over the per-doc n-gram distribution.  Reference:
    ``stylometry/features.py:147-166``."""
    toks = token_relation(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(" ", *[
        F.col("term") if i == 0 else F.lead("term", i).over(w) for i in range(n)
    ])
    grams = (
        toks.withColumn("_last", F.lead("term", n - 1).over(w))
        .withColumn("gram", gram)
        .filter(F.col("_last").isNotNull())
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(tot)
    return (
        counts.withColumn("_plp", -p * F.log2(p))
        .groupBy("doc_id")
        .agg(F.sum("_plp").alias("entropy"))
    )


def compare_profiles(
    a: DataFrame, b: DataFrame, feature_cols: list[str], key: str = "doc_id"
) -> DataFrame:
    """Pairwise profile deviation (A6): mean over features of
    ``min(|Δ| / max(|x|,|y|,ε), 1)``; similarity = 1 − deviation.
    Reference: ``stylometry/features.py:234-273``."""
    ax = a.select(F.col(key).alias("id_a"), *[F.col(c).alias(f"a_{c}") for c in feature_cols])
    bx = b.select(F.col(key).alias("id_b"), *[F.col(c).alias(f"b_{c}") for c in feature_cols])
    pairs = ax.crossJoin(bx)
    deltas = [
        F.least(
            F.abs(F.col(f"a_{c}") - F.col(f"b_{c}"))
            / F.greatest(F.abs(F.col(f"a_{c}")), F.abs(F.col(f"b_{c}")), F.lit(1e-9)),
            F.lit(1.0),
        )
        for c in feature_cols
    ]
    dev = sum(deltas[1:], deltas[0]) / F.lit(float(len(feature_cols)))
    return pairs.select(
        "id_a", "id_b", dev.alias("deviation"), (F.lit(1.0) - dev).alias("similarity")
    )
