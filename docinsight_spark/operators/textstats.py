"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Analog of the reference's language detection + validation gates
(``/root/reference/ingestion/pipeline_ingest.py:63-75``,
``base_loader.py:98-114``) re-expressed as pure column expressions so
they run at corpus scale with no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docinsight_spark.functions.tokenizer import simple_tokens_col

# Closed-class marker words per language (n-gram-heuristic language ID;
# reference uses langdetect on the first 1000 chars).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def _ratio(tokens: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(words)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def language_id(
    df: DataFrame, text_col: str = "text", sample_chars: int = 1000
) -> DataFrame:
    """Adds ``lang_pred`` + ``lang_conf`` — argmax marker-word ratio over
    the first ``sample_chars`` chars (reference samples 1000 chars)."""
    toks = simple_tokens_col(F.substring(F.col(text_col), 1, sample_chars))
    scores = {lg: _ratio(toks, ws) for lg, ws in LANG_MARKERS.items()}
    best = None
    for lg, sc in scores.items():
        cand = F.struct(sc.alias("conf"), F.lit(lg).alias("lang"))
        best = cand if best is None else F.when(sc > best["conf"], cand).otherwise(best)
    return df.withColumn("lang_pred", best["lang"]).withColumn(
        "lang_conf", F.round(best["conf"], 4)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality signal: length band, mean word length band,
    stopword presence, alpha ratio, repetition (distinct/total tokens).

    Mirrors the shape of C4/Gopher-style heuristic filters; each factor
    is a bounded column expression."""
    toks = simple_tokens_col(text_col)
    n = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n, F.lit(1))
    stop_ratio = _ratio(toks, LANG_MARKERS["en"])
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z ]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    length_ok = F.when((n >= 10) & (n <= 100000), 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    score = (
        0.25 * length_ok
        + 0.2 * wl_ok
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * distinct_ratio
        + 0.15 * alpha_ratio
    )
    return df.withColumn("quality_score", F.round(score, 4))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish piece estimate.

    BPE-ish pieces = (# maximal alphanumeric runs) + (# non-alnum,
    non-space chars) — the GPT-2 pre-split shape (word pieces +
    punctuation pieces) expressed without lookarounds so the same
    formula runs in any ANSI regex dialect."""
    ws = F.size(simple_tokens_col(text_col))
    marked = F.regexp_replace(F.col(text_col), r"[A-Za-z0-9]+", "\x01")
    alnum_runs = F.length(marked) - F.length(F.regexp_replace(marked, "\x01", ""))
    punct_chars = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    return df.withColumn("ws_tokens", ws).withColumn(
        "bpeish_tokens", alnum_runs + punct_chars
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, fingerprint) — min-k keyed-hash sketch of the token set,
    folded to one md5.  Two docs share a fingerprint iff their k lowest
    token hashes coincide (winnowing-style content signature; reference
    analog: content_hash, db/schema.sql:20)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(simple_tokens_col(text_col)).alias("term")
    ).distinct()
    hashed = toks.select("id", F.md5("term").alias("th"))
    # bounded min-k: rank inside a sort-based window (spills gracefully),
    # keep k rows, THEN aggregate — never collect_list over the full
    # distinct-token set (unbounded per-group memory on long documents)
    w = Window.partitionBy("id").orderBy("th")
    mink = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    mins = mink.groupBy("id").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("th"))).alias("sketch")
    )
    return mins.select("id", F.md5("sketch").alias("fingerprint"))
