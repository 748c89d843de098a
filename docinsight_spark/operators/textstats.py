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
# reference uses langdetect on the first 1000 chars).  Order matters:
# the argmax fold starts at the FIRST entry and later languages win
# only on strictly greater ratio — keep "en" first (the deterministic
# tie-break for marker-free text), and keep the contract oracle's fold
# in lockstep (contract._language_id_sql generates its CASE chain from
# THIS dict).  Widened to 12 languages in round 5; markers may overlap
# across related languages (la/que/des across Romance) — the argmax
# resolves ownership.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
    "pt": ["não", "uma", "os", "como", "mas", "isso", "ele", "sua", "pelo", "até"],
    "it": ["il", "di", "che", "non", "per", "sono", "della", "anche", "più", "questo"],
    "nl": ["het", "een", "van", "dat", "niet", "met", "voor", "ook", "maar", "zijn"],
    "sv": ["och", "att", "det", "som", "på", "är", "för", "av", "inte", "han"],
    "pl": ["się", "jest", "że", "nie", "do", "czy", "ale", "jak", "po", "tak"],
    "ru": ["и", "в", "не", "на", "что", "как", "это", "по", "но", "она"],
    "tr": ["bir", "ve", "bu", "için", "ile", "olarak", "daha", "çok", "gibi", "ama"],
    "id": ["yang", "dan", "di", "ini", "untuk", "dengan", "tidak", "dari", "pada", "adalah"],
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


# Calibrated on the labeled noise corpus (corpus.make_quality_labeled:
# token-shuffled / truncated / boilerplate-repeated vs clean files) by
# operators.textstats.calibrate_quality_bands — best-F1 bands recorded
# in COVERAGE.md; the reference calibrates its thresholds the same way
# against labeled pairs (/root/reference/fine_tuner.py:580-643).
DEFAULT_LENGTH_BAND = (10, 100_000)   # whitespace tokens
DEFAULT_WL_BAND = (2.0, 12.0)         # mean word length (chars)
DEFAULT_LINE_BAND = (6.0, 150.0)      # mean line length (chars)
# flag as noise below this composite score (calibrated F1 = 0.9975,
# precision 1.0 / recall 0.995 on the 200+200 labeled set)
DEFAULT_QUALITY_THRESHOLD = 0.7


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    length_band: tuple[float, float] = DEFAULT_LENGTH_BAND,
    wl_band: tuple[float, float] = DEFAULT_WL_BAND,
    line_band: tuple[float, float] = DEFAULT_LINE_BAND,
) -> DataFrame:
    """Composite [0,1] quality signal: length band, mean word length
    band, mean LINE length band, stopword presence, alpha ratio,
    repetition (distinct/total tokens).

    Mirrors the shape of C4/Gopher-style heuristic filters; each factor
    is a bounded column expression.  The line-length band is the
    order-sensitive factor (Gopher filters on mean line length): token-
    shuffled or minified noise collapses to one enormous line that no
    bag-of-words factor can see."""
    toks = simple_tokens_col(text_col)
    n = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n, F.lit(1))
    # stopword presence in ANY supported language: natural text scores
    # on its own language's closed-class words — an English-only marker
    # set silently docks every non-English clean doc the full stopword
    # weight (round-4 VERDICT).  greatest() keeps the factor a pure
    # column expression and is order-independent.
    stop_ratio = F.greatest(
        *[_ratio(toks, ws) for ws in LANG_MARKERS.values()]
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z ]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    # mean line length = chars excluding newlines / line count — integer
    # inputs, so the double ratio replays bit-identically in ANSI SQL
    chars_nonl = F.length(F.regexp_replace(F.col(text_col), "\n", ""))
    n_lines = F.length(F.col(text_col)) - chars_nonl + 1
    mean_line = chars_nonl / F.greatest(n_lines, F.lit(1))
    length_ok = F.when(
        (n >= length_band[0]) & (n <= length_band[1]), 1.0
    ).otherwise(0.0)
    wl_ok = F.when(
        (mean_wl >= wl_band[0]) & (mean_wl <= wl_band[1]), 1.0
    ).otherwise(0.0)
    line_ok = F.when(
        (mean_line >= line_band[0]) & (mean_line <= line_band[1]), 1.0
    ).otherwise(0.0)
    score = (
        0.2 * length_ok
        + 0.15 * wl_ok
        + 0.2 * line_ok
        + 0.15 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * distinct_ratio
        + 0.1 * alpha_ratio
    )
    # +1e-9 before rounding: ratio sums can land EXACTLY on a x.00005
    # boundary where round() semantics differ across engines (Spark
    # half-up vs DuckDB half-even); the nudge shifts the halfway case
    # strictly above .5 on BOTH sides and is invisible elsewhere
    return df.withColumn("quality_score", F.round(score + 1e-9, 4))


def calibrate_quality_bands(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "noisy",
    length_bands: tuple = ((5, 100_000), (10, 100_000), (20, 100_000)),
    wl_bands: tuple = ((2.0, 12.0), (2.5, 10.0), (3.0, 9.0)),
    line_bands: tuple = ((6.0, 150.0), (8.0, 120.0), (10.0, 100.0)),
) -> dict:
    """Grid-sweep the band parameters and the decision threshold; pick
    the combination with the best F1 for flagging labeled noise
    (``label_col`` = 1) — the engine analog of the reference's
    threshold sweep over labeled pairs (fine_tuner.py:580-643).

    One distributed pass computes the RAW features; the band/threshold
    sweep then runs driver-side on the collected feature matrix — the
    labeled calibration set is inherently small (synthetic or hand-
    labeled), so the sweep is not a scale surface."""
    import numpy as np

    toks = simple_tokens_col(text_col)
    n = F.size(toks)
    chars_nonl = F.length(F.regexp_replace(F.col(text_col), "\n", ""))
    n_lines = F.length(F.col(text_col)) - chars_nonl + 1
    feats = df.select(
        F.col(label_col).cast("int").alias("y"),
        n.alias("n_toks"),
        (
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(n, F.lit(1))
        ).alias("mean_wl"),
        _ratio(toks, LANG_MARKERS["en"]).alias("stop_ratio"),
        (F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))).alias(
            "distinct_ratio"
        ),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z ]", ""))
            / F.greatest(F.length(text_col), F.lit(1))
        ).alias("alpha_ratio"),
        (chars_nonl / F.greatest(n_lines, F.lit(1))).alias("mean_line"),
    ).toPandas()
    y = feats["y"].to_numpy()
    stop_term = np.minimum(feats["stop_ratio"].to_numpy() * 5, 1.0)
    best = None
    for lb in length_bands:
        len_ok = (
            (feats["n_toks"] >= lb[0]) & (feats["n_toks"] <= lb[1])
        ).to_numpy().astype(float)
        for wb in wl_bands:
            wl_ok = (
                (feats["mean_wl"] >= wb[0]) & (feats["mean_wl"] <= wb[1])
            ).to_numpy().astype(float)
            for lnb in line_bands:
                ln_ok = (
                    (feats["mean_line"] >= lnb[0])
                    & (feats["mean_line"] <= lnb[1])
                ).to_numpy().astype(float)
                score = (
                    0.2 * len_ok
                    + 0.15 * wl_ok
                    + 0.2 * ln_ok
                    + 0.15 * stop_term
                    + 0.2 * feats["distinct_ratio"].to_numpy()
                    + 0.1 * feats["alpha_ratio"].to_numpy()
                )
                for tau in np.arange(0.05, 1.0, 0.05):
                    pred = score < tau  # low quality → flagged noisy
                    tp = int(np.sum(pred & (y == 1)))
                    fp = int(np.sum(pred & (y == 0)))
                    fn = int(np.sum(~pred & (y == 1)))
                    p = tp / (tp + fp) if tp + fp else 0.0
                    r = tp / (tp + fn) if tp + fn else 0.0
                    f1 = 2 * p * r / (p + r) if p + r else 0.0
                    cand = {
                        "length_band": list(lb),
                        "wl_band": list(wb),
                        "line_band": list(lnb),
                        "threshold": round(float(tau), 2),
                        "f1": round(f1, 4),
                        "precision": round(p, 4),
                        "recall": round(r, 4),
                    }
                    if best is None or f1 > best["f1"]:
                        best = cand
    return best


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
