"""Text normalization + corpus gates (SURVEY §2.2 P1-P3, §2.9 D4).

Reference: ``TextNormalizer.normalize``
(``/root/reference/ingestion/pipeline_ingest.py:42-61``) — NFC unicode
normalization, whitespace collapse, blank-line squeeze — plus the
language filter (``:63-75``) and minimum-length gate
(``base_loader.py:98-114``).

The normalized text goes into a *new* column: the raw ``content`` (and
its sha256) must survive untouched — that is the engine's per-row
invariant (SURVEY §1.3).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_LANGUAGES = ["java", "python", "cpp", "go", "en"]
MIN_CONTENT_CHARS = 50  # reference: base_loader.py:98-114


@F.pandas_udf(T.StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(lambda x: unicodedata.normalize("NFC", x))


def normalize_text(df: DataFrame, text_col: str = "content",
                   out_col: str = "norm_content") -> DataFrame:
    """P1: NFC normalize → collapse runs of spaces/tabs → squeeze blank
    lines → strip.  Raw ``text_col`` is preserved."""
    nfc = _nfc_udf(F.col(text_col))
    collapsed = F.regexp_replace(nfc, r"[ \t]+", " ")
    squeezed = F.regexp_replace(collapsed, r"\n\s*\n+", "\n\n")
    return df.withColumn(out_col, F.trim(squeezed))


def language_filter(df: DataFrame, lang_col: str = "lang",
                    allowed: list[str] | None = None) -> DataFrame:
    """P2: keep supported languages (input table carries ``lang``)."""
    return df.filter(F.col(lang_col).isin(allowed or SUPPORTED_LANGUAGES))


def min_length_filter(df: DataFrame, text_col: str = "content",
                      min_chars: int = MIN_CONTENT_CHARS) -> DataFrame:
    """P3: reject content below the minimum character count."""
    return df.filter(F.length(text_col) >= min_chars)


def ordered_dedup_limit(df: DataFrame, key_col: str, order_col: str,
                        limit: int) -> DataFrame:
    """D4: first-seen dedup preserving order, then cap (the reference's
    ``dict.fromkeys`` + slice, ``wiki_loader.py:56-60``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(order_col)
        .limit(limit)
    )
