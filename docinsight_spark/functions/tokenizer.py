"""Tokenizers: the engine's analog of DocInsight's text preparation.

The reference masks citations before analysis
(``/root/reference/ingestion/citation_mask.py:47-153``) and tokenizes
with ``\\b\\w+\\b`` for stylometry
(``/root/reference/stylometry/features.py:129-133``).  For a
source-code corpus the analogous preparation is comment / string-literal
stripping followed by identifier-aware tokenization (camelCase +
snake_case splitting).  Both run as **vectorized pandas UDFs** over
Arrow batches — no per-row Python in the Spark plan.

Two tokenizers are exposed:

* :func:`simple_tokens_col` — pure Catalyst column expression
  (whitespace split, lowercase).  SQL-expressible, used wherever a
  DuckDB oracle must reproduce tokenization exactly.
* :func:`code_tokens_udf` — the code-aware pandas UDF (the engine's
  production tokenizer).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# SQL-expressible simple tokenizer (oracle-parity path)
# ---------------------------------------------------------------------------


def simple_tokens_col(col: Column | str) -> Column:
    """``array<string>`` of lowercase whitespace-delimited tokens.

    Exactly reproducible in ANSI SQL / DuckDB as
    ``string_split_regex(lower(text), '\\s+')`` with empties removed —
    used for every driver-contract oracle comparison.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))


# ---------------------------------------------------------------------------
# Code-aware tokenizer (production path, vectorized pandas UDF)
# ---------------------------------------------------------------------------

# One alternation per language family: string literals and comments are
# consumed left-to-right in a single pass, so comment markers inside
# strings (and vice versa) do not double-strip.  Mirrors the *intent* of
# the reference's right-to-left citation masking
# (citation_mask.py:77-112): remove non-authorial surface text before
# analysis.
_C_FAMILY_MASK = re.compile(
    r'"(?:\\.|[^"\\\n])*"'      # double-quoted string
    r"|'(?:\\.|[^'\\\n])*'"     # char / single-quoted literal
    r"|/\*.*?\*/"               # block comment
    r"|//[^\n]*",               # line comment
    re.DOTALL,
)
_PY_MASK = re.compile(
    r'""".*?"""'
    r"|'''.*?'''"
    r'|"(?:\\.|[^"\\\n])*"'
    r"|'(?:\\.|[^'\\\n])*'"
    r"|#[^\n]*",
    re.DOTALL,
)
_MASKS = {
    "python": _PY_MASK,
    "py": _PY_MASK,
    "go": _C_FAMILY_MASK,
    "java": _C_FAMILY_MASK,
    "cpp": _C_FAMILY_MASK,
    "c": _C_FAMILY_MASK,
    "js": _C_FAMILY_MASK,
}

# camelCase boundaries: lower|digit→Upper, and ACRONYMWord → ACRONYM Word
_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_NON_WORD = re.compile(r"[^A-Za-z0-9]+")


def tokenize_code_pandas(content: pd.Series, lang: pd.Series | None = None) -> pd.Series:
    """Vectorized code tokenization over a pandas batch.

    Steps: (1) strip comments + string literals per ``lang``;
    (2) split snake_case / camelCase identifiers; (3) lowercase;
    (4) emit word tokens.  Returns a Series of ``list[str]``.
    """
    content = content.fillna("")
    if lang is None:
        masked = content.str.replace(_C_FAMILY_MASK, " ", regex=True)
    else:
        masked = content.copy()
        lang_norm = lang.fillna("").str.lower()
        for lg, pat in _MASKS.items():
            sel = lang_norm == lg
            if sel.any():
                masked[sel] = content[sel].str.replace(pat, " ", regex=True)
        other = ~lang_norm.isin(_MASKS)
        if other.any():
            masked[other] = content[other].str.replace(
                _C_FAMILY_MASK, " ", regex=True
            )
    s = masked.str.replace(_CAMEL_2, r"\1 \2", regex=True)
    s = s.str.replace(_CAMEL_1, r"\1 \2", regex=True)
    s = s.str.replace(_NON_WORD, " ", regex=True).str.lower()
    # findall of non-space runs ≡ split-on-ws minus empties, in one
    # vectorized pass (no per-row Python filter)
    return s.str.findall(r"\S+")


@F.pandas_udf(T.ArrayType(T.StringType()))
def code_tokens_udf(content: pd.Series, lang: pd.Series) -> pd.Series:
    """pandas UDF wrapper: ``code_tokens_udf(content, lang) -> array<string>``."""
    return tokenize_code_pandas(content, lang)


# ---------------------------------------------------------------------------
# Mask analysis (SURVEY P4 + A12): what got stripped, per kind
# ---------------------------------------------------------------------------

_KIND_PATTERNS = {
    "line_comment": re.compile(r"//[^\n]*|#[^\n]*"),
    "block_comment": re.compile(r"/\*.*?\*/|\"\"\".*?\"\"\"|'''.*?'''", re.DOTALL),
    "string_literal": re.compile(r'"(?:\\.|[^"\\\n])*"' + r"|'(?:\\.|[^'\\\n])*'"),
}


def mask_summary_pandas(content: pd.Series) -> pd.DataFrame:
    """Per-row counts of masked constructs — the analog of the
    reference's citation summary (``ingestion/citation_mask.py:138-153``,
    per-pattern-type counts). Vectorized ``str.count`` per kind."""
    out = {}
    for kind, pat in _KIND_PATTERNS.items():
        out[f"n_{kind}"] = content.fillna("").str.count(pat)
    return pd.DataFrame(out)
