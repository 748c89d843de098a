"""Distributed Bloom filter over a docID column.

The incremental-ingest gate (``IndexBuilder.add_run``) must answer "is
this docID already indexed?" against the union of every prior run.
Broadcasting the full key set is an OOM at corpus scale; a plain
anti-join shuffles the new run's *content* (the most expensive bytes in
the job).  The Bloom pre-gate splits the run:

* bloom-negative rows are **definitely new** — they skip the anti-join
  entirely (no shuffle);
* bloom-positive rows (true dups + ``fpp`` false positives) go through
  the precise anti-join, whose shuffled volume is now proportional to
  the overlap, not the run.

The filter is built distributed: per-partition bit arrays OR-reduced in
a two-stage tree (``mapInPandas`` → repartition → ``mapInPandas``), so
the driver only ever receives a handful of partial filters.  Bit count
is capped (default 2^31 ≈ 256 MB); past the cap the false-positive rate
degrades gracefully — more rows take the precise path — instead of the
build failing.

Reference analog: the SHA-256 existence probe
(``/root/reference/ingestion/pipeline_ingest.py:265-269`` /
``_document_exists``) — a per-document SQLite point lookup, here turned
into a constant-space distributed membership sketch.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a strong 64-bit mixer, numpy-vectorized."""
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= _MIX1
    x ^= x >> np.uint64(33)
    x *= _MIX2
    x ^= x >> np.uint64(33)
    return x


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing h1 + i·h2 (Kirsch-
    Mitzenmacher): k independent-enough probes from two mixes."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _mix64(x)
    h2 = _mix64(x + _GOLD) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def bloom_params(n_keys: int, fpp: float = 0.01, max_bits: int = 1 << 31) -> tuple[int, int]:
    """(m_bits, k_hashes) sized for ``n_keys`` at ``fpp``, capped."""
    n = max(n_keys, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(m, 64), max_bits)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def build_bloom(
    keys: DataFrame,
    key_col: str,
    n_keys: int,
    fpp: float = 0.01,
    max_bits: int = 1 << 31,
    reduce_partitions: int = 8,
    max_partials: int = 64,
) -> tuple[bytes, int, int]:
    """Build the filter over ``keys[key_col]`` (long). Returns
    (bit_bytes, m_bits, k_hashes).

    Memory/shuffle discipline for big filters: near the bit cap each
    partial is ~256 MB, so (a) the scan is coalesced (narrow, no
    shuffle) to at most ``max_partials`` tasks — total shuffled bitmap
    bytes ≤ max_partials × n_bytes instead of n_input_partitions ×
    n_bytes; (b) the OR tree reduces to a single partition; and (c) the
    driver consumes the reduced partials via ``toLocalIterator`` — it
    holds the final bitmap plus ONE partial, never
    reduce_partitions × n_bytes at once.

    Caveat on (a): ``coalesce`` merges into the *upstream* stage, so on
    the big path the whole keys-side computation runs at ≤ max_partials
    tasks.  That is free when ``keys`` is a plain parquet/table scan
    (the ``add_run`` gate passes materialized run-docs parquet); if you
    pass an expensive derived frame, materialize it first (write +
    re-read, or ``localCheckpoint``) or repartition upstream so the
    narrow coalesce only caps the bitmap stage, not the real work."""
    m_bits, k = bloom_params(n_keys, fpp, max_bits)
    n_bytes = (m_bits + 7) // 8
    big = n_bytes >= (1 << 24)  # ≥ 16 MB per partial bitmap
    if big:
        keys = keys.select(key_col).coalesce(max_partials)
        reduce_partitions = 1

    def partition_bloom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen_any = False
        for pdf in batches:
            vals = pdf[key_col].to_numpy()
            if len(vals) == 0:
                continue
            seen_any = True
            pos = _positions(vals, m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen_any:
            yield pd.DataFrame({"bloom": [bits.tobytes()]})

    def or_blooms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        for pdf in batches:
            for buf in pdf["bloom"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        if acc is not None:
            yield pd.DataFrame({"bloom": [acc.tobytes()]})

    partials = keys.select(key_col).mapInPandas(partition_bloom, "bloom binary")
    reduced = partials.repartition(reduce_partitions).mapInPandas(
        or_blooms, "bloom binary"
    )
    final = np.zeros(n_bytes, dtype=np.uint8)
    for row in reduced.toLocalIterator():
        final |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return final.tobytes(), m_bits, k


def might_contain(
    spark_context, bloom_bytes: bytes, m_bits: int, k: int
) -> "callable":
    """A pandas-UDF factory: ``col → boolean`` membership probe against a
    broadcast copy of the filter (false → definitely absent)."""
    bc = spark_context.broadcast(bloom_bytes)

    @F.pandas_udf("boolean")
    def probe(vals: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        arr = vals.to_numpy()
        if len(arr) == 0:
            return pd.Series([], dtype=bool)
        pos = _positions(arr, m_bits, k)
        hit = np.ones(len(arr), dtype=bool)
        for i in range(k):
            p = pos[i]
            hit &= (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(hit)

    def apply(col: Column) -> Column:
        return probe(col)

    return apply
