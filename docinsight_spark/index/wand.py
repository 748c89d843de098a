"""Fast BM25 top-k over compressed segments: block-max pruning in
``mapInPandas`` with a bounded top-k selection.

The distributed shape (document-partitioned search, the classic
shard-per-bucket design):

1. Segment scan **pruned to the query's terms** — ``doc_bucket``
   partition dirs narrow the file listing, and the ``term IN (…)``
   predicate prunes parquet row groups because segments are written
   sorted by ``term`` (min/max stats per row group).
2. One task per bucket (repartition of the *matched segment rows only*
   — a few rows per term per bucket, not the corpus).
3. Inside the task, a vectorized MaxScore/block-max kernel scores each
   query against the bucket's matched posting lists:

   * terms are processed in descending upper-bound (max block score)
     order, accumulating exact scores with numpy;
   * once the running top-k threshold θ exceeds the sum of the
     remaining terms' upper bounds, docs outside the accumulator can
     no longer reach the top-k, so remaining lists are pruned to
     blocks whose ``[first_doc, last_doc]`` range intersects the
     accumulated candidate set (block skipping via skip metadata) and,
     within decoded blocks, to already-accumulated docs;
   * a bounded selection (``np.partition``) maintains θ — the heap
     analog, vectorized.

4. Each (bucket, query) emits its local top-k; the global merge is a
   tiny ``B×k``-row window per query.

Rank-identity contract vs the exact oracle
(:mod:`docinsight_spark.operators.query`): same formula, same
tie-break (score desc, docID asc) — the engine's analog of the
reference's FAISS-vs-numpy dual implementation
(``/root/reference/test_faiss_fallback.py:8-20``).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docinsight_spark.index.builder import read_doc_stats_bucket
from docinsight_spark.index.codec import BlockMeta, decode_postings
from docinsight_spark.operators.query import query_terms


def _load_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/_meta.json") as f:
        return json.load(f)


def _kernel_score_bucket(
    bucket: int,
    rows: list[dict],
    queries: dict[int, list[str]],
    index_dir: str,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
) -> list[tuple[int, int, float]]:
    """Score all queries against one bucket's matched posting lists."""
    ds = read_doc_stats_bucket(index_dir, bucket)
    if ds is None:
        return []
    order = np.argsort(ds["docID"], kind="stable")
    ds_docs, ds_dl = ds["docID"][order], ds["dl"][order].astype(np.float64)

    # Decode lazily per term, cache across queries sharing a term.
    term_rows: dict[str, list[dict]] = {}
    for r in rows:
        term_rows.setdefault(r["term"], []).append(r)
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def term_upper(term: str) -> float:
        return max(
            (float(np.max(r["max_score"])) if len(r["max_score"]) else 0.0)
            for r in term_rows[term]
        )

    def decode_term(term: str, doc_filter: np.ndarray | None):
        """(docIDs, scores) for a term; optionally restricted via block
        skipping to docs already in ``doc_filter`` (sorted)."""
        key = term
        if doc_filter is None and key in decoded:
            return decoded[key]
        docs_all, scores_all = [], []
        for r in term_rows[term]:
            meta = BlockMeta(
                first_doc=np.asarray(r["first_doc"], np.int64),
                last_doc=np.asarray(r["last_doc"], np.int64),
                n=np.asarray(r["bn"], np.int32),
                offset=np.asarray(r["offsets"], np.int64),
                doc_bytes=np.asarray(r["doc_bytes"], np.int32),
                max_score=np.asarray(r["max_score"], np.float32),
            )
            blocks = None
            if doc_filter is not None and len(meta.first_doc):
                # block skip: keep blocks whose [first,last] overlaps filter
                lo = np.searchsorted(doc_filter, meta.first_doc, side="left")
                hi = np.searchsorted(doc_filter, meta.last_doc, side="right")
                blocks = np.flatnonzero(hi > lo)
                if len(blocks) == 0:
                    continue
            d, t = decode_postings(r["payload"], meta, blocks)
            if doc_filter is not None:
                keep = (
                    np.searchsorted(doc_filter, d, side="right")
                    - np.searchsorted(doc_filter, d, side="left")
                ) > 0
                d, t = d[keep], t[keep]
            if len(d) == 0:
                continue
            pos = np.searchsorted(ds_docs, d)
            dl = ds_dl[np.clip(pos, 0, max(len(ds_docs) - 1, 0))]
            df = float(r["df"])
            idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tf = t.astype(np.float64)
            sc = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            docs_all.append(d)
            scores_all.append(sc)
        if not docs_all:
            out = (np.empty(0, np.int64), np.empty(0, np.float64))
        else:
            out = (np.concatenate(docs_all), np.concatenate(scores_all))
        if doc_filter is None:
            decoded[key] = out
        return out

    out_rows: list[tuple[int, int, float]] = []
    for qid, terms in queries.items():
        terms = [t for t in set(terms) if t in term_rows]
        if not terms:
            continue
        terms.sort(key=term_upper, reverse=True)
        uppers = np.array([term_upper(t) for t in terms])
        acc_docs = np.empty(0, np.int64)
        acc_scores = np.empty(0, np.float64)
        theta = -np.inf
        for ti, term in enumerate(terms):
            # MaxScore split: a doc first seen at term ti can reach at most
            # sum(uppers[ti:]); if θ (k-th best partial, a lower bound of
            # the k-th best final score) already exceeds that, only
            # accumulated docs can still make the top-k → block-skip the
            # remaining lists down to accumulated docs.
            prune = theta > float(uppers[ti:].sum())
            d, s = decode_term(term, acc_docs if prune and len(acc_docs) else None)
            if len(d):
                # merge-accumulate (vectorized)
                md = np.concatenate([acc_docs, d])
                ms = np.concatenate([acc_scores, s])
                uniq, inv = np.unique(md, return_inverse=True)
                sums = np.zeros(len(uniq), np.float64)
                np.add.at(sums, inv, ms)
                acc_docs, acc_scores = uniq, sums
            if len(acc_scores) >= k:
                theta = float(
                    np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
                )
        if len(acc_docs) == 0:
            continue
        kk = min(k, len(acc_docs))
        # bounded selection: top-k by (score desc, docID asc)
        idx = np.lexsort((acc_docs, -acc_scores))[:kk]
        for i in idx:
            out_rows.append((qid, int(acc_docs[i]), float(acc_scores[i])))
    return out_rows


def wand_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    code_aware: bool | None = None,
) -> DataFrame:
    """(query_id, rank, docID, score) — fast path over the segment index."""
    meta = _load_meta(index_dir)
    if code_aware is None:
        code_aware = bool(meta.get("code_aware", True))
    qt = query_terms(queries, code_aware=code_aware).collect()
    qmap: dict[int, list[str]] = {}
    for r in qt:
        qmap.setdefault(int(r["query_id"]), []).append(r["term"])
    all_terms = sorted({t for ts in qmap.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, docID long, score double"
        )
    n_docs, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    k1, b = float(meta["k1"]), float(meta["b"])
    n_buckets = int(meta["n_buckets"])

    seg = (
        spark.read.parquet(f"{index_dir}/segments")
        .filter(F.col("term").isin(all_terms))
    )
    bc = spark.sparkContext.broadcast(qmap)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_bucket: dict[int, list[dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                by_bucket.setdefault(int(rec["doc_bucket"]), []).append(rec)
        out: list[tuple[int, int, float]] = []
        for bucket, rows in by_bucket.items():
            out.extend(
                _kernel_score_bucket(
                    bucket, rows, bc.value, index_dir, n_docs, avgdl, k1, b, k
                )
            )
        yield pd.DataFrame(out, columns=["query_id", "docID", "score"]).astype(
            {"query_id": "int64", "docID": "int64", "score": "float64"}
        )

    local = seg.repartition(n_buckets, "doc_bucket").mapInPandas(
        run, schema="query_id long, docID long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("docID"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "docID", "score")
    )
