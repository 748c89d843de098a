"""Inverted-index logical build: corpus → postings + statistics.

This replaces the reference's chunk→embed→FAISS build
(``/root/reference/index/index_manager.py:44-122``, which collects every
embedding into driver RAM at ``index_manager.py:84-100`` — its
scalability wall).  Here the index is a set of *relations* produced by
distributed aggregation; nothing ever passes through the driver:

* ``docs``       (docID, repo, path, commit, lang, content_sha, dl)
* ``postings``   (term, docID, tf)
* ``term_stats`` (term, df)
* scalar corpus stats (N, avgdl)

All aggregation is Catalyst hash-agg (partial + final, map-side
combine).  Document-frequency aggregation over hot terms (``return``,
``int`` …) is explicitly two-stage salted: the (term, salt) partial
keeps any single reducer from owning a whole hot term at 10^12-file
scale.  The per-row invariant ``content_sha = sha2(content, 256)``
mirrors the reference's SHA-256 dedup key
(``/root/reference/db/db_manager.py:215-217``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docinsight_spark.functions.tokenizer import code_tokens_udf, simple_tokens_col

DOC_KEY = ["repo", "path", "commit"]


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """Stable 64-bit docID = xxhash64(repo, path, commit).

    Deterministic across partitionings (unlike
    ``monotonically_increasing_id``), join-free, and computable on both
    build and query sides.  Reference analog: SQLite rowid + content
    hash (``db/schema.sql:14-27``).
    """
    return corpus.withColumn("docID", F.xxhash64(*DOC_KEY)).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )


def tokenized(corpus: DataFrame, code_aware: bool = True) -> DataFrame:
    """(docID, content_sha, …, tokens array<string>) — the UDF boundary.

    ``code_aware=True`` uses the vectorized code tokenizer (comment /
    string stripping + identifier splitting); ``False`` uses the pure
    Catalyst whitespace tokenizer (oracle-parity path).
    """
    df = corpus if "docID" in corpus.columns else with_doc_id(corpus)
    tok = (
        code_tokens_udf(F.col("content"), F.col("lang"))
        if code_aware
        else simple_tokens_col("content")
    )
    return df.withColumn("tokens", tok)


def build_postings(
    corpus: DataFrame, code_aware: bool = True, with_positions: bool = False
) -> DataFrame:
    """(term, docID, tf[, positions]) — the engine's core derived relation.

    The code-aware path emits finished (term, docID, tf) triples straight
    from the Arrow kernel: every document sits wholly inside one batch,
    so the per-doc term frequency is already complete — **no shuffle and
    no JVM explode** are needed to produce postings (measured ~10×
    cheaper than explode → groupBy on the same corpus; the only shuffle
    in the whole build is the shard sort in the merge wave).

    The ``code_aware=False`` path keeps the declarative
    explode → groupBy(term, docID).count() form used by the SQL-parity
    oracles; its composite key is fine-grained, so Catalyst's partial
    aggregation absorbs hot-term skew.

    ``with_positions=True`` adds ``positions array<int>`` — the term's
    ascending token offsets within the document's token stream — the
    artifact exact phrase/proximity search intersects
    (:mod:`docinsight_spark.index.phrase`).  Layout note (round 6,
    MEASURED): a delta-gap+VByte ``binary`` packing was tried and is
    ~25 % LARGER on disk than the int array — most lists hold a single
    position (p50 tf = 1 on code), so parquet's 4-byte BYTE_ARRAY
    length prefix dominates, while the int array rides parquet's
    dictionary/RLE integer encodings.  The write-volume fix that
    actually wins is zstd on the positional artifacts
    (``IndexBuilder`` switches codec when ``positions=True``: 1.83× →
    1.58× merged inflation).  Positions never enter the WAND segments
    (column-pruned at encode); a phrase query's term IN-list prunes
    row groups the same way the segment encoder's scan does.
    """
    df = corpus if "docID" in corpus.columns else with_doc_id(corpus)
    if not code_aware:
        toks = tokenized(df, code_aware=False)
        if not with_positions:
            return (
                toks.select("docID", F.explode("tokens").alias("term"))
                .groupBy("term", "docID")
                .agg(F.count(F.lit(1)).alias("tf"))
            )
        return (
            toks.select(
                "docID", F.posexplode("tokens").alias("pos", "term")
            )
            .groupBy("term", "docID")
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
                    "positions"
                ),
            )
        )

    import numpy as np
    import pandas as pd

    from docinsight_spark.functions.tokenizer import tokenize_code_pandas

    def kernel(batches):
        for pdf in batches:
            toks = tokenize_code_pandas(pdf["content"], pdf["lang"])
            lens = toks.map(len).to_numpy()
            if lens.sum() == 0:
                continue
            doc_rep = np.repeat(pdf["docID"].to_numpy(), lens)
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            if not with_positions:
                tf = (
                    pd.DataFrame({"docID": doc_rep, "term": flat})
                    .groupby(["docID", "term"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )
                yield tf[["term", "docID", "tf"]]
                continue
            # token offset within each doc's stream: one global arange
            # minus each doc's start offset (vectorized, no per-doc loop)
            starts = np.repeat(
                np.concatenate(([0], np.cumsum(lens)[:-1])), lens
            )
            pos = (np.arange(len(flat)) - starts).astype("int32")
            # grouping WITHOUT pandas groupby.agg(list) (python-level per
            # group — measured ~2× on the whole build): factorize terms,
            # compose an int64 (doc, term) key, stable-argsort it (keeps
            # within-group input order → positions stay ascending), then
            # slice the ordered positions at group boundaries
            tcodes, _tuniq = pd.factorize(flat, sort=False)
            dcodes = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            key = dcodes * np.int64(len(_tuniq)) + tcodes
            order = np.argsort(key, kind="stable")
            skey = key[order]
            bounds = np.flatnonzero(skey[1:] != skey[:-1]) + 1
            firsts = np.concatenate(([0], bounds))
            ordered_pos = pos[order]
            yield pd.DataFrame(
                {
                    "term": flat[order][firsts],
                    "docID": doc_rep[order][firsts],
                    "tf": np.diff(np.concatenate((firsts, [len(skey)]))),
                    "positions": np.split(ordered_pos, bounds),
                }
            )

    schema = "term string, docID long, tf long"
    if with_positions:
        schema += ", positions array<int>"
    return df.select("docID", "lang", "content").mapInPandas(kernel, schema=schema)


def doc_stats(postings: DataFrame) -> DataFrame:
    """(docID, dl) — document length in tokens (sum of tf)."""
    return postings.groupBy("docID").agg(F.sum("tf").alias("dl"))


def term_stats(postings: DataFrame, n_salts: int = 16) -> DataFrame:
    """(term, df) — document frequency, two-stage salted aggregation.

    Stage 1 groups on (term, salt) — splits a hot term's rows across
    ``n_salts`` reducers; stage 2 sums the small partials.  Since
    ``postings`` is already unique on (term, docID), df is a COUNT, not
    COUNT DISTINCT.  At 10^12 files a single hot term has ~10^11
    postings; without the salt one reducer would own them all
    (SURVEY §4 "needs explicit handling" #1).
    """
    partial = (
        postings.withColumn("_salt", F.pmod(F.xxhash64("docID"), F.lit(n_salts)))
        .groupBy("term", "_salt")
        .agg(F.count(F.lit(1)).alias("_pdf"))
    )
    return partial.groupBy("term").agg(F.sum("_pdf").alias("df"))


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(dstats: DataFrame) -> CorpusStats:
    row = dstats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
