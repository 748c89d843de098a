"""Exact phrase + proximity (NEAR) search over positional postings.

The reference surfaces matched *spans* of contiguous text as evidence
(``/root/reference/analysis/report_builder.py`` renders per-sentence
matches); the fulltext-index analog is exact phrase retrieval: a query
``"merge group"`` matches only documents where those tokens are
ADJACENT in the token stream, ranked by BM25 with the phrase itself as
the unit (tf = exact occurrence count, df = number of matching docs).
Proximity retrieval (:func:`proximity_search`) generalizes adjacency
to windowed containment — the closer analog of the reference's
sentence-granular fuzzy evidence
(``/root/reference/enhanced_pipeline.py:453-504``).

The positional artifact is the merged postings parquet itself: when an
index is built with ``IndexBuilder(positions=True)``, every
(term, docID) row carries ``pos_data binary`` — the term's token
offsets, delta-gap + VByte packed (``codec.pack_positions_groups``;
round 6 — raw ``array<int>`` inflated the positional layout ~1.8× and
made the build write-bound) — through the run → merge → generation →
compaction life-cycle (the column rides the existing shard-sorted
layout as opaque bytes; the WAND segment encoder prunes it).  A
positional query therefore needs no second index structure:

1. scan each live root's merged postings with ``term IN (phrase
   terms)`` — the same row-group-pruned read the segment encoder's
   input enjoys (rows bounded by Σ df(tᵢ), never the corpus);
2. a cheap column-pruned pre-pass keeps only docs containing ALL the
   phrase's terms (positions bytes are never read for partial
   matches);
3. tombstoned copies are excluded (docID, root)-scoped, exactly like
   the WAND kernel — deletes and resurrections need no special casing;
4. the candidates' packed rows — ``candidates × |phrase|`` rows of
   VByte bytes, never an exploded position stream — shuffle ONCE by
   (query, doc) into an Arrow-batched kernel that decodes and
   intersects offsets vectorized: a phrase occurrence is a base
   ``pos − off`` hit by EVERY phrase offset; a NEAR(w) occurrence is
   an anchor (first-term position) with every other term within ±w.
   (Round 5 exploded positions through two corpus-agg shuffles; the
   kernel moves ~Σtf·4 bytes less per candidate and does no
   per-position shuffle at all.)
5. BM25 over phrase tf/df with the index's live N/avgdl (delete-
   corrected in ``_meta.json``), round-then-rank top-k.

Scale notes: the only corpus-wide touch is the doc-length join (a
2-column scan of ``doc_stats``); everything else is bounded by the
phrase terms' posting sizes.  Skew: a phrase containing a hot term
decodes only the positions of docs that also contain the phrase's
rarest term (step 2), which is what keeps ``"the <rare>"`` queries
cheap.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docinsight_spark.functions.bm25 import bm25_score_col
from docinsight_spark.index import fsio
from docinsight_spark.index.builder import (
    load_tombstone_pairs,
    read_manifests,
    _union_frames,
)

# Java-regex \s parity with the build/WAND driver paths (wand.py:_query_term_map)
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")

# phrase query batches collect to the driver (offsets must broadcast);
# beyond this, split the batch — ~100k phrases × a few terms is tens of
# MB of driver rows, the same budget the WAND wave chunking protects
MAX_PHRASE_BATCH = 100_000

# candidate (query_id, docID) sets up to this size collect driver-side:
# the semi-join becomes a literal broadcast and the candidates' buckets
# partition-prune the positions read; larger sets stay a lazy plan
CAND_COLLECT_MAX = 200_000

# past this many distinct terms, the postings scan's term restriction
# switches from an IN-list literal (row-group pruning) to a broadcast
# semi-join — the same threshold the WAND scan uses (a 10^5-term IN
# predicate bloats the plan and the parquet filter evaluation)
TERM_INLIST_MAX = 1024


def _restrict_terms(df: DataFrame, terms: list[str]) -> DataFrame:
    if len(terms) <= TERM_INLIST_MAX:
        return df.filter(F.col("term").isin(terms))
    tdf = df.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    )
    return df.join(F.broadcast(tdf), "term", "left_semi")


def unpack_positions_col(pos_col: str, tf_col: str):
    """``array<int>`` column decoded from packed positions (count = tf)
    — an Arrow-batched kernel, used only over candidate-restricted rows
    (snippets / report evidence), never a corpus-wide pass."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from docinsight_spark.index.codec import unpack_positions

    def fn(bufs, tfs):
        return pd.Series(
            [
                (
                    unpack_positions(b, int(t)).astype(np.int32).tolist()
                    if b is not None
                    else []
                )
                for b, t in zip(bufs, tfs)
            ],
            dtype=object,
        )

    # real annotation objects: PEP-563 inline hints stringify and
    # pandas_udf cannot resolve them in this module
    fn.__annotations__ = {"bufs": pd.Series, "tfs": pd.Series,
                          "return": pd.Series}
    return pandas_udf(fn, "array<int>")(F.col(pos_col), F.col(tf_col))


def _phrase_offsets(
    rows: list[tuple[int, str]], code_aware: bool, lang: str
) -> list[tuple[int, int, str]]:
    """Tokenize phrases driver-side → (query_id, offset, term) rows,
    order and duplicates preserved (a phrase may repeat a term).  Phrase
    batches are small by nature (human queries); the distributed-wave
    machinery WAND needs for 10^5-query batches is not warranted here."""
    if code_aware:
        from docinsight_spark.functions.tokenizer import tokenize_code_pandas

        toks = tokenize_code_pandas(
            pd.Series([t for _, t in rows], dtype=object),
            pd.Series([lang] * len(rows), dtype=object),
        )
    else:
        toks = [
            [t for t in _JAVA_WS.split((txt or "").lower()) if t]
            for _, txt in rows
        ]
    out = []
    for (qid, _), ts in zip(rows, toks):
        out.extend((int(qid), off, term) for off, term in enumerate(ts))
    return out


def merged_roots(index_dir: str, meta: dict) -> list[tuple[str, str]]:
    """(root_id, merged_postings_dir) for the base set + every committed
    generation — the positional artifact's physical homes.  Loud when a
    root has no merged source (positions would be silently blind)."""
    final = [m for m in read_manifests(index_dir) if m["unit"] == "merged-final"]
    if not final:
        raise ValueError(f"no merged-final manifest under {index_dir}")
    out = [("base", f"{final[0]['source']}/postings")]
    for g in meta.get("generations", []):
        src = g.get("merged_source")
        if not src:
            raise ValueError(
                f"generation {g['id']} records no merged_source; phrase "
                "search cannot see its documents"
            )
        out.append((g["id"], f"{src}/postings"))
    return out


def phrase_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame | list[tuple[int, str]],
    k: int = 10,
    code_aware: bool | None = None,
    _meta: dict | None = None,
) -> DataFrame:
    """(query_id, rank, docID, score) — exact phrase top-k.

    ``queries``: (query_id, query_text) rows; each text is one phrase.
    Requires an index built with ``positions=True``."""
    return _positional_search(
        spark, index_dir, queries, k=k, code_aware=code_aware,
        _meta=_meta, mode="phrase", window=0,
    )


def proximity_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame | list[tuple[int, str]],
    k: int = 10,
    window: int = 8,
    code_aware: bool | None = None,
    _meta: dict | None = None,
) -> DataFrame:
    """(query_id, rank, docID, score) — NEAR(w) proximity top-k.

    A document occurrence is an ANCHOR: a position of the query's FIRST
    term such that every other query term has an occurrence within
    ``window`` tokens either side of it (|q − anchor| ≤ w); tf = anchor
    count, df = matching docs, BM25 over the index's live N/avgdl —
    exact-phrase machinery relaxed to windowed containment, the engine's
    analog of the reference's sentence-granular fuzzy evidence
    (``/root/reference/enhanced_pipeline.py:453-504``).  Deterministic
    and SQL-replayable (the driver oracle replays the same anchored
    definition).  Requires a ``positions=True`` index."""
    if window < 1:
        raise ValueError("proximity window must be >= 1 token")
    return _positional_search(
        spark, index_dir, queries, k=k, code_aware=code_aware,
        _meta=_meta, mode="near", window=int(window),
    )


def _positional_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame | list[tuple[int, str]],
    k: int,
    code_aware: bool | None,
    _meta: dict | None,
    mode: str,
    window: int,
) -> DataFrame:
    meta = _meta or fsio.read_json(f"{index_dir}/_meta.json")
    if not meta.get("positions", False):
        raise ValueError(
            f"index at {index_dir} was built without positions=True; "
            "phrase/proximity search needs positional postings"
        )
    if meta.get("positions_codec") != "vbyte-delta":
        raise ValueError(
            f"index at {index_dir} stores positions in a legacy layout "
            "(pre-round-6 array<int>); rebuild with this engine version "
            "to get packed positional postings"
        )
    if code_aware is None:
        code_aware = bool(meta.get("code_aware", True))
    qlang = str(meta.get("query_lang", "java"))
    if isinstance(queries, DataFrame):
        # phrase batches are driver-resident by design (human-scale query
        # sets); refuse a batch that would flood the driver instead of
        # silently collecting it — the WAND path has the wave machinery
        # for 10^5+ query batches, phrases don't (yet)
        head = queries.select("query_id", "query_text").limit(
            MAX_PHRASE_BATCH + 1
        ).collect()
        if len(head) > MAX_PHRASE_BATCH:
            raise ValueError(
                f"phrase batch exceeds {MAX_PHRASE_BATCH} queries; split "
                "the batch (phrase terms are driver-resident)"
            )
        rows = [(int(r["query_id"]), r["query_text"]) for r in head]
    else:
        rows = [(int(q), t) for q, t in queries]
    offsets = _phrase_offsets(rows, code_aware, qlang)
    empty = spark.createDataFrame(
        [], "query_id long, rank int, docID long, score double"
    )
    if not offsets:
        return empty
    all_terms = sorted({t for _, _, t in offsets})
    offs = spark.createDataFrame(offsets, "query_id long, off int, term string")
    noff = spark.createDataFrame(
        [
            (qid, sum(1 for q, _, _ in offsets if q == qid))
            for qid in sorted({q for q, _, _ in offsets})
        ],
        "query_id long, n int",
    )

    roots = merged_roots(index_dir, meta)

    def scan(rid: str, src: str, cols: list[str]) -> DataFrame:
        return (
            _restrict_terms(spark.read.parquet(src), all_terms)
            .select(*cols)
            .withColumn("_root", F.lit(rid))
        )

    # pre-pass WITHOUT the positions column (column-pruned scan): docs
    # containing every offset's term — partial matches never pay the
    # positions bytes.  Tombstoned copies may survive into this superset
    # harmlessly; the positions branch applies the exact exclusion.
    lite = _union_frames([scan(r, s, ["term", "docID"]) for r, s in roots])
    cand = (
        lite.join(F.broadcast(offs), "term")
        .groupBy("query_id", "docID")
        .agg(F.count_distinct("off").alias("c"))
        .join(F.broadcast(noff), "query_id")
        .filter(F.col("c") == F.col("n"))
        .select("query_id", "docID")
    )

    # Bucket-level partition pruning for the positions read: the merged
    # postings are partitioned by doc_bucket, and a selective phrase's
    # candidates usually live in few buckets.  Candidate sets small
    # enough to hold driver-side (the common phrase) are collected ONCE:
    # the semi-join side becomes a literal broadcast (the lite pre-pass
    # never re-executes) and their distinct buckets prune the heavy
    # scan's partition listing — the hot-term positions read only
    # touches buckets that can produce a match.  Oversized candidate
    # sets (a phrase of only stopwords) fall back to the lazy plan with
    # no pruning — correctness identical either way.
    n_buckets = int(meta["n_buckets"])
    cand_rows = cand.limit(CAND_COLLECT_MAX + 1).collect()
    if len(cand_rows) <= CAND_COLLECT_MAX:
        if not cand_rows:
            return empty
        cand = spark.createDataFrame(
            [(int(r["query_id"]), int(r["docID"])) for r in cand_rows],
            "query_id long, docID long",
        )
        # python % with a positive modulus is non-negative, matching
        # Spark's pmod on the build side
        buckets = sorted({int(r["docID"]) % n_buckets for r in cand_rows})
    else:
        buckets = None
    return _score_phrase_hits(
        spark, index_dir, meta, roots, scan, offs, noff, cand,
        buckets if buckets is not None and len(buckets) < n_buckets else None,
        k, mode, window,
    )


def _score_phrase_hits(
    spark, index_dir, meta, roots, scan, offs, noff, cand, buckets, k,
    mode: str = "phrase", window: int = 0,
) -> DataFrame:
    """Candidate scoring over PACKED positions: one shuffle of the
    candidates' (query, off, docID, tf, pos_data) rows by (query, doc),
    then an Arrow-batched kernel decodes and intersects offsets
    vectorized — the per-position explode → double hash-agg of round 5
    never leaves the kernel now.  ``mode='phrase'``: tf = bases hit by
    every offset; ``mode='near'``: tf = first-term anchors with every
    other term within ±``window``."""
    heavy = _union_frames(
        [
            scan(r, s, ["term", "docID", "tf", "pos_data", "doc_bucket"])
            for r, s in roots
        ]
    )
    if buckets is not None:
        heavy = heavy.filter(F.col("doc_bucket").isin(buckets))
    heavy = heavy.drop("doc_bucket")
    tomb = load_tombstone_pairs(spark, index_dir, meta)
    if tomb is not None:
        heavy = heavy.join(
            F.broadcast(tomb.withColumnRenamed("root", "_root")),
            ["docID", "_root"],
            "left_anti",
        )
    hits = (
        heavy.join(F.broadcast(offs), "term")
        .join(cand, ["query_id", "docID"], "left_semi")
        .join(F.broadcast(noff), "query_id")
        .select("query_id", "docID", "_root", "off", "tf", "pos_data", "n")
    )

    import numpy as np

    from docinsight_spark.index.codec import unpack_positions

    near_w = int(window)
    is_near = mode == "near"

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        empty_out = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "docID": pd.Series([], dtype="int64"),
                "_root": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
        n = int(pdf["n"].iloc[0])
        offs_a = pdf["off"].to_numpy()
        if len(np.unique(offs_a)) < n:
            # a candidate admitted by the cross-root pre-pass whose LIVE
            # copy lacks a term (resurrection with changed content)
            return empty_out
        if is_near:
            a0 = int(np.flatnonzero(offs_a == offs_a.min())[0])
            anchors = unpack_positions(
                pdf["pos_data"].iloc[a0], int(pdf["tf"].iloc[a0])
            )
            ok = np.ones(len(anchors), dtype=bool)
            for i in range(len(pdf)):
                if i == a0:
                    continue
                q = unpack_positions(
                    pdf["pos_data"].iloc[i], int(pdf["tf"].iloc[i])
                )
                lo = np.searchsorted(q, anchors - near_w, side="left")
                hi = np.searchsorted(q, anchors + near_w, side="right")
                ok &= hi > lo
            t = int(ok.sum())
        else:
            arrs = [
                unpack_positions(buf, int(tf)) - np.int64(off)
                for off, tf, buf in zip(
                    pdf["off"], pdf["tf"], pdf["pos_data"]
                )
            ]
            _u, c = np.unique(np.concatenate(arrs), return_counts=True)
            t = int((c == n).sum())
        if t == 0:
            return empty_out
        return pd.DataFrame(
            {
                "query_id": [int(pdf["query_id"].iloc[0])],
                "docID": [int(pdf["docID"].iloc[0])],
                "_root": [str(pdf["_root"].iloc[0])],
                "tf": [t],
            }
        )

    ptf = hits.groupBy("query_id", "docID", "_root").applyInPandas(
        kern, "query_id long, docID long, _root string, tf long"
    )
    pdf = ptf.groupBy("query_id").agg(F.count(F.lit(1)).alias("df"))

    stats_dirs = [("base", index_dir)] + [
        (g["id"], f"{index_dir}/generations/{g['id']}")
        for g in meta.get("generations", [])
    ]
    # keep the doc_bucket partition column: the dl join is the plan's
    # only corpus-wide touch, and joining on the partition key too lets
    # dynamic partition pruning skip doc_stats buckets holding no phrase
    # match (ptf's bucket is derivable in-plan — same pmod the build used)
    ds = _union_frames(
        [
            spark.read.parquet(f"{rdir}/doc_stats")
            .select("docID", "dl", "doc_bucket")
            .withColumn("_root", F.lit(rid))
            for rid, rdir in stats_dirs
        ]
    )
    n_docs, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    k1, b = float(meta["k1"]), float(meta["b"])
    n_buckets = int(meta["n_buckets"])
    ptf = ptf.withColumn(
        "doc_bucket", F.pmod(F.col("docID"), F.lit(n_buckets)).cast("int")
    )
    scored = (
        ptf.join(F.broadcast(pdf), "query_id")
        .join(ds, ["doc_bucket", "docID", "_root"])
        .withColumn(
            "score",
            bm25_score_col(
                F.col("tf"), F.col("df"), F.col("dl"), n_docs, avgdl, k1, b
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 4).desc(), F.col("docID")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "docID", "score")
    )


# ---------------------------------------------------------------------------
# Keyword-in-context snippets: best matched-term window per (query, doc)
# ---------------------------------------------------------------------------


def snippet_windows(
    spark: SparkSession,
    index_dir: str,
    candidates: DataFrame,
    qterms: DataFrame,
    window: int = 8,
    _meta: dict | None = None,
) -> DataFrame:
    """(query_id, docID, snippet_start, n_matches) — for each candidate
    (query_id, docID) pair, the token offset whose ``window``-token span
    covers the MOST query-term occurrences (ties → smallest offset): the
    keyword-in-context evidence span, the engine's analog of the
    reference's matched-sentence display
    (``/root/reference/analysis/report_builder.py`` per-span rendering).

    ``candidates``: (query_id, docID) — normally a top-k result, so tiny
    and broadcast; ``qterms``: (query_id, term).  Cost is bounded by the
    candidates' matched positions: the positions scan is pushed down to
    the query's terms, restricted to candidate docs BEFORE positions
    explode, and the window argmax is a per-(query, doc) self range-join
    over a handful of matched offsets — never a corpus-wide pass.
    Requires a ``positions=True`` index."""
    meta = _meta or fsio.read_json(f"{index_dir}/_meta.json")
    if not meta.get("positions", False):
        raise ValueError(
            f"index at {index_dir} was built without positions=True; "
            "snippets need positional postings"
        )
    if meta.get("positions_codec") != "vbyte-delta":
        raise ValueError(
            f"index at {index_dir} stores positions in a legacy layout "
            "(pre-round-6 array<int>); rebuild with this engine version"
        )
    thead = qterms.select("term").distinct().limit(1_000_001).collect()
    if len(thead) > 1_000_000:
        raise ValueError(
            "snippet qterms exceed 1M distinct terms; split the batch "
            "(the term restriction is driver-resident)"
        )
    terms = [r["term"] for r in thead]
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, docID long, snippet_start int, n_matches long"
        )
    roots = merged_roots(index_dir, meta)
    cand = candidates.select("query_id", "docID").distinct()
    # same bounded-collect + bucket pruning as phrase_search: snippet
    # candidates are a top-k result (tiny) in every real caller, so the
    # positions read lists only their buckets
    n_buckets = int(meta["n_buckets"])
    buckets = None
    cand_rows = cand.limit(CAND_COLLECT_MAX + 1).collect()
    if len(cand_rows) <= CAND_COLLECT_MAX:
        if not cand_rows:
            return spark.createDataFrame(
                [], "query_id long, docID long, snippet_start int, n_matches long"
            )
        cand = spark.createDataFrame(
            [(int(r["query_id"]), int(r["docID"])) for r in cand_rows],
            "query_id long, docID long",
        )
        bset = sorted({int(r["docID"]) % n_buckets for r in cand_rows})
        if len(bset) < n_buckets:
            buckets = bset
    rows = _union_frames(
        [
            _restrict_terms(spark.read.parquet(src), terms)
            .select("term", "docID", "tf", "pos_data", "doc_bucket")
            .withColumn("_root", F.lit(rid))
            for rid, src in roots
        ]
    )
    if buckets is not None:
        rows = rows.filter(F.col("doc_bucket").isin(buckets))
    rows = rows.drop("doc_bucket")
    tomb = load_tombstone_pairs(spark, index_dir, meta)
    if tomb is not None:
        rows = rows.join(
            F.broadcast(tomb.withColumnRenamed("root", "_root")),
            ["docID", "_root"],
            "left_anti",
        )
    mpos = (
        rows.join(F.broadcast(qterms), "term")
        .join(F.broadcast(cand), ["query_id", "docID"], "left_semi")
        .select(
            "query_id",
            "docID",
            F.explode(unpack_positions_col("pos_data", "tf")).alias("pos"),
        )
        .distinct()  # two query terms at one offset count once
    )
    a, bb = mpos.alias("a"), mpos.alias("b")
    wins = (
        a.join(
            bb,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.docID") == F.col("b.docID"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") < F.col("a.pos") + F.lit(window)),
        )
        .groupBy(
            F.col("a.query_id").alias("query_id"),
            F.col("a.docID").alias("docID"),
            F.col("a.pos").alias("snippet_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    w = Window.partitionBy("query_id", "docID").orderBy(
        F.col("n_matches").desc(), F.col("snippet_start")
    )
    return (
        wins.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            "docID",
            F.col("snippet_start").cast("int").alias("snippet_start"),
            "n_matches",
        )
    )
