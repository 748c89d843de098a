"""Physical index build: runs → merge waves → block-max segments.

Replaces the reference's index build
(``/root/reference/index/index_manager.py:44-122``), which embeds every
chunk and then collects *all* vectors into driver RAM
(``index_manager.py:84-100``).  Here every stage is a distributed job
and the driver only moves manifests:

1. **add_run** — tokenize a corpus slice → (term, docID, tf) postings
   with shard keys ``doc_bucket = pmod(docID, B)`` and
   ``doc_sub = pmod(xxhash64(docID), K)``; written as plain parquet so
   the expensive tokenize pass runs exactly once per run (no
   re-sampling, no partitioned-commit storm).  New docs are anti-joined
   against already-indexed runs (the Spark analog of the reference's
   ``WHERE embedding IS NULL`` incremental resume,
   ``embeddings/embedder.py:147-158``, and its SHA-256 dedup gate,
   ``pipeline_ingest.py:265-269``).
2. **merge_all** — hierarchical merge waves: fan-in groups of runs are
   **repartitioned by shard and sorted within partitions**
   (repartition-and-sort-within-partitions), halving the run count per
   wave; the terminal wave yields the global shard-sorted posting
   layout.  Each wave step is manifest-guarded → a restarted build
   skips completed waves.
3. **finalize** — doc/term statistics (document-frequency aggregation
   is two-stage salted against hot-term skew), then a streaming
   ``mapInPandas`` encoder turns the sorted postings into delta-gap +
   varint segments with per-block skip data and block maxima.
   The block maxima are **idf-independent** — the encoder stores
   ``max(tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)))`` per block and the
   query path multiplies by idf (from ``term_stats`` pruned to the
   query's terms).  Document frequency therefore never joins the
   posting stream at encode time: at corpus scale the vocabulary
   (billions of distinct identifiers) would not fit a broadcast, and a
   sort-merge fallback would destroy the (shard, term, docID) file
   order the streaming encoder depends on.  The encoder consumes the
   merge output's file order directly — no shuffle, no join; document
   length is read bucket-locally inside the kernel.

**Why document-partitioned (not term-partitioned):** each shard holds
the *complete* posting lists for its documents, so top-k scoring runs
shard-locally (block-max pruning per shard) and only ``shards × k``
candidate rows shuffle for the global merge.  Hot terms spread evenly
across shards by construction — the doc hash, not the term, picks the
partition — so the worst skew a hot term can cause is bounded by shard
size.  Shards are range-partitioned (equal keys stay whole; hash-
partitioning B values into B partitions leaves ~1/e of slots empty and
2-3× stragglers).

Lineage: every unit writes ``manifests/<unit>.json`` atomically
(tmp + rename) with per-partition counters (postings, docs, segments
built, bytes compressed — row counts read from parquet footers, not
extra Spark jobs) — the engine's analog of the reference's
``ingestion_runs`` lineage table (``/root/reference/db/schema.sql:43-54``).
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docinsight_spark import BM25_B, BM25_K1
from docinsight_spark.index import fsio
from docinsight_spark.index.codec import BLOCK_SIZE, encode_postings
from docinsight_spark.operators.postings import (
    build_postings,
    term_stats,
    with_doc_id,
)

SEGMENT_SCHEMA = (
    "doc_bucket int, doc_sub int, term string, n long, "
    "first_doc array<long>, last_doc array<long>, bn array<int>, "
    "offsets array<long>, doc_bytes array<int>, max_score array<float>, "
    "payload binary"
)


def _atomic_write_json(path: str, payload: dict) -> None:
    fsio.write_json_atomic(path, payload)


# Past this many files, driver-side footer reads (even threaded) are
# minutes of wall time at DFS round-trip latency — fan the reads out as
# a Spark job instead; the driver only receives one int per file.
FOOTER_DRIVER_MAX = 4096


def _footer_counts_distributed(spark: SparkSession, files: list[str]) -> list[int]:
    """Per-file parquet footer row counts as a Spark job (executor-side
    pyarrow reads, ~256 files per task); order matches ``files``."""
    def part(it):
        import pyarrow.parquet as pq

        for f in it:
            fs, _ = fsio.resolve(f)
            yield (f, pq.read_metadata(f, filesystem=fs).num_rows)

    slices = max(1, min(len(files) // 256 + 1, 512))
    got = dict(spark.sparkContext.parallelize(files, slices).mapPartitions(part).collect())
    return [got[f] for f in files]


def _footer_rows(
    path: str, per_dir_key: str | None = None, spark: SparkSession | None = None
) -> tuple[int, dict]:
    """Dataset row count (and per-partition-dir counts) from parquet
    footers — no full-data Spark job.  DFS-safe: footers are read through
    the path's filesystem (local, file://, s3://, hdfs://).  At high file
    counts (``> FOOTER_DRIVER_MAX``, the 10^5-10^6-shard geometry) the
    reads run as a Spark job when a session is provided."""
    import pyarrow.parquet as pq

    fs, _ = fsio.resolve(path)
    files = fsio.glob_parquet(path)
    total, per = 0, {}
    if spark is not None and len(files) > FOOTER_DRIVER_MAX:
        counts = _footer_counts_distributed(spark, files)
    else:
        # footer reads are tiny but latency-bound (driver-side, one round
        # trip per file on a DFS / contended disk) — overlap them
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, max(len(files), 1))) as ex:
            counts = list(ex.map(
                lambda f: pq.read_metadata(f, filesystem=fs).num_rows, files
            ))
    for f, n in zip(files, counts):
        total += n
        if per_dir_key:
            part = [p for p in f.split("/") if p.startswith(f"{per_dir_key}=")]
            if part:
                key = part[0].split("=", 1)[1]
                per[key] = per.get(key, 0) + n
    return total, per


def _seg_footer_stats(md) -> tuple[int, int]:
    """(rows, compressed payload bytes) from one parquet footer."""
    pay = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema == "payload":
                pay += col.total_compressed_size
    return md.num_rows, pay


def _segment_lineage(path: str, spark: SparkSession | None = None) -> dict:
    """Per-bucket segment counters from parquet footers: row counts and
    the compressed size of the ``payload`` column — no full-data Spark
    job; past ``FOOTER_DRIVER_MAX`` files the footer reads themselves fan
    out as a Spark job (the driver receives two ints per file)."""
    import pyarrow.parquet as pq

    fs, _ = fsio.resolve(path)
    files = fsio.glob_parquet(path)
    per: dict[str, dict] = {}
    total_rows, total_bytes = 0, 0
    if spark is not None and len(files) > FOOTER_DRIVER_MAX:
        def part(it):
            import pyarrow.parquet as pq

            for f in it:
                pfs, _ = fsio.resolve(f)
                yield (f, _seg_footer_stats(pq.read_metadata(f, filesystem=pfs)))

        slices = max(1, min(len(files) // 256 + 1, 512))
        got = dict(
            spark.sparkContext.parallelize(files, slices).mapPartitions(part).collect()
        )
        stats = [got[f] for f in files]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, max(len(files), 1))) as ex:
            stats = list(ex.map(
                lambda f: _seg_footer_stats(pq.read_metadata(f, filesystem=fs)), files
            ))
    for f, (rows, pay) in zip(files, stats):
        part = [p for p in f.split("/") if p.startswith("doc_bucket=")]
        key = part[0].split("=", 1)[1] if part else "?"
        d = per.setdefault(key, {"segments_built": 0, "bytes_compressed": 0})
        d["segments_built"] += rows
        d["bytes_compressed"] += pay
        total_rows += rows
        total_bytes += pay
    return {
        "segments_built": total_rows,
        "bytes_compressed": total_bytes,
        "per_bucket": per,
    }


def strict_dl_enabled() -> bool:
    """Debug flag: verify every docID resolves to an exact doc_stats row.
    Read driver-side and captured into kernel closures (executor env is
    not reliably inherited once worker daemons exist)."""
    return os.environ.get("DOCINSIGHT_STRICT_DL", "") == "1"


def lookup_dl(
    sorted_docs: np.ndarray,
    dls: np.ndarray,
    doc_ids: np.ndarray,
    strict: bool = False,
) -> np.ndarray:
    """Binary-search doc lengths for ``doc_ids`` in a docID-sorted map.

    Default mode clamps out-of-range probes (a docID absent from
    doc_stats silently reuses a neighbor's length — cheap, but hides
    index corruption as subtly wrong BM25 scores).  ``strict`` asserts
    exact membership and fails loudly instead."""
    if len(sorted_docs) == 0:
        if strict and len(doc_ids):
            raise ValueError("doc_stats bucket is empty but postings reference docs")
        return np.ones(len(doc_ids), np.int64)
    pos = np.clip(np.searchsorted(sorted_docs, doc_ids), 0, len(sorted_docs) - 1)
    if strict:
        bad = sorted_docs[pos] != doc_ids
        if bad.any():
            missing = np.asarray(doc_ids)[bad][:5].tolist()
            raise ValueError(
                f"postings/doc_stats inconsistency: {int(bad.sum())} docIDs "
                f"missing from doc_stats (first: {missing})"
            )
    return dls[pos]


def read_doc_stats_bucket(index_dir: str, bucket: int) -> dict | None:
    """Bucket-local doc-length map, read inside kernels via pyarrow.

    On a cluster this is a distributed-FS read of one small co-located
    partition — no shuffle. Returns {docID -> dl} as numpy arrays."""
    import pyarrow.parquet as pq

    path = f"{index_dir}/doc_stats/doc_bucket={bucket}"
    if not fsio.exists(path):
        return None
    fs, p = fsio.resolve(path)
    t = pq.read_table(p, columns=["docID", "dl"], filesystem=fs)
    return {
        "docID": t.column("docID").to_numpy(),
        "dl": t.column("dl").to_numpy(),
    }


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        n_buckets: int = 32,
        n_subs: int = 2,
        block_size: int = BLOCK_SIZE,
        k1: float = BM25_K1,
        b: float = BM25_B,
        code_aware: bool = True,
        broadcast_seen_max: int = 2_000_000,
    ):
        """``n_buckets`` = on-disk partition dirs; ``n_subs`` = intra-bucket
        shards.  ``B × K`` shards are the unit of sort/query parallelism;
        every shard is a self-contained document slice.

        Sizing at scale: pick ``B × K`` ≈ 2-4× total executor cores so
        every core owns a few shards per wave, and so one shard's
        postings (≈ total_postings / (B·K)) fit an executor's sort
        buffer.  At 10^12 files / ~4·10^14 postings that means
        B·K ≈ 10^5-10^6 shards (e.g. B = 4096 dirs × K = 64), giving
        ~10^9 postings ≈ 4-8 GB compressed per shard task.  ``B`` alone
        controls directory fan-out / partition pruning granularity;
        local test defaults (32 × 2) mirror the same geometry."""
        self.spark = spark
        self.dir = index_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.n_subs = n_subs
        self.block_size = block_size
        self.k1, self.b = k1, b
        self.code_aware = code_aware
        # above this many already-indexed docIDs the cross-run dedup gate
        # switches from a broadcast anti-join to a Bloom pre-gate + plain
        # anti-join (the seen side is never broadcast whole)
        self.broadcast_seen_max = broadcast_seen_max
        self._gate_cache: list[DataFrame] = []
        fsio.makedirs(f"{self.dir}/manifests")

    @property
    def n_shards(self) -> int:
        return self.n_buckets * self.n_subs

    # -- lineage -----------------------------------------------------------

    def _mpath(self, unit: str) -> str:
        return f"{self.dir}/manifests/{unit}.json"

    def _done(self, unit: str) -> bool:
        p = self._mpath(unit)
        if not fsio.exists(p):
            return False
        return fsio.read_json(p).get("status") == "complete"

    def _commit(self, unit: str, **counters) -> None:
        _atomic_write_json(
            self._mpath(unit),
            {"unit": unit, "status": "complete", "ts": time.time(), **counters},
        )

    def manifests(self) -> list[dict]:
        # only committed manifests: a crash between tmp-write and rename
        # leaves *.json.tmp.<pid> files that must not count as lineage
        return [
            fsio.read_json(f"{self.dir}/manifests/{fn}")
            for fn in fsio.listdir(f"{self.dir}/manifests")
            if fn.endswith(".json")
        ]

    def _read_union(self, paths: list[str]) -> DataFrame:
        """Union several (possibly partitioned) parquet datasets — separate
        loads avoid CONFLICTING_DIRECTORY_STRUCTURES on sibling roots."""
        dfs = [self.spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # -- stage 1: runs -----------------------------------------------------

    def _sharded(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "doc_bucket", F.pmod(F.col("docID"), F.lit(self.n_buckets)).cast("int")
        ).withColumn(
            "doc_sub",
            F.pmod(F.xxhash64(F.col("docID")), F.lit(self.n_subs)).cast("int"),
        )

    def add_run(
        self, corpus: DataFrame, run_id: str, dedup_within_run: bool = True
    ) -> None:
        """Tokenize one corpus slice into a plain-parquet postings run.

        One tokenize pass, one write; sorting/partitioning is deferred to
        the merge waves (which must re-shuffle anyway).
        ``dedup_within_run=False`` skips the within-slice docID dedup
        shuffle (safe when the upstream feed is already unique — it
        shuffles full document content, the most expensive bytes in the
        job).  The cross-run anti-join gate always applies."""
        unit = f"run-{run_id}"
        if self._done(unit):
            return
        docs = with_doc_id(corpus)
        if dedup_within_run:
            docs = docs.dropDuplicates(["docID"])
        priors = [m for m in self.manifests() if m["unit"].startswith("run-")]
        if priors:
            seen = self._read_union(
                [f"{self.dir}/runs/{m['run_id']}/docs" for m in priors]
            ).select("docID")
            seen_total = sum(int(m.get("docs", 0)) for m in priors)
            docs = self._gate_new_docs(docs, seen, seen_total)

        base = f"{self.dir}/runs/{run_id}"
        try:
            postings = self._sharded(build_postings(docs, code_aware=self.code_aware))
            # run postings are write-once-read-once intermediates (consumed by
            # the next merge wave, then dead): cheap snappy beats the session
            # zstd here — encode CPU was the hottest JVM stage of the build.
            # Long-lived artifacts (segments, docs, stats) keep zstd.
            postings.write.mode("overwrite").option("compression", "snappy").parquet(
                f"{base}/postings"
            )
            docs.select(
                "docID", "repo", "path", "commit", "lang", "content_sha"
            ).write.mode("overwrite").parquet(f"{base}/docs")
        finally:
            # unpersist even when a write fails mid-run: a MEMORY_AND_DISK
            # gate frame must not outlive its run attempt (it would leak
            # for the session and across resumed builds)
            for cached in self._gate_cache:
                cached.unpersist()
            self._gate_cache.clear()
        n_postings, _ = _footer_rows(f"{base}/postings", spark=self.spark)
        n_docs, _ = _footer_rows(f"{base}/docs", spark=self.spark)
        self._commit(unit, run_id=run_id, postings=n_postings, docs=n_docs)

    def _gate_new_docs(
        self, docs: DataFrame, seen: DataFrame, seen_total: int
    ) -> DataFrame:
        """Cross-run dedup gate: keep only docs whose docID is not in
        ``seen`` (the union of all prior runs' keys).

        Small history (≤ ``broadcast_seen_max`` keys, known from run
        manifests — no counting job): broadcast the narrow key side; the
        corpus keeps its partitioning, zero shuffle of content.

        Large history: a distributed Bloom filter pre-gate.  Bloom-
        negative rows are definitely new and skip the join entirely;
        only bloom-positive rows (true dups + ~1 % false positives) pay
        the precise anti-join, so the shuffled content volume tracks the
        actual overlap, not the run size — and the seen side is never
        broadcast whole.  Past the filter's bit cap the fp rate degrades
        gracefully (more rows take the precise path) rather than OOMing.
        """
        if seen_total <= self.broadcast_seen_max:
            return docs.join(F.broadcast(seen), "docID", "left_anti")
        from pyspark import StorageLevel

        from docinsight_spark.index.bloom import build_bloom, might_contain

        bits, m_bits, k = build_bloom(seen, "docID", seen_total)
        probe = might_contain(self.spark.sparkContext, bits, m_bits, k)
        # evaluate the probe ONCE on a persisted frame: filtering docs by
        # probe and ¬probe separately would recompute the upstream scan +
        # dropDuplicates shuffle twice — and with a nondeterministic docID
        # the two branches could disagree (drop/duplicate rows)
        flagged = docs.withColumn("_maybe_seen", probe(F.col("docID"))).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        self._gate_cache.append(flagged)
        definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        survivors = (
            flagged.filter(F.col("_maybe_seen"))
            .drop("_maybe_seen")
            .join(seen, "docID", "left_anti")
        )
        return definite_new.unionByName(survivors)

    # -- stage 2: hierarchical merge waves ---------------------------------

    def merge_all(self, fanin: int = 8) -> str:
        """Repartition-and-sort merge waves until one shard-sorted layout
        remains; resumable per wave step.

        The terminal manifest records the run set it covered: a repeated
        ``merge_all`` with the same runs short-circuits, while calling it
        after new runs were added fails loudly (instead of silently
        serving an index that excludes them) — clear the merge/finalize
        manifests via :func:`docinsight_spark.streaming.incremental.refresh`
        to rebuild over the new run set."""
        runs = sorted(
            m["run_id"] for m in self.manifests() if m["unit"].startswith("run-")
        )
        if not runs:
            raise ValueError("no runs to merge")
        if self._done("merged-final"):
            final = [m for m in self.manifests() if m["unit"] == "merged-final"][0]
            if "runs" not in final:
                # a manifest that predates run tracking can't prove it
                # covers the current run set — that's exactly the silent-
                # stale-index case this guard exists to catch
                raise ValueError(
                    "merged-final manifest records no run set; call "
                    "streaming.incremental.refresh() to re-merge"
                )
            covered = sorted(final["runs"])
            if covered != runs:
                raise ValueError(
                    f"index was finalized over runs {covered} but runs {runs} now "
                    "exist; call streaming.incremental.refresh() to re-merge"
                )
            return final["source"]
        sources = [f"{self.dir}/runs/{r}" for r in runs]
        wave = 0
        while len(sources) > 1 or sources[0].startswith(f"{self.dir}/runs/"):
            groups = [sources[i : i + fanin] for i in range(0, len(sources), fanin)]
            nxt = []
            for gi, grp in enumerate(groups):
                out = f"{self.dir}/merged/wave{wave}/g{gi}"
                unit = f"merge-w{wave}-g{gi}"
                if not self._done(unit):
                    self._merge_group(grp, out, unit)
                nxt.append(out)
            sources = nxt
            wave += 1
        self._commit("merged-final", source=sources[0], waves=wave, runs=runs)
        return sources[0]

    def _merge_group(self, grp: list[str], out: str, unit: str) -> None:
        """One merge step: repartition-and-sort-within-partitions by shard.

        Output: one file per shard inside its bucket dir, rows sorted by
        (term, docID) — the layout the segment encoder and parquet
        row-group pruning rely on."""
        postings = self._read_union([f"{s}/postings" for s in grp])
        # range (not hash) keeps every shard its own task at guaranteed
        # balance; the sampling pass re-reads only materialized parquet
        # (A/B-measured equal to hash at 300k files — balance wins ties).
        (
            postings.repartitionByRange(self.n_shards, "doc_bucket", "doc_sub")
            .sortWithinPartitions("doc_bucket", "doc_sub", "term", "docID")
            .write.mode("overwrite")
            # merge-wave outputs are intermediates too (read once by the
            # next wave or by finalize) — snappy, same rationale as runs
            .option("compression", "snappy")
            .partitionBy("doc_bucket")
            .parquet(f"{out}/postings")
        )
        n, per_bucket = _footer_rows(f"{out}/postings", "doc_bucket", spark=self.spark)
        self._commit(unit, inputs=grp, postings_merged=n,
                     postings_per_bucket=per_bucket)

    # -- stage 3: finalize (stats + segment encode) -------------------------

    def finalize(self, merged_dir: str | None = None) -> None:
        if self._done("finalize"):
            return
        if merged_dir is None:
            final = [m for m in self.manifests() if m["unit"] == "merged-final"]
            if not final:
                raise ValueError("run merge_all() before finalize()")
            merged_dir = final[0]["source"]

        postings = self.spark.read.parquet(f"{merged_dir}/postings")

        # doc_stats: (docID, dl) per bucket — the kernel-side dl source.
        # Hash repartition, NOT repartitionByRange: range partitioning
        # samples its input, which would run the whole groupBy twice
        # (range directly on an unmaterialized aggregate = double agg).
        # The key domain is tiny (n_buckets ints), so hash clustering is
        # enough to keep file counts bounded per partition dir.
        # N / avgdl ride along as observed metrics of the SAME write job
        # (no read-back aggregation job).
        from pyspark.sql import Observation

        obs = Observation("corpus_stats")
        (
            postings.groupBy("doc_bucket", "docID")
            .agg(F.sum("tf").alias("dl"))
            .observe(obs, F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
            .repartition(self.n_buckets, "doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{self.dir}/doc_stats")
        )

        # Global stats: salted df aggregation (hot-term skew defused).
        # Sorted within partitions by term (no extra shuffle — the agg
        # output is already hash-partitioned on term) so query-time df
        # lookups prune parquet row groups via min/max stats.
        ts = term_stats(postings.select("term", "docID", "tf"))
        ts.sortWithinPartitions("term").write.mode("overwrite").parquet(
            f"{self.dir}/term_stats"
        )
        stats_row = obs.get
        n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"] or 0.0)
        # observed metrics can over-count under stage resubmission /
        # speculative execution; the parquet footers of the just-written
        # doc_stats are exact and free — cross-check, and recompute with
        # an exact read-back aggregation on mismatch (rare path).
        footer_n, _ = _footer_rows(f"{self.dir}/doc_stats", spark=self.spark)
        if footer_n != n_docs:
            row = (
                self.spark.read.parquet(f"{self.dir}/doc_stats")
                .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
                .first()
            )
            n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        meta = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_buckets": self.n_buckets,
            "n_subs": self.n_subs,
            "block_size": self.block_size,
            "k1": self.k1,
            "b": self.b,
            "code_aware": self.code_aware,
            "version": 3,
        }
        _atomic_write_json(f"{self.dir}/_meta.json", meta)

        # Segment encode straight off the merge output: the scan preserves
        # within-file (shard, term, docID) order; dl is read bucket-
        # locally in the kernel.  No join and no shuffle touch the
        # posting stream (block maxima are idf-independent, so the
        # full-vocabulary term_stats never broadcasts here).
        enc_input = self._encode_input(postings)
        index_dir, k1, b, block_size = self.dir, self.k1, self.b, self.block_size
        strict = strict_dl_enabled()

        def encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            carry: pd.DataFrame | None = None
            dl_cache: dict[int, dict] = {}

            def dl_for(bucket: int, doc_ids: np.ndarray) -> np.ndarray:
                m = dl_cache.get(bucket)
                if m is None:
                    m = read_doc_stats_bucket(index_dir, bucket) or {
                        "docID": np.empty(0, np.int64),
                        "dl": np.empty(0, np.int64),
                    }
                    o = np.argsort(m["docID"], kind="stable")
                    m = {"docID": m["docID"][o], "dl": m["dl"][o]}
                    dl_cache[bucket] = m
                return lookup_dl(m["docID"], m["dl"], doc_ids, strict)

            def encode_groups(pdf: pd.DataFrame, hold_last: bool):
                nonlocal carry
                if carry is not None:
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                    carry = None
                if len(pdf) == 0:
                    return None
                bkt_arr = pdf["doc_bucket"].to_numpy()
                sub_arr = pdf["doc_sub"].to_numpy()
                term_arr = pdf["term"].to_numpy()
                change = np.flatnonzero(
                    (bkt_arr[1:] != bkt_arr[:-1])
                    | (sub_arr[1:] != sub_arr[:-1])
                    | (term_arr[1:] != term_arr[:-1])
                ) + 1
                bounds = np.concatenate(([0], change, [len(pdf)]))
                last_start = bounds[-2] if hold_last and len(bounds) > 1 else len(pdf)
                if hold_last:
                    carry = pdf.iloc[last_start:].copy()
                    pdf = pdf.iloc[:last_start]
                    bounds = bounds[bounds <= last_start]
                rows = []
                buckets = pdf["doc_bucket"].to_numpy()
                subs = pdf["doc_sub"].to_numpy()
                terms = pdf["term"].to_numpy()
                docs = pdf["docID"].to_numpy()
                tfs = pdf["tf"].to_numpy().astype(np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    if e <= s:
                        continue
                    bkt = int(buckets[s])
                    d = docs[s:e]
                    t = tfs[s:e]
                    dl = dl_for(bkt, d).astype(np.float64)
                    # idf-independent tf-normalization: the block max is
                    # multiplied by idf at query time (wand.py)
                    score = t * (k1 + 1.0) / (t + k1 * (1 - b + b * dl / avgdl))
                    payload, m = encode_postings(
                        d, t.astype(np.int64), score.astype(np.float32), block_size
                    )
                    rows.append(
                        {
                            "doc_bucket": bkt,
                            "doc_sub": int(subs[s]),
                            "term": str(terms[s]),
                            "n": int(e - s),
                            "first_doc": m.first_doc.tolist(),
                            "last_doc": m.last_doc.tolist(),
                            "bn": m.n.tolist(),
                            "offsets": m.offset.tolist(),
                            "doc_bytes": m.doc_bytes.tolist(),
                            "max_score": m.max_score.tolist(),
                            "payload": payload,
                        }
                    )
                return pd.DataFrame(rows) if rows else None

            for pdf in batches:
                out = encode_groups(pdf, hold_last=True)
                if out is not None and len(out):
                    yield out
            if carry is not None:
                tail = encode_groups(
                    pd.DataFrame(
                        columns=["doc_bucket", "doc_sub", "term", "docID", "tf"]
                    ),
                    hold_last=False,
                )
                if tail is not None and len(tail):
                    yield tail

        segments = enc_input.mapInPandas(encode_stream, schema=SEGMENT_SCHEMA)
        (
            segments.write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{self.dir}/segments")
        )
        # Per-partition lineage from parquet footers — counters without a
        # Spark job (segments built, postings merged, compressed bytes).
        lineage = _segment_lineage(f"{self.dir}/segments", spark=self.spark)
        n_postings, _ = _footer_rows(f"{merged_dir}/postings", spark=self.spark)
        lineage["postings_merged"] = n_postings
        _atomic_write_json(f"{self.dir}/lineage_segments.json", lineage)
        self._commit(
            "finalize",
            segments_built=lineage["segments_built"],
            postings_merged=n_postings,
            bytes_compressed=lineage["bytes_compressed"],
            per_bucket=lineage["per_bucket"],
            n_docs=n_docs,
            avgdl=avgdl,
        )

    def _encode_input(self, postings: DataFrame) -> DataFrame:
        """The segment encoder's input: a pure projection of the merged
        postings — no join, no exchange.  Factored out so the plan test
        can pin that no BroadcastExchange (e.g. of the full vocabulary)
        ever enters the encode stage."""
        return postings.select("doc_bucket", "doc_sub", "term", "docID", "tf")

    # -- convenience --------------------------------------------------------

    def docs_dim(self) -> DataFrame:
        """(docID, repo, path, commit, lang, content_sha) — virtual union
        of the runs' doc tables (no physical rewrite)."""
        paths = [
            f"{self.dir}/runs/{m['run_id']}/docs"
            for m in self.manifests()
            if m["unit"].startswith("run-")
        ]
        return self._read_union(paths)

    def build(
        self,
        corpus: DataFrame,
        n_runs: int = 1,
        fanin: int = 8,
        dedup_within_run: bool = True,
    ) -> None:
        """Full build. ``n_runs > 1`` splits the corpus to exercise the
        merge-wave machinery (and models incremental ingest batches)."""
        if n_runs == 1:
            self.add_run(corpus, "run00000", dedup_within_run)
        else:
            slices = corpus.randomSplit([1.0] * n_runs, seed=42)
            for i, sl in enumerate(slices):
                self.add_run(sl, f"run{i:05d}", dedup_within_run)
        self.merge_all(fanin=fanin)
        self.finalize()

    def meta(self) -> dict:
        return fsio.read_json(f"{self.dir}/_meta.json")


def purge_index(index_dir: str) -> None:
    """S13 purge: drop every index artifact (segments, stats, runs,
    merges, manifests) — the reference's cascade purge + VACUUM
    (``/root/reference/db/db_manager.py:145-165``)."""
    for sub in ("segments", "doc_stats", "term_stats", "docs", "runs",
                "merged", "manifests", "lineage_segments.json", "_meta.json"):
        fsio.rmtree(f"{index_dir}/{sub}")


def purge_run(index_dir: str, run_id: str) -> None:
    """S13 per-source purge: drop one run and the downstream merge /
    finalize artifacts it contributed to (they must rebuild)."""
    fsio.rmtree(f"{index_dir}/runs/{run_id}")
    mdir = f"{index_dir}/manifests"
    for fn in fsio.listdir(mdir):
        # exact manifest name for the purged run — a prefix match would
        # also delete manifests of runs whose id merely extends run_id
        # (purging "stream0001" must not touch "stream00010")
        if fn == f"run-{run_id}.json" or fn.startswith(
            ("merge-", "merged-final", "finalize")
        ):
            fsio.remove(f"{mdir}/{fn}")
    fsio.rmtree(f"{index_dir}/merged")
