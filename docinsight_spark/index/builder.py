"""Physical index build: runs → merge waves → block-max segments.

Replaces the reference's index build
(``/root/reference/index/index_manager.py:44-122``), which embeds every
chunk and then collects *all* vectors into driver RAM
(``index_manager.py:84-100``).  Here every stage is a distributed job
and the driver only moves manifests:

1. **add_run** — tokenize a corpus slice → (term, docID, tf) postings,
   document-bucketed (``doc_bucket = pmod(docID, B)``), written sorted;
   new docs are anti-joined against already-indexed runs (the Spark
   analog of the reference's ``WHERE embedding IS NULL`` incremental
   resume, ``embeddings/embedder.py:147-158``, and its SHA-256 dedup
   gate, ``ingestion/pipeline_ingest.py:265-269``).
2. **merge_all** — hierarchical merge waves: fan-in groups of runs are
   re-partitioned by ``doc_bucket`` and sort-merged within partitions
   (repartition-and-sort-within-partitions), halving the run count per
   wave.  Each wave step is manifest-guarded → a restarted build skips
   completed waves.
3. **finalize** — global stats (salted df aggregation), then a
   streaming ``mapInPandas`` encoder turns each bucket's sorted postings
   into delta-gap + varint segments with per-block skip data and
   block-max BM25 scores.  Document length is read bucket-locally inside
   the kernel (co-located parquet read) instead of shuffling a join.

**Why document-partitioned (not term-partitioned):** each bucket holds
the *complete* posting lists for its documents, so top-k scoring runs
shard-locally (block-max WAND per bucket) and only B×k candidate rows
shuffle for the global merge.  Hot terms spread evenly across buckets
by construction — the doc hash, not the term, picks the partition — so
the worst skew a hot term can cause is bounded by bucket size.

Lineage: every unit writes ``manifests/<unit>.json`` atomically
(tmp + rename) with per-partition counters (segments built, postings
merged, bytes compressed) — the engine's analog of the reference's
``ingestion_runs`` lineage table (``/root/reference/db/schema.sql:43-54``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docinsight_spark import BM25_B, BM25_K1
from docinsight_spark.index.codec import BLOCK_SIZE, encode_postings
from docinsight_spark.operators.postings import (
    build_postings,
    term_stats,
    with_doc_id,
)

SEGMENT_SCHEMA = (
    "doc_bucket int, term string, df long, n long, "
    "first_doc array<long>, last_doc array<long>, bn array<int>, "
    "offsets array<long>, doc_bytes array<int>, max_score array<float>, "
    "payload binary"
)


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, path)


def read_doc_stats_bucket(index_dir: str, bucket: int) -> dict | None:
    """Bucket-local doc-length map, read inside kernels via pyarrow.

    On a cluster this is a distributed-FS read of one small co-located
    partition — no shuffle. Returns {docID -> dl} as numpy arrays."""
    import pyarrow.parquet as pq

    path = f"{index_dir}/doc_stats/doc_bucket={bucket}"
    if not os.path.exists(path):
        return None
    t = pq.read_table(path, columns=["docID", "dl"])
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
        block_size: int = BLOCK_SIZE,
        k1: float = BM25_K1,
        b: float = BM25_B,
        code_aware: bool = True,
    ):
        self.spark = spark
        self.dir = index_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.block_size = block_size
        self.k1, self.b = k1, b
        self.code_aware = code_aware
        os.makedirs(f"{self.dir}/manifests", exist_ok=True)

    # -- lineage -----------------------------------------------------------

    def _mpath(self, unit: str) -> str:
        return f"{self.dir}/manifests/{unit}.json"

    def _done(self, unit: str) -> bool:
        p = self._mpath(unit)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def _commit(self, unit: str, **counters) -> None:
        _atomic_write_json(
            self._mpath(unit),
            {"unit": unit, "status": "complete", "ts": time.time(), **counters},
        )

    def manifests(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(f"{self.dir}/manifests")):
            with open(f"{self.dir}/manifests/{fn}") as f:
                out.append(json.load(f))
        return out

    def _read_union(self, paths: list[str]) -> DataFrame:
        """Union several (possibly partitioned) parquet datasets — separate
        loads avoid CONFLICTING_DIRECTORY_STRUCTURES on sibling roots."""
        dfs = [self.spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # -- stage 1: runs -----------------------------------------------------

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "doc_bucket", F.pmod(F.col("docID"), F.lit(self.n_buckets)).cast("int")
        )

    def add_run(self, corpus: DataFrame, run_id: str) -> None:
        """Tokenize one corpus slice into a bucketed, sorted postings run."""
        unit = f"run-{run_id}"
        if self._done(unit):
            return
        docs = with_doc_id(corpus)
        # Incremental gate: drop docs already indexed by earlier runs
        # (reference analogs: D1 sha dedup + D6 unindexed = all − indexed).
        prior = [m["run_id"] for m in self.manifests() if m["unit"].startswith("run-")]
        docs = docs.dropDuplicates(["docID"])
        if prior:
            seen = self._read_union(
                [f"{self.dir}/runs/{r}/docs" for r in prior]
            ).select("docID")
            docs = docs.join(seen, "docID", "left_anti")

        postings = self._bucketed(build_postings(docs, code_aware=self.code_aware))
        base = f"{self.dir}/runs/{run_id}"
        (
            postings.repartition(self.n_buckets, "doc_bucket")
            .sortWithinPartitions("doc_bucket", "term", "docID")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{base}/postings")
        )
        p = self.spark.read.parquet(f"{base}/postings")
        (
            p.groupBy("doc_bucket", "docID")
            .agg(F.sum("tf").alias("dl"))
            .repartition(self.n_buckets, "doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{base}/doc_stats")
        )
        docs.select("docID", "repo", "path", "commit", "lang", "content_sha").write.mode(
            "overwrite"
        ).parquet(f"{base}/docs")
        per_bucket = {
            str(r["doc_bucket"]): r["n"]
            for r in p.groupBy("doc_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n_docs = self.spark.read.parquet(f"{base}/docs").count()
        self._commit(
            unit,
            run_id=run_id,
            postings=sum(per_bucket.values()),
            postings_per_bucket=per_bucket,
            docs=n_docs,
        )

    # -- stage 2: hierarchical merge waves ---------------------------------

    def merge_all(self, fanin: int = 8) -> str:
        """Merge runs pairwise/fan-in-wise until one remains; resumable."""
        if self._done("merged-final"):
            return [m for m in self.manifests() if m["unit"] == "merged-final"][0][
                "source"
            ]
        runs = sorted(
            m["run_id"] for m in self.manifests() if m["unit"].startswith("run-")
        )
        if not runs:
            raise ValueError("no runs to merge")
        sources = [f"{self.dir}/runs/{r}" for r in runs]
        wave = 0
        while len(sources) > 1:
            groups = [sources[i : i + fanin] for i in range(0, len(sources), fanin)]
            nxt = []
            for gi, grp in enumerate(groups):
                out = f"{self.dir}/merged/wave{wave}/g{gi}"
                unit = f"merge-w{wave}-g{gi}"
                if len(grp) == 1:
                    nxt.append(grp[0])
                    continue
                if not self._done(unit):
                    self._merge_group(grp, out, unit)
                nxt.append(out)
            sources = nxt
            wave += 1
        self._commit("merged-final", source=sources[0], waves=wave)
        return sources[0]

    def _merge_group(self, grp: list[str], out: str, unit: str) -> None:
        """One merge step: repartition-and-sort-within-partitions."""
        postings = self._read_union([f"{s}/postings" for s in grp])
        (
            postings.repartition(self.n_buckets, "doc_bucket")
            .sortWithinPartitions("doc_bucket", "term", "docID")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{out}/postings")
        )
        ds = self._read_union([f"{s}/doc_stats" for s in grp])
        (
            ds.repartition(self.n_buckets, "doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{out}/doc_stats")
        )
        self._read_union([f"{s}/docs" for s in grp]).write.mode(
            "overwrite"
        ).parquet(f"{out}/docs")
        merged = self.spark.read.parquet(f"{out}/postings")
        stats = merged.groupBy("doc_bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        self._commit(
            unit,
            inputs=grp,
            postings_merged=sum(r["n"] for r in stats),
            postings_per_bucket={str(r["doc_bucket"]): r["n"] for r in stats},
        )

    # -- stage 3: finalize (stats + segment encode) -------------------------

    def finalize(self, merged_dir: str | None = None) -> None:
        if self._done("finalize"):
            return
        if merged_dir is None:
            final = [m for m in self.manifests() if m["unit"] == "merged-final"]
            merged_dir = final[0]["source"] if final else f"{self.dir}/runs/" + sorted(
                m["run_id"] for m in self.manifests() if m["unit"].startswith("run-")
            )[0]

        # Promote merged doc_stats / docs to index root.
        ds = self.spark.read.parquet(f"{merged_dir}/doc_stats")
        (
            ds.repartition(self.n_buckets, "doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{self.dir}/doc_stats")
        )
        self.spark.read.parquet(f"{merged_dir}/docs").write.mode("overwrite").parquet(
            f"{self.dir}/docs"
        )
        postings = self.spark.read.parquet(f"{merged_dir}/postings")

        # Global stats: salted df aggregation (hot-term skew defused).
        ts = term_stats(postings.select("term", "docID", "tf"))
        ts.write.mode("overwrite").parquet(f"{self.dir}/term_stats")
        row = ds.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        meta = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
            "k1": self.k1,
            "b": self.b,
            "code_aware": self.code_aware,
            "version": 1,
        }
        _atomic_write_json(f"{self.dir}/_meta.json", meta)

        # Segment encode: df joins in (broadcast if small, AQE otherwise);
        # dl is read bucket-locally inside the kernel — no dstats shuffle.
        enc_input = (
            self.spark.read.parquet(f"{self.dir}/term_stats")
            .join(postings, "term")
            .select("doc_bucket", "term", "df", "docID", "tf")
        )
        index_dir, k1, b, block_size = self.dir, self.k1, self.b, self.block_size

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
                pos = np.searchsorted(m["docID"], doc_ids)
                pos = np.clip(pos, 0, max(len(m["docID"]) - 1, 0))
                found = len(m["docID"]) > 0
                dl = m["dl"][pos] if found else np.ones(len(doc_ids), np.int64)
                return dl

            def encode_groups(pdf: pd.DataFrame, hold_last: bool):
                nonlocal carry
                if carry is not None:
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                    carry = None
                if len(pdf) == 0:
                    return None
                bkt_arr = pdf["doc_bucket"].to_numpy()
                term_arr = pdf["term"].to_numpy()
                change = np.flatnonzero(
                    (bkt_arr[1:] != bkt_arr[:-1]) | (term_arr[1:] != term_arr[:-1])
                ) + 1
                bounds = np.concatenate(([0], change, [len(pdf)]))
                last_start = bounds[-2] if hold_last and len(bounds) > 1 else len(pdf)
                if hold_last:
                    carry = pdf.iloc[last_start:].copy()
                    pdf = pdf.iloc[:last_start]
                    bounds = bounds[bounds <= last_start]
                rows = []
                buckets = pdf["doc_bucket"].to_numpy()
                terms = pdf["term"].to_numpy()
                dfs = pdf["df"].to_numpy()
                docs = pdf["docID"].to_numpy()
                tfs = pdf["tf"].to_numpy().astype(np.float64)
                for s, e in zip(bounds[:-1], bounds[1:]):
                    if e <= s:
                        continue
                    bkt = int(buckets[s])
                    d = docs[s:e]
                    t = tfs[s:e]
                    dl = dl_for(bkt, d).astype(np.float64)
                    idf = float(np.log((n_docs - dfs[s] + 0.5) / (dfs[s] + 0.5) + 1.0))
                    score = idf * t * (k1 + 1.0) / (t + k1 * (1 - b + b * dl / avgdl))
                    payload, m = encode_postings(
                        d, t.astype(np.int64), score.astype(np.float32), block_size
                    )
                    rows.append(
                        {
                            "doc_bucket": bkt,
                            "term": str(terms[s]),
                            "df": int(dfs[s]),
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
            tail = encode_groups(pd.DataFrame(columns=["doc_bucket", "term", "df", "docID", "tf"]), hold_last=False) if carry is not None else None
            if tail is not None and len(tail):
                yield tail

        segments = (
            enc_input.repartition(self.n_buckets, "doc_bucket")
            .sortWithinPartitions("doc_bucket", "term", "docID")
            .mapInPandas(encode_stream, schema=SEGMENT_SCHEMA)
        )
        (
            segments.repartition("doc_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(f"{self.dir}/segments")
        )
        seg = self.spark.read.parquet(f"{self.dir}/segments")
        lineage = seg.groupBy("doc_bucket").agg(
            F.count(F.lit(1)).alias("segments_built"),
            F.sum("n").alias("postings_merged"),
            F.sum(F.length("payload")).alias("bytes_compressed"),
        )
        lineage.write.mode("overwrite").parquet(f"{self.dir}/lineage_segments")
        tot = lineage.agg(
            F.sum("segments_built"), F.sum("postings_merged"), F.sum("bytes_compressed")
        ).collect()[0]
        self._commit(
            "finalize",
            segments_built=int(tot[0]),
            postings_merged=int(tot[1]),
            bytes_compressed=int(tot[2]),
            n_docs=n_docs,
            avgdl=avgdl,
        )

    # -- convenience --------------------------------------------------------

    def build(self, corpus: DataFrame, n_runs: int = 1, fanin: int = 8) -> None:
        """Full build. ``n_runs > 1`` splits the corpus to exercise the
        merge-wave machinery (and models incremental ingest batches)."""
        if n_runs == 1:
            self.add_run(corpus, "run00000")
        else:
            slices = corpus.randomSplit([1.0] * n_runs, seed=42)
            for i, sl in enumerate(slices):
                self.add_run(sl, f"run{i:05d}")
        self.merge_all(fanin=fanin)
        self.finalize()

    def meta(self) -> dict:
        with open(f"{self.dir}/_meta.json") as f:
            return json.load(f)
