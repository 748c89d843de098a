#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Runs the engine's flagship workloads at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``:

* ``index_build``   — full physical index build (tokenize → postings →
                      merge → block-max segments) over a deterministic
                      synthetic source-code corpus (BASELINE input
                      shape), plus files/sec derived metric
* ``wand_query``    — batch BM25 top-10 via the block-max fast path
* ``bm25_oracle``   — exact DataFrame BM25 top-10 on the sf documents
* ``minhash_dedup`` — MinHash+LSH near-dup sweep on sf documents
* ``cosine_topk``   — brute-force embedding ANN baseline
* ``originality``   — scoring pipeline (normalize→fuse→gate→decay→
                      spans→roll-up) over sf events

Scaling evidence (local[8] vs local[32]) is produced separately by
``scripts/scaling_bench.py`` and recorded in ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# corpus files for the index-build benchmark (the BASELINE input shape)
N_FILES = int(os.environ.get("BENCH_CORPUS_FILES", "20000"))


def main() -> None:
    from pyspark.sql import functions as F

    from docinsight_spark.corpus import make_corpus, make_queries
    from docinsight_spark.index.builder import IndexBuilder
    from docinsight_spark.index.wand import wand_search
    from docinsight_spark.session import get_spark

    spark = get_spark(app_name="docinsight_bench", cores=CPUS)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    try:
        with open("/proc/loadavg") as f:
            extras["loadavg_start"] = float(f.read().split()[0])
    except OSError:
        pass

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)

        return _T()

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        # -- materialize the input table once (the engine's input is a
        #    stored Iceberg/parquet table, not a generator) ----------------
        with timed("datagen"):
            make_corpus(spark, N_FILES, partitions=int(CPUS) * 2).write.mode(
                "overwrite"
            ).parquet(corpus_dir)
        corpus = spark.read.parquet(corpus_dir)

        # -- index build over the synthetic code corpus -------------------
        with timed("index_build"):
            b = IndexBuilder(spark, idx_dir, n_buckets=32)
            b.build(corpus, n_runs=4, fanin=2)
        extras["index_build_files_per_sec"] = round(
            N_FILES / timings["index_build"], 2
        )
        extras["index_n_files"] = N_FILES

        # -- WAND query batch over the built index -------------------------
        queries = make_queries(spark, corpus_n=N_FILES, n_queries=40)
        with timed("wand_query"):
            res = wand_search(spark, idx_dir, queries, k=10)
            n = res.count()
        extras["wand_result_rows"] = n
        extras["wand_qps"] = round(40 / timings["wand_query"], 2)

        # -- model-quality metric: WAND vs exact oracle rank correlation
        #    (reference analog: scripts/evaluate_models.py Spearman) -------
        from docinsight_spark.evaluation import (
            oracle_from_index,
            per_query_rank_correlation,
            rank_correlation_summary,
        )

        with timed("quality_eval"):
            oracle = oracle_from_index(spark, idx_dir, queries, k=10)
            corr = rank_correlation_summary(
                per_query_rank_correlation(res, oracle)
            )
        extras["spearman_wand_vs_oracle"] = round(corr["mean_spearman"], 6)
        extras["min_spearman"] = round(corr["min_spearman"], 6)
        extras["pearson_wand_vs_oracle"] = round(corr["mean_pearson"], 6)

        # -- single-query latency percentiles (BASELINE: p50/p95) ----------
        # server mode: resident index (the reference serves queries from a
        # loaded FAISS index; Searcher is the analog)
        from docinsight_spark.index.wand import Searcher

        searcher = Searcher(spark, idx_dir, cache=True)
        lat = []
        for qid in range(12):
            one = queries.filter(F.col("query_id") == qid)
            t0 = time.time()
            searcher.search(one, k=10).count()
            lat.append(time.time() - t0)
        lat = lat[2:]  # drop warmup
        lat.sort()
        extras["query_p50_sec"] = round(lat[len(lat) // 2], 3)
        extras["query_p95_sec"] = round(lat[int(len(lat) * 0.95)], 3)

        # -- contract headline queries at SF_DIR ---------------------------
        from docinsight_spark.contract import QUERIES

        heads = {
            "bm25_oracle": "bm25_topk",
            "minhash_dedup": "minhash_lsh_neardup",
            "cosine_topk": "embedding_cosine_topk",
            "originality": "originality_report",
        }
        for label, qname in heads.items():
            with timed(label):
                QUERIES[qname](spark, SF_DIR).count()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()

    try:  # shared-host context: record machine load with the numbers
        with open("/proc/loadavg") as f:
            extras["loadavg_end"] = float(f.read().split()[0])
    except OSError:
        pass
    total = round(sum(v for k, v in timings.items() if k != "datagen"), 3)
    out = {
        "metric": "headline-suite wall time (index build + BM25 WAND/oracle "
        "+ near-dup + ANN + originality)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extras": extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
