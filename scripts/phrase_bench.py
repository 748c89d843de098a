#!/usr/bin/env python
"""Positional-index cost + phrase/prefix query latency.

Measures, over the bench corpus shape (N_FILES synthetic code files):

* build overhead of ``positions=True`` vs a plain build (same corpus,
  same geometry) — wall ratio and merged-postings storage ratio;
* exact phrase top-10 latency over a batch of real corpus bigrams /
  trigrams (p50/p95, qps);
* prefix (wildcard) top-10 latency over dictionary expansions.

The north-rule claim this evidences: phrase search stays bounded by
the phrase terms' posting sizes (term IN-list pushdown + column-pruned
candidate pre-pass), so positional retrieval adds a storage/buy-in cost
at BUILD time, not a corpus-wide cost at QUERY time.

Usage: python scripts/phrase_bench.py [n_files] [n_queries]
→ JSON on stdout.  Host-gated like every bench in this repo.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from docinsight_spark.hostload import wait_quiet

    gate = wait_quiet()
    print(f"# gate {gate}", file=sys.stderr)

    scratch = os.environ.get("BENCH_SCRATCH") or (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    )
    os.environ.setdefault("SPARK_LOCAL_SCRATCH", os.path.join(scratch, "spark_local"))
    os.makedirs(os.environ["SPARK_LOCAL_SCRATCH"], exist_ok=True)

    import pandas as pd

    from docinsight_spark.corpus import make_corpus
    from docinsight_spark.functions.tokenizer import tokenize_code_pandas
    from docinsight_spark.index.builder import IndexBuilder, read_manifests
    from docinsight_spark.index.phrase import phrase_search
    from docinsight_spark.index.wand import prefix_search
    from docinsight_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="phrase_bench", cores=cores)
    plain = tempfile.mkdtemp(prefix="phb_plain_", dir=scratch)
    posd = tempfile.mkdtemp(prefix="phb_pos_", dir=scratch)
    cdir = tempfile.mkdtemp(prefix="phb_corpus_", dir=scratch)
    out: dict = {"n_files": N_FILES, "cores": cores, "gate": gate}
    try:
        make_corpus(spark, N_FILES, seed=5, partitions=cores * 2).write.mode(
            "overwrite"
        ).parquet(cdir + "/c")
        corpus = spark.read.parquet(cdir + "/c")

        # JVM/JIT + page-cache warm-up: the first build of a session runs
        # ~20 % slower regardless of configuration, which would be
        # misattributed to whichever variant goes first
        warm = tempfile.mkdtemp(prefix="phb_warm_", dir=scratch)
        IndexBuilder(spark, warm, n_buckets=32).build(corpus)
        shutil.rmtree(warm, ignore_errors=True)

        t0 = time.time()
        IndexBuilder(spark, plain, n_buckets=32).build(corpus)
        out["build_plain_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        IndexBuilder(spark, posd, n_buckets=32, positions=True).build(corpus)
        out["build_positional_sec"] = round(time.time() - t0, 3)
        out["build_overhead"] = round(
            out["build_positional_sec"] / out["build_plain_sec"], 3
        )

        def merged_bytes(idx: str) -> int:
            final = [
                m for m in read_manifests(idx) if m["unit"] == "merged-final"
            ][0]
            return _du(final["source"])

        out["merged_bytes_plain"] = merged_bytes(plain)
        out["merged_bytes_positional"] = merged_bytes(posd)
        out["storage_overhead"] = round(
            out["merged_bytes_positional"] / max(out["merged_bytes_plain"], 1), 3
        )

        # real phrases: adjacent token pairs/triples from the corpus
        # GENERATOR (deterministic across partitionings/runs — limit()
        # would sample different docs per run)
        from docinsight_spark.corpus import gen_file

        pdf = pd.DataFrame(
            [gen_file(i, 5) for i in range(N_QUERIES * 3)]
        )
        toks = tokenize_code_pandas(pdf["content"], pdf["lang"])
        phrases: list[tuple[int, str]] = []
        for i, ts in enumerate(toks):
            if len(phrases) >= N_QUERIES:
                break
            ts = list(ts)
            if len(ts) < 8:
                continue
            n = 2 + (i % 2)  # alternate bigrams / trigrams
            start = (i * 13) % (len(ts) - n)
            phrases.append((len(phrases), " ".join(ts[start : start + n])))

        lat: list[float] = []
        rows = 0
        t_all = time.time()
        for q, text in phrases:
            t0 = time.time()
            rows += phrase_search(spark, posd, [(q, text)], k=10).count()
            lat.append(time.time() - t0)
        wall = time.time() - t_all
        lat.sort()
        out["phrase_queries"] = len(phrases)
        out["phrase_result_rows"] = rows
        out["phrase_p50_sec"] = round(lat[len(lat) // 2], 3)
        out["phrase_p95_sec"] = round(lat[int(len(lat) * 0.95) - 1], 3)
        out["phrase_qps"] = round(len(phrases) / wall, 2)

        # batched: the whole phrase set in ONE plan (the offline regime —
        # per-query latency above is dominated by Spark's per-job fixed
        # cost, which a batch amortizes)
        t0 = time.time()
        batch_rows = phrase_search(spark, posd, phrases, k=10).count()
        out["phrase_batch_sec"] = round(time.time() - t0, 3)
        out["phrase_batch_rows"] = batch_rows
        out["phrase_batch_qps"] = round(
            len(phrases) / out["phrase_batch_sec"], 2
        )

        # prefix latency: 2-char prefixes of real tokens
        prefs = [
            (i, t[:2])
            for i, (_, text) in enumerate(phrases[:10])
            for t in [text.split()[0]]
        ]
        lat2: list[float] = []
        rows2 = 0
        t_all = time.time()
        for q, p in prefs:
            t0 = time.time()
            rows2 += prefix_search(
                spark, posd, [(q, p)], k=10, max_expansions=16
            ).count()
            lat2.append(time.time() - t0)
        wall2 = time.time() - t_all
        lat2.sort()
        out["prefix_queries"] = len(prefs)
        out["prefix_result_rows"] = rows2
        out["prefix_p50_sec"] = round(lat2[len(lat2) // 2], 3)
        out["prefix_qps"] = round(len(prefs) / wall2, 2)
        print(json.dumps(out))
    finally:
        spark.stop()
        for d in (plain, posd, cdir):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
