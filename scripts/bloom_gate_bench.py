#!/usr/bin/env python
"""Bloom-gated cross-run dedup at scale: > broadcast_seen_max prior docIDs.

The incremental-ingest gate (``IndexBuilder._gate_new_docs``) switches
from a broadcast anti-join to a distributed Bloom pre-gate once the
prior-run history exceeds ``broadcast_seen_max`` (2M keys by default).
The unit test pins bloom==broadcast equivalence at toy scale; this bench
engages the Bloom path against SEEN_DOCS (default 3M) prior docIDs with
an OVERLAP_FRACTION-overlapping incoming run and records the gate's wall
time, the filter geometry, and how many rows actually paid the precise
anti-join (the shuffled volume tracks overlap, not run size — the scale
claim).

Usage: python scripts/bloom_gate_bench.py [seen_docs] [run_docs]
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

SEEN_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
RUN_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
OVERLAP_FRACTION = 0.5


def main() -> None:
    from docinsight_spark.hostload import wait_quiet

    gate = wait_quiet()
    print(f"# gate {gate}", file=sys.stderr)

    scratch = os.environ.get("BENCH_SCRATCH") or (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    )
    os.environ.setdefault("SPARK_LOCAL_SCRATCH", os.path.join(scratch, "spark_local"))
    os.makedirs(os.environ["SPARK_LOCAL_SCRATCH"], exist_ok=True)

    from pyspark.sql import functions as F

    from docinsight_spark.corpus import make_corpus
    from docinsight_spark.index.bloom import bloom_params
    from docinsight_spark.index.builder import IndexBuilder
    from docinsight_spark.operators.postings import with_doc_id
    from docinsight_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bloom_gate_bench", cores=cores)
    work = tempfile.mkdtemp(prefix="bloom_gate_", dir=scratch)
    try:
        # materialize the prior history's docID side (what add_run reads
        # back from runs/*/docs parquet) — metadata columns only
        t0 = time.time()
        with_doc_id(
            make_corpus(spark, SEEN_DOCS, partitions=cores * 4)
        ).select("docID", "repo", "path", "commit", "lang", "content_sha").write.mode(
            "overwrite"
        ).parquet(f"{work}/seen_docs")
        seed_s = time.time() - t0
        seen = spark.read.parquet(f"{work}/seen_docs").select("docID")

        # incoming run: OVERLAP_FRACTION of its rows repeat prior docIDs
        overlap = int(RUN_DOCS * OVERLAP_FRACTION)
        incoming = make_corpus(
            spark, RUN_DOCS, partitions=cores * 2, start=SEEN_DOCS - overlap
        )
        docs2 = with_doc_id(incoming).dropDuplicates(["docID"])
        docs2.write.mode("overwrite").parquet(f"{work}/incoming")
        docs2 = spark.read.parquet(f"{work}/incoming")

        b = IndexBuilder(spark, f"{work}/idx", n_buckets=32,
                         broadcast_seen_max=2_000_000)
        t0 = time.time()
        gated = b._gate_new_docs(docs2, seen, SEEN_DOCS)
        n_new = gated.count()
        gate_s = time.time() - t0
        # rows that paid the precise anti-join = bloom-positive rows
        flagged = b._gate_cache[0]
        n_maybe = flagged.filter(F.col("_maybe_seen")).count()
        for c in b._gate_cache:
            c.unpersist()
        b._gate_cache.clear()
        m_bits, k = bloom_params(SEEN_DOCS)
        print(
            json.dumps(
                {
                    "seen_docs": SEEN_DOCS,
                    "run_docs": RUN_DOCS,
                    "overlap_docs": overlap,
                    "cores": cores,
                    "seed_sec": round(seed_s, 2),
                    "gate_sec": round(gate_s, 2),
                    "new_docs": n_new,
                    "precise_path_rows": n_maybe,
                    "precise_path_fraction_of_run": round(n_maybe / RUN_DOCS, 4),
                    "bloom_bits": m_bits,
                    "bloom_mb": round(m_bits / 8 / 1e6, 1),
                    "bloom_hashes": k,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
