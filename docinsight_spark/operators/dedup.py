"""Deduplication family for large-scale training-data pipelines.

The reference dedups only by exact SHA-256
(``/root/reference/db/db_manager.py:215-217``); a 100 TB corpus engine
additionally needs near-duplicate detection.  Everything here is pure
DataFrame algebra (hashes via built-in ``md5``/``sha2``/``xxhash64``,
set ops via joins) — no UDFs, so the whole family stays inside
whole-stage codegen and scales with ordinary shuffle tuning.

Scale notes (10^12 docs):
* shingling explodes ~dl rows/doc — same magnitude as the postings
  build, handled by the same partitioning;
* the LSH self-join is banded: join key = (band_id, band_hash), so
  candidate pairs are generated per-bucket instead of n²;
* hot buckets (boilerplate shingles) are capped via a bucket-size
  guard before the pair join (salting analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docinsight_spark.functions.tokenizer import simple_tokens_col


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One keeper row per distinct content hash (D1)."""
    w = Window.partitionBy("content_sha").orderBy(id_col)
    return (
        df.withColumn("content_sha", F.sha2(F.col(text_col), 256))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles per doc.

    Implementation note (round 7, MEASURED): two shuffle-free in-row
    constructions were built and benchmarked against this window form —
    ``transform(sequence(...), i -> concat_ws(slice(...)))`` (3-4×
    slower: per-element interpreted slice+concat) and a ``zip_with``
    chain over n shifted slices (wins the isolated construction, 0.74 s
    vs 0.90 s on sf0.1 documents with a noop sink, but LOSES pipeline-
    wide: near-dup store add 2.9 s vs 1.5 s, probe 3.4 s vs 2.4 s,
    minhash sweep 2.3 s vs 1.9 s).  The consumers evaluate the shingle
    relation up to four times (signatures, candidate join both sides,
    sizes); the window's exchange is reused across all of them — an
    implicit materialize-once point — while the in-row form re-tokenizes
    per consumer.  Guide §1.1's empirical loop keeps the window."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(simple_tokens_col(text_col)).alias("pos", "term"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    gram = F.concat_ws(" ", *[
        F.col("term") if i == 0 else F.lead("term", i).over(w) for i in range(n)
    ])
    last = F.lead("term", n - 1).over(w)
    return (
        toks.withColumn("_l", last)
        .withColumn("shingle", gram)
        .filter(F.col("_l").isNotNull())
        .select("id", "shingle")
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 12, seed_prefix: str = "mh"
) -> DataFrame:
    """(id, h0..h{n-1}) — MinHash signature per doc.

    Permutation *i* is simulated by ``min(md5(i || ':' || shingle))``
    (lexicographic min of a keyed hash) — portable across engines, so
    the DuckDB oracle reproduces it bit-for-bit.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{seed_prefix}{i}:"), F.col("shingle")))).alias(
            f"h{i}"
        )
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, n_hashes: int = 12, bands: int = 4, max_bucket: int = 50
) -> DataFrame:
    """(id_a, id_b) — banded-LSH candidate pairs (id_a < id_b).

    rows/band = n_hashes/bands; a pair is a candidate iff some band's
    concatenated minhashes collide.  ``max_bucket`` drops degenerate
    buckets (boilerplate) before the self-join — the skew guard.
    """
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *cols)).alias("bkey"))
        )
    banded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("band")
    ).select("id", F.col("band.band_id").alias("band_id"), F.col("band.bkey").alias("bkey"))
    sz = Window.partitionBy("band_id", "bkey")
    banded = banded.withColumn("_n", F.count(F.lit(1)).over(sz)).filter(
        F.col("_n") <= max_bucket
    )
    a = banded.select(F.col("id").alias("id_a"), "band_id", "bkey")
    b = banded.select(F.col("id").alias("id_b"), "band_id", "bkey")
    return (
        a.join(b, ["band_id", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    sh: DataFrame, pairs: DataFrame | None = None, threshold: float = 0.0
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact n-gram Jaccard similarity.

    With ``pairs`` given (e.g. LSH candidates) intersections are computed
    **only for those pairs** (candidates ⋈ shingles ⋈ shingles — the
    shingle self-join never materializes all co-occurring pairs, which
    is what makes LSH worth anything at 10^12 docs).  Without ``pairs``
    all shingle-sharing pairs are considered (small-corpus exact mode).
    """
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    if pairs is not None:
        inter = (
            pairs.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidate join → exact Jaccard verify ≥ threshold."""
    sh = shingles(df, id_col, text_col, n)
    sig = minhash_signatures(sh, n_hashes)
    cand = lsh_candidate_pairs(sig, n_hashes, bands)
    return ngram_jaccard(sh, pairs=cand, threshold=threshold)


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash) — tf-weighted SimHash, portable hash basis.

    Term hash bits come from md5(term) hex: chars 1-8 give bits 0-31,
    chars 9-16 give bits 32-63 (two 32-bit halves, so no 64-bit unsigned
    overflows anywhere and the same construction replays in ANSI SQL).
    Bit j of the doc hash = sign of Σ_term tf · (2·bit_j(h) − 1) — pure
    column algebra, a ``bits``-way conditional sum.

    ``bits=32`` (default) matches the driver-contract oracles; a 32-bit
    sketch saturates around 10^12 documents (birthday collisions inside
    Hamming balls), so pass ``bits=64`` at that scale."""
    if bits not in (32, 64):
        raise ValueError("simhash width must be 32 or 64")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(simple_tokens_col(text_col)).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn(
        "h", F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    )
    if bits == 64:
        tf = tf.withColumn(
            "h2", F.conv(F.substring(F.md5("term"), 9, 8), 16, 10).cast("long")
        )

    def bit_of(j: int):
        if j < 32:
            return F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        return F.shiftright(F.col("h2"), j - 32).bitwiseAND(F.lit(1))

    bit_sums = [
        F.sum(F.col("tf") * (bit_of(j) * 2 - 1)).alias(f"s{j}") for j in range(bits)
    ]
    sums = tf.groupBy("id").agg(*bit_sums)
    sig = None
    for j in range(bits):
        # shiftleft(1L, 63) is the sign bit; adding distinct powers of
        # two never carries, so arithmetic sum == bitwise OR here
        term = F.when(
            F.col(f"s{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select("id", sig.cast("long").alias("simhash"))


def simhash_hamming_pairs(
    sig: DataFrame, max_distance: int = 3, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within distance via 4-way block index.

    Standard trick: split the ``bits`` sketch into ``max_distance + 1``
    blocks; any pair within the distance agrees on ≥1 whole block →
    equi-join per block, then verify exact Hamming distance
    (bit_count of xor).  Unsigned shifts so the 64-bit sign bit never
    smears into block keys."""
    n_blocks = max_distance + 1
    width = bits // n_blocks
    blocks = [
        F.shiftrightunsigned(F.col("simhash"), i * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"b{i}")
        for i in range(n_blocks)
    ]
    s = sig.select("id", "simhash", *blocks)
    pairs = None
    for i in range(n_blocks):
        a = s.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"b{i}").alias("blk"))
        b = s.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"b{i}").alias("blk"))
        p = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "sh_a", "sh_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
