"""Similarity search over embedding columns (``array<float>``).

The reference's FAISS flat inner-product search
(``/root/reference/index/faiss_index.py:162-199``) and its numpy
fallback (``fallback_index.py:124-164``) become:

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query side, dot products via ``zip_with``/``aggregate`` (JVM column
  expressions, whole-stage codegen — no Python in the hot loop),
  window top-k.  The baseline/oracle path.
* :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH
  buckets both sides; candidates searched only within matching
  buckets (multi-probe via several independent tables), then exact
  rescoring.  Hyperplanes are seeded literals, so results are
  deterministic and cluster-size independent.
* :func:`embedding_near_duplicates` — self-join near-dup detection at
  a cosine threshold (training-data dedup use case).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize embeddings (reference L2-normalizes at embed time,
    ``embeddings/embedder.py:89-91``) so cosine = dot."""
    n = _norm(F.col(vec_col))
    unit = F.when(
        n > 0, F.transform(F.col(vec_col), lambda x: x / n)
    ).otherwise(F.col(vec_col))
    return df.withColumn("unit_vec", unit)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, vec_id, cosine).

    Query side is broadcast (reference batch ≤ thousands of queries);
    the corpus streams through one scan — O(|corpus|·|queries|·d) work
    but zero shuffle on the big side, embarrassingly parallel."""
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(corpus_id).alias("vec_id"), F.col("unit_vec").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(query_id).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", _dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64).tolist()


def _bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Hyperplane sign bucket.  The dot is rounded to 7 dp before the
    sign test (the same guard as the IVF path's ``_cent_dots``): a dot a
    few ulps either side of 0 must not flip a bucket between engines —
    the DuckDB oracles apply the identical ``round(..., 7) >= 0``.
    Callers pass the RAW vector (sign is scale-invariant), so both
    engines fold the exact same doubles in the same order."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(F.round(_dot(vec, lit), 7) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    n_planes: int = 8,
    n_tables: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(query_id, vec_id, cosine) — the deduped LSH candidate set with
    exact cosine, no ranking.  Exposed separately so callers (and the
    driver contract) can round before ranking."""
    if dim is None:
        # one Spark action — a fixed query cost; callers in loops (or on
        # expensive derived frames) should pass dim explicitly
        dim = len(corpus.select(vec_col).first()[0])
    # bucket on the RAW vector (sign is invariant under the positive
    # unit scaling), so the SQL oracle — which only has the raw column —
    # folds the identical doubles
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(corpus_id).alias("vec_id"),
        F.col("unit_vec").alias("cv"),
        F.col(vec_col).alias("craw"),
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(query_id).alias("query_id"),
        F.col("unit_vec").alias("qv"),
        F.col(vec_col).alias("qraw"),
    )
    cand = None
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=42 + 1000 * t)
        ct = c.withColumn("bkt", _bucket_key(F.col("craw"), planes))
        qt = q.withColumn("bkt", _bucket_key(F.col("qraw"), planes))
        p = ct.join(F.broadcast(qt), "bkt").select("query_id", "vec_id", "cv", "qv")
        cand = p if cand is None else cand.unionByName(p)
    return cand.dropDuplicates(["query_id", "vec_id"]).select(
        "query_id", "vec_id", _dot(F.col("cv"), F.col("qv")).alias("cosine")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (``n_tables``
    independent tables for recall), exact cosine within candidates.

    At 10^12 vectors each table's bucket join touches ~N/2^n_planes of
    the corpus per query instead of N — the corpus side is hash-
    partitioned by bucket key, queries broadcast."""
    scored = lsh_candidates(
        corpus, queries, n_planes, n_tables, corpus_id, query_id, vec_col, dim
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 3,
    dim: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b, cosine) self near-dup pairs ≥ threshold, LSH-bucketed.

    ``max_bucket`` caps the self-join fan-out per LSH bucket (the same
    skew guard as :func:`docinsight_spark.operators.dedup.lsh_candidate_pairs`):
    a degenerate bucket — zero vectors, boilerplate embeddings — would
    otherwise go O(n²).  Pairs inside an over-full bucket are dropped in
    that table; the other tables can still recall them."""
    if dim is None:
        # one Spark action — a fixed query cost; callers in loops (or on
        # expensive derived frames) should pass dim explicitly
        dim = len(df.select(vec_col).first()[0])
    u = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("unit_vec").alias("v"),
        F.col(vec_col).alias("raw"),
    )
    cand = None
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=77 + 1000 * t)
        b = u.withColumn("bkt", _bucket_key(F.col("raw"), planes))
        sz = Window.partitionBy("bkt")
        b = b.withColumn("_n", F.count(F.lit(1)).over(sz)).filter(
            F.col("_n") <= max_bucket
        )
        a_side = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bkt")
        b_side = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bkt")
        p = (
            a_side.join(b_side, "bkt")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
        )
        cand = p if cand is None else cand.unionByName(p)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", _dot(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF with a FIXED seeded coarse quantizer (oracle-replayable flavor)
# ---------------------------------------------------------------------------
#
# The KMeans-fitted IVF below gives better cells but its centroids are
# not SQL-portable.  This variant uses seeded random *unit* centroids
# (the same determinism trick as :func:`hyperplanes`): the Voronoi
# assignment, the probe ranking, and the exact rescoring are the exact
# IVF query machinery, and every constant can be embedded verbatim in
# generated DuckDB SQL, so the driver contract hash-verifies the whole
# path.  FAISS likewise accepts an arbitrary coarse quantizer.


def ivf_seed_centroids(dim: int, k: int, seed: int = 4242) -> list[list[float]]:
    """``k`` seeded unit vectors — a fixed, data-independent coarse
    quantizer (deterministic across engines and cluster sizes)."""
    rng = np.random.RandomState(seed)
    c = rng.normal(size=(k, dim)).astype(np.float64)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def _cent_dots(vec: Column, centroids: list[list[float]], decimals: int) -> Column:
    """Array of rounded dot(vec, centroid_i) — raw vector on purpose:
    positive scaling never changes an argmax/ranking against unit
    centroids, so no corpus-side normalization (and no norm fold whose
    summation order the oracle would have to replicate) is needed."""
    return F.array(
        *[
            F.round(
                _dot(vec, F.array(*[F.lit(float(x)) for x in c])), decimals
            )
            for c in centroids
        ]
    )


def ivf_fixed_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    decimals: int = 7,
) -> DataFrame:
    """Add ``ivf_cluster``: the argmax-dot cell, ties to the smallest
    centroid index.  Dots are rounded so Spark and the SQL oracle agree
    bit-for-bit (both fold the array in index order; rounding absorbs
    any residual last-ulp difference)."""
    dots = _cent_dots(F.col(vec_col).cast("array<double>"), centroids, decimals)
    cluster = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return df.withColumn("ivf_cluster", cluster)


def ivf_fixed_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 3,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    decimals: int = 7,
) -> DataFrame:
    """(query_id, vec_id, cosine): exact cosine inside the ``nprobe``
    nearest cells per query.  Fully in-plan — the probe ranking is a
    posexplode + window over the (tiny) query×centroid cross, never a
    driver-side collect; the corpus is touched ~nprobe/k of a full scan
    once stored partitioned by ``ivf_cluster``."""
    assigned = ivf_fixed_assign(corpus, centroids, vec_col, decimals).select(
        F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("cv"), "ivf_cluster"
    )
    qdots = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.posexplode(
            _cent_dots(F.col(vec_col).cast("array<double>"), centroids, decimals)
        ).alias("ivf_cluster", "pdot"),
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("pdot").desc(), F.col("ivf_cluster")
    )
    probes = (
        qdots.withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "ivf_cluster")
    )
    # double-precision rescore (the oracle computes in DOUBLE[] too)
    cu = F.col("cv").cast("array<double>")
    qu = F.col("qv").cast("array<double>")
    cand = assigned.join(F.broadcast(probes), "ivf_cluster").select(
        "query_id",
        "vec_id",
        (
            _dot(cu, qu) / (_norm(cu) * _norm(qu))
        ).alias("cosine"),
    )
    return cand.dropDuplicates(["query_id", "vec_id"])


def ivf_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 3,
    **kw,
) -> DataFrame:
    """Approximate top-k over the fixed-quantizer IVF layout."""
    scored = ivf_fixed_candidates(corpus, queries, centroids, nprobe, **kw)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF: KMeans-partitioned ANN (the classic FAISS IVF layout, Spark-native)
# ---------------------------------------------------------------------------

def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Partition vectors into Voronoi cells via MLlib KMeans.

    Returns (assigned, centroids): ``assigned`` carries ``ivf_cluster``;
    persist it partitioned by ``ivf_cluster`` so queries prune cells at
    scan time (the IVF analog of the reference's flat index — FAISS
    ``IndexFlatIP``, ``/root/reference/config.py:244`` — traded for a
    pruned scan).

    ``fit_fraction``: fit the centroids on a seeded sample instead of the
    full corpus — at 10^12 vectors a full KMeans fit is infeasible and
    unnecessary (cells only need approximate centroids; the *assignment*
    still covers every vector exactly).  Pick it so the sample is
    ~100-1000× n_centroids rows."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    u = with_unit_vectors(df, vec_col)
    feat = u.withColumn("_fv", array_to_vector(F.col("unit_vec")))
    fit_df = (
        feat.sample(fraction=fit_fraction, seed=seed)
        if fit_fraction is not None and fit_fraction < 1.0
        else feat
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_fv",
                   predictionCol="ivf_cluster").fit(fit_df)
    assigned = model.transform(feat).drop("_fv").select(
        F.col(id_col).alias("vec_id"), F.col("unit_vec"), "ivf_cluster"
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest cells per query,
    exact cosine inside.  Query→cell assignment runs IN-PLAN (round 5;
    was a driver-side collect loop): the query batch cross-joins the
    broadcast centroid table (n_queries × n_centroids tiny rows), a
    per-query window keeps the ``nprobe`` best cells — so the operator
    stays distributed even when the query batch grows to offline-batch
    size (the fixed-quantizer flavor's shape, adopted here).

    Cell proximity uses the SAME metric KMeans assigned with — Euclidean
    distance to the raw centroid (‖q−c‖² = 1 − 2q·c + ‖c‖² for unit q,
    ranked by 2q·c − ‖c‖²).  Ranking by cosine against *normalized*
    centroids disagrees with the assignment when centroid norms vary, and
    can miss a vector's own cell (observed with sampled-fit centroids)."""
    spark = assigned.sparkSession
    cent_df = spark.createDataFrame(
        [
            (ci, [float(x) for x in c], float(sum(x * x for x in c)))
            for ci, c in enumerate(centroids)
        ],
        "ivf_cluster int, cvec array<double>, c_sq double",
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(query_id).alias("query_id"), "unit_vec"
    )
    scored_cells = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "_prox",
        2.0 * _dot(F.col("unit_vec"), F.col("cvec")) - F.col("c_sq"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_prox").desc(), F.col("ivf_cluster")
    )
    probes = (
        scored_cells.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "ivf_cluster", F.col("unit_vec").alias("qv"))
    )
    cand = assigned.join(F.broadcast(probes), "ivf_cluster").select(
        "query_id", "vec_id", _dot(F.col("unit_vec"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
