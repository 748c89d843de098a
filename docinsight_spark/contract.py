"""Driver-contract queries: Spark implementation + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 over the
driver-provided tables at ``sf_dir`` (``documents``, ``embeddings``,
``events``, TPC-H-ish tables).  The Spark side and the SQL side alias
every computed column identically; floating-point outputs are rounded
to 4 decimals on both sides *before* any rank is assigned, so ranks and
hashes are engine-independent.

The tokenizer used here is the SQL-expressible whitespace tokenizer
(:func:`docinsight_spark.functions.tokenizer.simple_tokens_col`) so
DuckDB can replay it exactly; the code-aware tokenizer has its own
pandas-oracle pytest coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docinsight_spark.functions.bm25 import bm25_score_col
from docinsight_spark.functions.tokenizer import simple_tokens_col

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) exploded whitespace tokens of documents.text."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(simple_tokens_col("text")).alias("term")
    )


# SQL fragment shared by token-based oracles (DuckDB).
_SQL_TOKS = """
toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
)
"""

_SQL_POSTINGS = _SQL_TOKS + """,
postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY term, doc_id
)
"""

# ---------------------------------------------------------------------------
# Postings / statistics (SURVEY §2.6 A2, A16)
# ---------------------------------------------------------------------------


@_register(
    "postings_tf",
    f"WITH {_SQL_POSTINGS} SELECT term, doc_id, tf FROM postings",
)
def postings_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, tf) — the core inverted-index relation (A2)."""
    return (
        _doc_tokens(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@_register(
    "term_stats_df",
    f"WITH {_SQL_POSTINGS} SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term",
)
def term_stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df) — document frequency (A16)."""
    return (
        postings_tf(spark, sf_dir).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )


@_register(
    "doc_stats_dl",
    f"WITH {_SQL_POSTINGS} SELECT doc_id, sum(tf)::BIGINT AS dl FROM postings GROUP BY doc_id",
)
def doc_stats_dl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl) — document length in tokens (A16)."""
    return postings_tf(spark, sf_dir).groupBy("doc_id").agg(F.sum("tf").alias("dl"))


# ---------------------------------------------------------------------------
# BM25 top-k (SURVEY §2.5 J7 + §2.8 T1) — the flagship query
# ---------------------------------------------------------------------------

# Fixed reference query set over the documents vocabulary: hot terms,
# mid-frequency terms, multi-term conjunctions.
BM25_QUERY_TERMS: list[tuple[int, str]] = [
    (0, "spark"), (0, "join"),
    (1, "window"), (1, "batch"),
    (2, "table"),
    (3, "merge"), (3, "stream"), (3, "column"),
    (4, "customer"), (4, "query"),
    (5, "scan"), (5, "sort"), (5, "filter"),
]
BM25_K = 10


def _bm25_oracle_sql() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERY_TERMS)
    return f"""
WITH {_SQL_POSTINGS},
dstats AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM postings GROUP BY doc_id),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term),
c AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dstats),
qterms(query_id, term) AS (VALUES {vals}),
scored AS (
  SELECT q.query_id::BIGINT AS query_id, p.doc_id,
         sum(
           ln((c.n - t.df + 0.5) / (t.df + 0.5) + 1.0)
           * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / c.avgdl))
         ) AS s
  FROM qterms q
  JOIN postings p USING (term)
  JOIN tstats t USING (term)
  JOIN dstats d USING (doc_id)
  CROSS JOIN c
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, round(s, 4) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(s, 4) DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {BM25_K}
"""


@_register("bm25_topk", _bm25_oracle_sql())
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query (k1=1.2, b=0.75), rank after 4-dp rounding."""
    postings = postings_tf(spark, sf_dir)
    dstats = doc_stats_dl(spark, sf_dir)
    tstats = term_stats_df(spark, sf_dir)
    crow = dstats.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    qterms = spark.createDataFrame(BM25_QUERY_TERMS, "query_id long, term string")
    scored = (
        postings.join(F.broadcast(qterms.join(tstats, "term")), "term")
        .join(dstats, "doc_id")
        .withColumn(
            "contrib",
            bm25_score_col(F.col("tf"), F.col("df"), F.col("dl"),
                           float(crow["n"]), float(crow["avgdl"])),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_K)
        .select("query_id", "rank", "doc_id", "score")
    )
