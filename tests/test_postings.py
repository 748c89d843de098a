"""Postings / stats build vs a hand-rolled pandas oracle (SURVEY §5)."""

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docinsight_spark.functions.tokenizer import tokenize_code_pandas
from docinsight_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_stats,
    term_stats,
    with_doc_id,
)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    docs = with_doc_id(tiny_corpus).cache()
    postings = build_postings(docs).cache()
    return docs, postings


def _oracle_postings(docs_pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    toks = tokenize_code_pandas(docs_pdf["content"], docs_pdf["lang"])
    for doc_id, tl in zip(docs_pdf["docID"], toks):
        for term, tf in Counter(tl).items():
            rows.append((term, doc_id, tf))
    return pd.DataFrame(rows, columns=["term", "docID", "tf"])


def test_postings_match_pandas_oracle(built):
    docs, postings = built
    docs_pdf = docs.select("docID", "lang", "content").toPandas()
    oracle = _oracle_postings(docs_pdf)
    got = postings.toPandas()
    key = ["term", "docID"]
    merged = oracle.merge(got, on=key, how="outer", suffixes=("_o", "_s"))
    assert merged["tf_o"].notna().all() and merged["tf_s"].notna().all()
    assert (merged["tf_o"] == merged["tf_s"]).all()


def test_doc_ids_unique_and_sha_invariant(built):
    docs, _ = built
    n = docs.count()
    assert docs.select("docID").distinct().count() == n
    # per-row invariant: sha2(content,256) stable across a shuffle
    reshuffled = docs.repartition(7, "lang").withColumn(
        "sha2_again", F.sha2(F.col("content"), 256)
    )
    assert reshuffled.filter(F.col("sha2_again") != F.col("content_sha")).count() == 0


def test_doc_stats_and_corpus_stats(built):
    docs, postings = built
    ds = doc_stats(postings)
    st = corpus_stats(ds)
    assert st.n_docs == docs.count()
    total_tokens = postings.agg(F.sum("tf")).collect()[0][0]
    assert abs(st.avgdl - total_tokens / st.n_docs) < 1e-9


def test_term_stats_salted_equals_plain(built):
    _, postings = built
    salted = term_stats(postings, n_salts=16).toPandas().set_index("term")["df"]
    plain = (
        postings.groupBy("term").count().toPandas().set_index("term")["count"]
    )
    assert salted.sort_index().equals(plain.sort_index().rename("df"))


def test_hot_terms_present(built):
    _, postings = built
    hot = postings.filter(F.col("term") == "return").count()
    assert hot > 50  # every file has return statements
