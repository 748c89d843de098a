"""End-to-end originality analysis (the reference's flagship query)."""

import pytest
from pyspark.sql import functions as F

from docinsight_spark.corpus import make_plag_corpus
from docinsight_spark.index.builder import IndexBuilder
from docinsight_spark.operators.pipeline import analyze_documents
from docinsight_spark.operators.postings import with_doc_id


@pytest.fixture(scope="module")
def plag_setup(spark, tmp_path_factory):
    """Index the plagiarism corpus; analyze (a) a verbatim copy of one
    original and (b) a fresh unrelated doc."""
    from docinsight_spark.operators.chunking import chunk_corpus

    plag = make_plag_corpus(spark, n_cases=2).cache()
    idx = str(tmp_path_factory.mktemp("plagidx"))
    # chunk-granular index: the reference's unit of retrieval
    IndexBuilder(spark, idx, n_buckets=4).build(
        chunk_corpus(plag.select("repo", "path", "commit", "lang", "content"),
                     window_chars=300, overlap_chars=50)
    )
    original = plag.filter(
        (F.col("label") == "original") & (F.col("case_id") == 1)
    ).first()
    fresh = "\n".join(
        f"wholly_unrelated_token_{chr(97 + i % 26)} = flibber_{chr(97 + (i * 7) % 26)}"
        for i in range(30)
    )
    docs = spark.createDataFrame(
        [(100, original["content"]), (200, fresh)],
        "doc_id long, content string",
    )
    return idx, docs


def test_analyze_documents_directional(spark, plag_setup):
    idx, docs = plag_setup
    sent, spans, orig = analyze_documents(spark, idx, docs, k=5)
    o = orig.toPandas().set_index("doc_id")
    # the verbatim copy must look far less original than the fresh doc
    assert o.loc[100, "originality_score"] < o.loc[200, "originality_score"]
    assert o.loc[100, "plagiarized_coverage"] > 0.5
    assert o.loc[200, "n_high"] == 0
    # spans exist only for the plagiarized doc
    sp = spans.toPandas()
    assert (sp["doc_id"] == 100).any()
    assert not (sp["doc_id"] == 200).any()


def test_analyze_outputs_are_consistent(spark, plag_setup):
    idx, docs = plag_setup
    sent, spans, orig = analyze_documents(spark, idx, docs, k=5)
    s = sent.toPandas()
    o = orig.toPandas().set_index("doc_id")
    for doc_id, grp in s.groupby("doc_id"):
        assert o.loc[doc_id, "total_sentences"] == len(grp)
        assert (
            o.loc[doc_id, ["n_high", "n_medium", "n_low"]].sum() == len(grp)
        )
    assert ((o["originality_score"] >= 0) & (o["originality_score"] <= 1)).all()
