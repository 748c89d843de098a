"""Chunking / segmentation + rerank + rollup operators."""

import pytest
from pyspark.sql import functions as F

from docinsight_spark.operators.chunking import (
    remove_overlapping_spans,
    sentence_pack_chunks,
    sliding_window_chunks,
    split_sentences,
    truncate_content,
)
from docinsight_spark.operators.query import search, search_rerank
from docinsight_spark.operators.stylometry import compare_profiles, stylo_features


def test_sliding_window_shapes(spark):
    docs = spark.createDataFrame([(0, "x" * 1000), (1, "short")], "doc_id long, text string")
    out = sliding_window_chunks(docs, "doc_id", "text", window_chars=400,
                                overlap_chars=100).toPandas()
    d0 = out[out["id"] == 0].sort_values("ordinal")
    assert d0["start"].tolist() == [1, 301, 601, 901]
    assert d0["chunk"].map(len).tolist() == [400, 400, 400, 100]
    assert len(out[out["id"] == 1]) == 1


def test_sliding_window_word_snap(spark):
    """snap_to_words extends a mid-word cut to the word's end; starts,
    ordinals and chunk count stay identical to the exact-window mode."""
    words = " ".join(["alpha", "bravo", "charlie", "deltaecho"] * 60)
    docs = spark.createDataFrame([(0, words)], "doc_id long, text string")
    exact = sliding_window_chunks(
        docs, "doc_id", "text", window_chars=97, overlap_chars=13
    ).toPandas().sort_values("ordinal")
    snapped = sliding_window_chunks(
        docs, "doc_id", "text", window_chars=97, overlap_chars=13,
        snap_to_words=True,
    ).toPandas().sort_values("ordinal")
    assert exact["start"].tolist() == snapped["start"].tolist()
    vocab = {"alpha", "bravo", "charlie", "deltaecho"}
    for c in snapped["chunk"]:
        assert c.split()[-1] in vocab, c[-30:]  # never ends mid-word
    for e, s in zip(exact["chunk"], snapped["chunk"]):
        assert s.startswith(e)  # snap only extends, never truncates


def test_sentence_pack_overlap_and_cap(spark):
    text = ". ".join(f"sentence number {i} with some words" for i in range(40)) + "."
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sentence_pack_chunks(docs, "doc_id", "text", chunk_tokens=25,
                               max_chunks=5).toPandas()
    assert 1 < len(out) <= 5
    chunks = out.sort_values("ordinal")["chunk"].tolist()
    # 1-sentence overlap: each chunk (after the first) starts with the
    # previous chunk's last sentence
    for prev, nxt in zip(chunks, chunks[1:]):
        last_sent = [s for s in prev.split(". ") if s][-1].rstrip(".")
        assert nxt.startswith(last_sent[:20])


def test_split_sentences(spark):
    docs = spark.createDataFrame(
        [(0, "One sentence. Two things! Really? Yes.")], "doc_id long, text string"
    )
    out = split_sentences(docs, "doc_id", "text").toPandas()
    assert out["sentence"].tolist() == ["One sentence.", "Two things!", "Really?", "Yes."]


def test_truncate_content(spark):
    docs = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    assert truncate_content(docs, "text", 3).first()["text"] == "abc"


def test_remove_overlapping_spans_greedy(spark):
    spans = spark.createDataFrame(
        [
            (0, 0, 10, 0.9),   # kept (highest)
            (0, 5, 15, 0.8),   # overlaps kept → dropped
            (0, 12, 20, 0.7),  # overlaps only the DROPPED span → kept
            (0, 30, 40, 0.1),  # disjoint → kept
        ],
        "id long, start long, end long, confidence double",
    )
    out = remove_overlapping_spans(spans).toPandas().sort_values("start")
    assert out["start"].tolist() == [0, 12, 30]


def test_search_rerank_matches_direct_topk(spark, tiny_corpus):
    from docinsight_spark.corpus import make_queries
    from docinsight_spark.operators.postings import (
        build_postings, corpus_stats, doc_stats, term_stats, with_doc_id)

    docs = with_doc_id(tiny_corpus)
    postings = build_postings(docs).cache()
    ts, ds = term_stats(postings), doc_stats(postings)
    st = corpus_stats(ds)
    q = make_queries(spark, corpus_n=200, n_queries=8)
    direct = search(q, postings, ts, ds, st, k=5).toPandas()
    two_stage = search_rerank(q, postings, ts, ds, st, k=5, overfetch=2).toPandas()
    a = direct.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = two_stage.sort_values(["query_id", "rank"]).reset_index(drop=True)
    # identical scorer in both stages → two-stage must equal direct top-k
    assert a[["query_id", "rank", "docID"]].equals(b[["query_id", "rank", "docID"]])


def test_compare_profiles_self_similarity(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox and the lazy dog"),
         (1, "an entirely different document about code and data")],
        "doc_id long, text string",
    )
    feats = stylo_features(docs).cache()
    cols = ["token_count", "type_token_ratio", "avg_word_length", "stopword_ratio"]
    cmp = compare_profiles(feats, feats, cols).toPandas()
    self_sim = cmp[(cmp.id_a == 0) & (cmp.id_b == 0)]["similarity"].iloc[0]
    cross_sim = cmp[(cmp.id_a == 0) & (cmp.id_b == 1)]["similarity"].iloc[0]
    assert abs(self_sim - 1.0) < 1e-9
    assert cross_sim < self_sim
