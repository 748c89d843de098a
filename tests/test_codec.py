"""Codec round-trip tests incl. property-based (SURVEY §5 item 1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docinsight_spark.index.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_known():
    vals = np.array([0, 1, 127, 128, 300, 2**35, 2**63, 2**64 - 1], dtype=np.uint64)
    enc = varint_encode(vals)
    assert varint_decode(enc, len(vals)).tolist() == vals.tolist()


def test_varint_sizes():
    assert len(varint_encode(np.array([0], dtype=np.uint64))) == 1
    assert len(varint_encode(np.array([127], dtype=np.uint64))) == 1
    assert len(varint_encode(np.array([128], dtype=np.uint64))) == 2
    assert len(varint_encode(np.array([2**64 - 1], dtype=np.uint64))) == 10


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=400))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert varint_decode(varint_encode(vals), len(vals)).tolist() == xs


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),  # docID
            st.integers(min_value=1, max_value=10_000),            # tf
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
def test_postings_roundtrip_property(pairs):
    docs = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    scores = (tfs * 0.5).astype(np.float32)
    payload, meta = encode_postings(docs, tfs, scores, block_size=64)
    got_docs, got_tfs = decode_postings(payload, meta)
    order = np.argsort(docs, kind="stable")
    assert got_docs.tolist() == docs[order].tolist()
    assert got_tfs.tolist() == tfs[order].tolist()


def test_block_meta_and_selective_decode():
    n = 1000
    rng = np.random.RandomState(7)
    docs = np.cumsum(rng.randint(1, 2**30, size=n).astype(np.int64))
    tfs = rng.randint(1, 50, size=n).astype(np.int64)
    scores = (tfs / (tfs + 1.5)).astype(np.float32)
    payload, meta = encode_postings(docs, tfs, scores, block_size=128)
    assert len(meta.n) == 8  # ceil(1000/128)
    assert meta.first_doc[0] == docs[0] and meta.last_doc[-1] == docs[-1]
    # block-max correctness
    for bi in range(8):
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        assert abs(meta.max_score[bi] - scores[lo:hi].max()) < 1e-7
    # selective decode of middle blocks only
    d, t = decode_postings(payload, meta, blocks=np.array([2, 3]))
    assert d.tolist() == docs[256:512].tolist()
    assert t.tolist() == tfs[256:512].tolist()
    # single block decode
    d0, t0 = decode_block(payload, meta, 0)
    assert d0.tolist() == docs[:128].tolist()


def test_compression_beats_raw():
    n = 10_000
    docs = np.cumsum(np.random.RandomState(3).randint(1, 2**17, size=n).astype(np.int64))
    tfs = np.ones(n, dtype=np.int64)
    payload, _ = encode_postings(docs, tfs, tfs.astype(np.float32))
    assert len(payload) < n * 16 * 0.5  # ≥2× smaller than raw (docID,tf) int64 pairs


def test_block_tf_max_dl_min_fields():
    """v4 drift-bound inputs: per-block tf_max / dl_min must be exact
    maxima/minima over the docID-sorted block membership."""
    n = 700
    rng = np.random.RandomState(11)
    docs = rng.permutation(np.cumsum(rng.randint(1, 2**20, size=n).astype(np.int64)))
    tfs = rng.randint(1, 400, size=n).astype(np.int64)
    dls = rng.randint(1, 5000, size=n).astype(np.int64)
    scores = (tfs / (tfs + 1.5)).astype(np.float32)
    payload, meta = encode_postings(docs, tfs, scores, block_size=128, dls=dls)
    order = np.argsort(docs, kind="stable")
    ts, ds = tfs[order], dls[order]
    for bi in range(len(meta.n)):
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        assert meta.tf_max[bi] == ts[lo:hi].max()
        assert meta.dl_min[bi] == ds[lo:hi].min()


@settings(deadline=None, max_examples=200)
@given(
    tf=st.integers(min_value=1, max_value=10_000),
    dl=st.integers(min_value=1, max_value=10**6),
    tf_extra=st.integers(min_value=0, max_value=500),
    dl_extra=st.integers(min_value=0, max_value=10**5),
    avgdl_enc=st.floats(min_value=1.0, max_value=10**5),
    avgdl_now=st.floats(min_value=1.0, max_value=10**5),
)
def test_drift_bound_admissible(tf, dl, tf_extra, dl_extra, avgdl_enc, avgdl_now):
    """The query-side drift-safe block bound must upper-bound the true
    tf-normalized score of EVERY posting under the CURRENT avgdl, for
    any drift direction — the wand kernel's bound formula verbatim
    (index/wand.py _wave_local_topk), with (tf_max, dl_min) standing in
    for a block containing this posting."""
    k1, b = 1.2, 0.75

    def s(tf_, dl_, avgdl_):
        return tf_ * (k1 + 1.0) / (tf_ + k1 * (1.0 - b + b * dl_ / avgdl_))

    tf_max, dl_min = tf + tf_extra, dl  # dl_min ≤ any member's dl
    member_dl = dl + dl_extra           # the posting's dl ≥ dl_min
    true_score = s(tf, member_dl, avgdl_now)
    stored_max = np.float32(s(tf, member_dl, avgdl_enc))  # f32, as stored
    bound = s(tf_max, dl_min, avgdl_now)
    if avgdl_now <= avgdl_enc * (1.0 + 1e-12):
        bound = min(bound, float(stored_max))
    # the kernel inflates term uppers by (1+1e-6)+1e-12 for f32 slack
    assert bound * (1.0 + 1e-6) + 1e-12 >= true_score
