"""Posting codec round-trip + block-max property tests (SURVEY.md §5.2b)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from keywords4cv_spark.index.codec import (
    bm25_contrib,
    decode_block,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**62], dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(vals))) == list(vals)
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    # single-byte values
    assert varbyte_encode(np.array([5], dtype=np.uint64)) == bytes([5])
    # 300 = 0b100101100 -> LEB128 little endian: 0xAC 0x02
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == bytes([0xAC, 0x02])


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62 - 1), min_size=0, max_size=500)
)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**6),  # gap
            st.integers(min_value=1, max_value=50),  # tf
            st.integers(min_value=1, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=600,
    ),
    st.integers(min_value=2, max_value=130),
)
def test_postings_roundtrip_property(entries, block_size):
    gaps = np.array([e[0] for e in entries], dtype=np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    idf, k1, b, avgdl = 1.7, 1.2, 0.75, 120.0
    blocks = encode_postings(doc_ids, tfs, dls, idf, k1, b, avgdl, block_size)
    out_docs, out_tfs, out_dls = [], [], []
    for blk in blocks:
        d, t, ln = decode_block(blk["payload"], blk["n"], blk["first_doc"])
        assert d[0] == blk["first_doc"] and d[-1] == blk["last_doc"]
        assert blk["max_tf"] == t.max()
        # block-max is the exact max BM25 contribution over the block
        true_max = bm25_contrib(t, ln, idf, k1, b, avgdl).max()
        assert blk["max_score"] == true_max
        out_docs.extend(d)
        out_tfs.extend(t)
        out_dls.extend(ln)
    assert out_docs == list(doc_ids)
    assert out_tfs == list(tfs)
    assert out_dls == list(dls)


def test_encode_rejects_unsorted_duplicates():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(
            np.array([3, 3]), np.array([1, 1]), np.array([5, 5]), 1.0, 1.2, 0.75, 10.0
        )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**5),  # doc gap
            st.lists(
                st.integers(min_value=1, max_value=30),  # position gaps
                min_size=1,
                max_size=12,
            ),
            st.integers(min_value=1, max_value=3000),  # dl
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_positional_roundtrip_property(entries, block_size):
    from keywords4cv_spark.index.codec import decode_block_positions

    doc_ids = np.cumsum([e[0] for e in entries])
    positions = [np.cumsum(e[1]) - 1 for e in entries]  # ascending, may start 0
    tfs = np.array([p.size for p in positions], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    blocks = encode_postings(
        doc_ids, tfs, dls, 1.5, 1.2, 0.75, 100.0, block_size, positions=positions
    )
    out_docs, out_pos = [], []
    for blk in blocks:
        d, t, ln, pos = decode_block_positions(
            blk["payload"], blk["n"], blk["first_doc"]
        )
        # the non-positional reader must still work on positional payloads
        d2, t2, _ = decode_block(blk["payload"], blk["n"], blk["first_doc"])
        assert list(d2) == list(d) and list(t2) == list(t)
        out_docs.extend(d)
        out_pos.extend(pos)
    assert out_docs == list(doc_ids)
    for got, want in zip(out_pos, positions):
        assert list(got) == list(want)
