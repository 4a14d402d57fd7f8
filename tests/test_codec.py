"""Posting-block codec: varbyte/delta roundtrips (property-based) and
block-max correctness."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rifflux_spark.operators.codec import (
    bm25_wtf,
    decode_block,
    decode_varbyte,
    encode_block,
    encode_varbyte,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values: list[int]) -> None:
    arr = np.array(values, dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(arr)).tolist() == values


def test_varbyte_known_bytes() -> None:
    # classic LEB128: 300 = 0b1_0101100 -> 0xAC 0x02
    assert encode_varbyte(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varbyte(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varbyte(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varbyte(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**6),  # gap
            st.integers(min_value=1, max_value=500),    # tf
            st.integers(min_value=1, max_value=5000),   # dl
        ),
        min_size=1,
        max_size=256,
    ),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings: list[tuple[int, int, int]], base: int) -> None:
    gaps = np.array([p[0] for p in postings], dtype=np.int64)
    doc_ords = base + np.cumsum(gaps)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    block = encode_block(doc_ords, tfs, dls)
    got_docs, got_tfs, got_dls = decode_block(block)
    assert got_docs.tolist() == doc_ords.tolist()
    assert got_tfs.tolist() == tfs.tolist()
    assert got_dls.tolist() == dls.tolist()
    assert block["first_doc"] == int(doc_ords[0])
    assert block["last_doc"] == int(doc_ords[-1])
    # (max_tf, min_dl) dominate every per-posting wtf at ANY avgdl —
    # the avgdl-drift-proof block-max bound
    for avgdl in (1.0, float(dls.mean()), 10_000.0):
        wtf = bm25_wtf(tfs, dls, avgdl, 1.2, 0.75)
        bound = bm25_wtf(
            np.array([block["block_max_tf"]]),
            np.array([block["block_min_dl"]]),
            avgdl,
            1.2,
            0.75,
        )[0]
        assert bound >= float(wtf.max()) - 1e-12


def test_block_rejects_unsorted() -> None:
    import pytest

    with pytest.raises(ValueError):
        encode_block(np.array([5, 3]), np.array([1, 1]), np.array([10, 10]))
