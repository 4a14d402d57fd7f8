"""RRF fusion — port of reference tests/test_rrf.py plus the spec example
(reference spec/spec-tool-hybrid-search-contract.md:253-258)."""

from __future__ import annotations

from rifflux_spark.operators.fusion import rrf_fuse


def test_rrf_fusion_prioritizes_agreement() -> None:
    fused = rrf_fuse({"lexical": ["a", "b", "c"], "semantic": ["b", "d", "a"]}, k=60)
    ids = list(fused.keys())
    assert ids[0] == "b"
    assert "a" in ids


def test_rrf_spec_example_values() -> None:
    k = 60
    # spec example: lexical=[c1,c2], semantic=[c2,c3]
    fused = rrf_fuse({"lexical": ["c1", "c2"], "semantic": ["c2", "c3"]}, k=k)
    assert abs(fused["c2"] - (1 / (k + 2) + 1 / (k + 1))) < 1e-12
    assert abs(fused["c1"] - 1 / (k + 1)) < 1e-12
    assert abs(fused["c3"] - 1 / (k + 2)) < 1e-12
    assert list(fused)[0] == "c2"


def test_rrf_empty_rankings() -> None:
    assert rrf_fuse({}) == {}
    assert rrf_fuse({"lexical": []}) == {}
