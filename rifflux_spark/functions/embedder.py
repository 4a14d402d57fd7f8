"""Deterministic hash embedder + dim normalization + backend factory.

Semantics match the reference exactly:

- :func:`hash_embed` — reference src/rifflux/embeddings/hash_embedder.py:8-25
  (sha256 bucket/sign/weight per token, L2-normalized float32, dim 384);
- :func:`normalize_dim` — reference embedder_factory.py:18-31 (reshape,
  truncate/zero-pad, re-normalize);
- :func:`resolve_embedder` — reference embedder_factory.py:41-69 (``hash`` /
  ``onnx`` / ``auto`` with onnx->hash fallback; the onnx backend is gated
  behind an optional import and falls back deterministically when fastembed
  is absent, as in CI for the reference).

Spark surface: :func:`embed_series` is the Arrow-batch body for a pandas
UDF producing ``array<float>`` columns; hashlib runs inside the batch (no
per-row Python UDF).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[A-Za-z0-9_./-]+")


def hash_embed(text: str, dim: int = 384) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float32)
    tokens = TOKEN_RE.findall(text.lower())
    if not tokens:
        return vec
    for token in tokens:
        digest = hashlib.sha256(token.encode("utf-8")).digest()
        index = int.from_bytes(digest[:4], "big") % dim
        sign = -1.0 if digest[4] & 1 else 1.0
        weight = 1.0 + (digest[5] / 255.0)
        vec[index] += np.float32(sign * weight)
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec = vec / norm
    return vec.astype(np.float32)


def normalize_dim(vec: np.ndarray, target_dim: int) -> np.ndarray:
    arr = np.asarray(vec, dtype=np.float32)
    if arr.ndim != 1:
        arr = arr.reshape(-1)
    if arr.shape[0] == target_dim:
        out = arr
    elif arr.shape[0] > target_dim:
        out = arr[:target_dim]
    else:
        out = np.pad(arr, (0, target_dim - arr.shape[0]))
    norm = np.linalg.norm(out)
    if norm > 0:
        out = out / norm
    return out.astype(np.float32)


@dataclass(slots=True)
class EmbedderBundle:
    embed: Callable[[str], np.ndarray]
    model_label: str


def _hash_bundle(dim: int) -> EmbedderBundle:
    return EmbedderBundle(embed=lambda t: hash_embed(t, dim=dim), model_label=f"hash-{dim}")


def _onnx_bundle(model_name: str, dim: int) -> EmbedderBundle | None:
    try:
        from fastembed import TextEmbedding  # type: ignore
    except Exception:
        return None
    model = TextEmbedding(model_name=model_name)

    def embed(text: str) -> np.ndarray:
        vector = next(model.embed([text]))
        return normalize_dim(np.asarray(vector, dtype=np.float32), dim)

    return EmbedderBundle(embed=embed, model_label=f"onnx-{model_name.replace('/', '-')}-{dim}")


def resolve_embedder(
    backend: str = "auto",
    dim: int = 384,
    model_name: str = "BAAI/bge-small-en-v1.5",
) -> EmbedderBundle:
    backend = backend.lower().strip()
    if backend == "hash":
        return _hash_bundle(dim)
    onnx = _onnx_bundle(model_name, dim)
    if onnx:
        return onnx
    return _hash_bundle(dim)


# per-(process, dim) memo of token -> (bucket index, signed weight): web
# text is Zipf-distributed, so across an Arrow batch almost every token is
# a cache hit and the sha256 cost amortizes to ~0. Executor-local, bounded.
_TOKEN_CACHE: dict[int, dict[str, tuple[int, float]]] = {}
_TOKEN_CACHE_MAX = 1 << 20


def _token_params(token: str, dim: int) -> tuple[int, float]:
    cache = _TOKEN_CACHE.setdefault(dim, {})
    hit = cache.get(token)
    if hit is None:
        digest = hashlib.sha256(token.encode("utf-8")).digest()
        index = int.from_bytes(digest[:4], "big") % dim
        sign = -1.0 if digest[4] & 1 else 1.0
        weight = float(np.float32(sign * (1.0 + digest[5] / 255.0)))
        hit = (index, weight)
        if len(cache) < _TOKEN_CACHE_MAX:
            cache[token] = hit
    return hit


def _hash_embed_cached(text: str, dim: int) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float32)
    tokens = TOKEN_RE.findall(text.lower())
    if not tokens:
        return vec
    idx = np.empty(len(tokens), dtype=np.int64)
    w = np.empty(len(tokens), dtype=np.float32)
    for i, token in enumerate(tokens):
        idx[i], w[i] = _token_params(token, dim)
    np.add.at(vec, idx, w)
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec = (vec / norm).astype(np.float32)
    return vec


def embed_series(texts: pd.Series, dim: int = 384) -> pd.Series:
    """Arrow-batch pandas UDF body: text -> list[float] (len == dim).

    Bit-equivalent to :func:`hash_embed` (same float32 accumulate order);
    the token-parameter memo only skips recomputing sha256 digests.
    """
    return texts.map(lambda t: _hash_embed_cached(t if isinstance(t, str) else "", dim).tolist())


def embed_series_packed(texts: pd.Series, dim: int = 384) -> pd.Series:
    """Like :func:`embed_series` but packs each vector as little-endian
    float32 bytes — the reference's own storage format (reference
    sqlite_store.py:81-94 ``np.ndarray.tobytes()`` BLOBs) and ~3× cheaper
    through Arrow/parquet than a ``list<float>`` of 384 Python floats."""
    return texts.map(lambda t: _hash_embed_cached(t if isinstance(t, str) else "", dim).tobytes())


def unpack_vectors(packed: pd.Series, dim: int | None = None) -> np.ndarray:
    """(n, dim) float32 matrix from a Series of packed-float32 bytes."""
    if len(packed) == 0:
        return np.zeros((0, dim or 0), dtype=np.float32)
    return np.frombuffer(b"".join(packed), dtype=np.float32).reshape(len(packed), -1)
