"""Embedding-vector storage transforms: int8 scalar quantization.

At 100 TB an ``array<float>`` embedding column is typically the single
largest column in the table; per-vector symmetric int8 quantization (the
faiss ``SQ8``/Milvus/pgvector-halfvec family of tricks) cuts it 4x with
bounded recall loss, and the quantized form dot-products in SIMD int8 on
modern CPUs. The reference engine stores float32 BLOBs untouched
(/root/reference/src/rifflux/db/sqlite_store.py:81-94 packs
``np.ndarray.tobytes()``); the rebuild adds the compressed
representation as a first-class column transform.

Scale shape: everything here is a pure per-row Catalyst expression over
the array column — ``transform`` / ``aggregate`` lambda expressions
inside whole-stage codegen. No Python, no shuffle, no UDF: a 100 TB
re-encode pass is map-only and pipelines with the parquet scan.

Scheme (per vector ``v``):
    scale = max(|v_i|) / 127        (0.0 for the zero vector)
    q_i   = round(v_i / scale)      (int8 range [-127, 127]; 0 if scale=0)
    dequant v'_i = q_i * scale
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int8_scale(vec: Column) -> Column:
    """Per-vector symmetric quantization scale: ``max(|v|) / 127``.

    Computed in float64 (the float32 elements widen exactly) so every
    engine agrees bit-for-bit. Zero/empty vectors get scale 0.0.
    """
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.coalesce(mx / F.lit(127.0), F.lit(0.0))


def int8_quantize(vec: Column, scale: Column) -> Column:
    """Quantized codes ``array<int>``: ``round(v / scale)`` per element,
    0 everywhere when ``scale = 0`` (the zero vector)."""
    return F.when(
        scale > 0,
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))


def int8_sq_err_micro(vec: Column, q: Column, scale: Column) -> Column:
    """Total squared reconstruction error in exact 1e-12 integer units:
    ``sum(round((v_i - q_i*scale)^2 * 1e12))`` as a long.

    Each per-element error is a deterministic double in every engine;
    quantizing BEFORE the sum makes the aggregate an exact integer sum —
    no float-summation drift between engines or partitionings (divide by
    1e12 for the float view). Per-element errors are <= (scale/2)^2, so
    the micro-sum stays far inside int64 for any realistic dim."""
    err = F.zip_with(
        vec,
        q,
        lambda x, c: (x.cast("double") - c.cast("double") * scale)
        * (x.cast("double") - c.cast("double") * scale),
    )
    return F.aggregate(
        F.transform(err, lambda e: F.round(e * 1e12).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
