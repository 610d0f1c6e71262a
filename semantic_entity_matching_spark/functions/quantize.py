"""Quantized embedding variants — INT8 / UINT8 / BINARY / UBINARY.

The reference requests these output types from Bedrock (lib/bedrock/
types.py:20-27 ``EmbeddingType``; lib/bedrock/adapters/cohere_embed_model_
adapter.py formats them per request).  In a Spark engine the quantization
itself is trivial — the point is the SHUFFLE PAYLOAD: candidate-pair scoring
shuffles two vectors per pair, and at 10^12 documents a 1024-dim float32
vector (4 KiB) per side dominates the exchange.  INT8 cuts that 4×, packed
sign bits 32×, with rank order preserved well enough for candidate
generation / pre-scoring (exact float rerank only on survivors).

Representations:

* INT8    -> ``array<tinyint>``  round(clip(v*127)) — symmetric, assumes
             L2-normalized input (all providers here normalize)
* UINT8   -> ``array<smallint>`` round((v+1)/2*255) (Spark has no unsigned
             byte type; values are 0..255)
* BINARY/UBINARY -> ``binary``   sign bits MSB-first via packbits, dim/8
             bytes; the two differ only in the reference's output container

All UDFs are Arrow-batched and vectorized (one numpy matrix op per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    BinaryType,
    DoubleType,
    IntegerType,
    ShortType,
)

EMBEDDING_TYPES = ("float", "int8", "uint8", "binary", "ubinary")


def _stack(v: pd.Series) -> np.ndarray:
    return np.vstack(v.to_numpy()).astype(np.float64)


def _scatter(v: pd.Series, mask: pd.Series, values: list) -> pd.Series:
    out: list = [None] * len(v)
    for j, i in enumerate(np.flatnonzero(mask.to_numpy())):
        out[i] = values[j]
    return pd.Series(out, dtype=object)


@pandas_udf(ArrayType(ByteType()))
def int8_quantize_udf(v: pd.Series) -> pd.Series:
    mask = v.notna()
    if not mask.any():
        return pd.Series([None] * len(v), dtype=object)
    m = _stack(v[mask])
    q = np.clip(np.rint(m * 127.0), -127, 127).astype(np.int8)
    return _scatter(v, mask, list(q))


@pandas_udf(ArrayType(ShortType()))
def uint8_quantize_udf(v: pd.Series) -> pd.Series:
    mask = v.notna()
    if not mask.any():
        return pd.Series([None] * len(v), dtype=object)
    m = _stack(v[mask])
    q = np.clip(np.rint((m + 1.0) * 127.5), 0, 255).astype(np.int16)
    return _scatter(v, mask, list(q))


@pandas_udf(BinaryType())
def binary_quantize_udf(v: pd.Series) -> pd.Series:
    mask = v.notna()
    if not mask.any():
        return pd.Series([None] * len(v), dtype=object)
    m = _stack(v[mask])
    bits = (m > 0).astype(np.uint8)
    packed = np.packbits(bits, axis=1)  # MSB-first, dim/8 bytes
    return _scatter(v, mask, [p.tobytes() for p in packed])


def quantize(df, vec_col: str, kind: str, out_col: str | None = None):
    """Append a quantized variant of ``vec_col`` (column name defaults to
    ``<vec_col>_<kind>``).  ``kind='float'`` is a no-op passthrough."""
    if kind not in EMBEDDING_TYPES:
        raise ValueError(f"unknown embedding type {kind!r}; have {EMBEDDING_TYPES}")
    if kind == "float":
        return df
    out_col = out_col or f"{vec_col}_{kind}"
    udf = {
        "int8": int8_quantize_udf,
        "uint8": uint8_quantize_udf,
        "binary": binary_quantize_udf,
        "ubinary": binary_quantize_udf,
    }[kind]
    return df.withColumn(out_col, udf(F.col(vec_col)))


def _int8_cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine over int8-quantized vectors, float64 accumulation.  Rank order
    tracks the float cosine (quantization noise ~1/127 per component)."""
    mask = a.notna() & b.notna()
    out = np.zeros(len(a), dtype=np.float64)
    if mask.any():
        ma = np.vstack(a[mask].to_numpy()).astype(np.float64)
        mb = np.vstack(b[mask].to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = np.where(norms > 0, dots / norms, 0.0)
        out[mask.to_numpy()] = vals
    return pd.Series(out).where(mask, other=None)


int8_cosine_udf = pandas_udf(DoubleType())(_int8_cosine_batch)

# independent non-deterministic-marked instance for threshold-filter sites
# (guide §4.4) — see similarity.cosine_udf_filter_safe for why this must
# NOT be `int8_cosine_udf.asNondeterministic()` (that mutates the shared
# underlying UserDefinedFunction for every call site)
int8_cosine_udf_filter_safe = pandas_udf(DoubleType())(
    _int8_cosine_batch
).asNondeterministic()


_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
)


@pandas_udf(IntegerType())
def binary_hamming_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Hamming distance between packed sign-bit vectors (vectorized byte-xor
    + popcount table — no per-bit Python)."""
    mask = a.notna() & b.notna()
    out = np.zeros(len(a), dtype=np.int32)
    if mask.any():
        ma = np.vstack([np.frombuffer(x, dtype=np.uint8) for x in a[mask]])
        mb = np.vstack([np.frombuffer(x, dtype=np.uint8) for x in b[mask]])
        out[mask.to_numpy()] = _POPCOUNT[np.bitwise_xor(ma, mb)].sum(axis=1)
    return pd.Series(out, dtype="int32").where(mask, other=None)


def binary_cosine_expr(hamming: Column, dim: int | Column) -> Column:
    """Sign-bit cosine estimate from hamming distance: for random-ish
    hyperplane sign sketches cos(theta) ≈ cos(pi * h / dim) (Charikar'02,
    the same estimator as operators/ann.py's LSH).  ``dim`` may be a
    Column (e.g. ``octet_length(packed) * 8``) so the plan stays
    schema-driven."""
    import math

    d = F.lit(float(dim)) if isinstance(dim, int) else dim.cast("double")
    return F.cos(F.lit(math.pi) * hamming.cast("double") / d)


def binary_cosine_from_packed(a: Column, b: Column) -> Column:
    """Sign-sketch cosine estimate straight from two packed-bit columns —
    the ONE shared pre-scoring expression (hamming UDF + Charikar
    estimate, bit width read off the column itself)."""
    return binary_cosine_expr(
        binary_hamming_udf(a, b), F.octet_length(a) * F.lit(8)
    )
