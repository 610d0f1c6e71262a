"""Embedding providers — the Spark analog of the reference's Bedrock clients.

The reference generates embeddings with AWS Bedrock (Titan/Cohere) behind a
``ModelAdapter`` ABC (reference lib/bedrock/adapters/base_model_adapter.py:11-79)
and 100 async workers (lib/vectorize_columns.py:36-38).  Here a provider is a
factory for an Arrow-batched pandas UDF: partition parallelism replaces the
worker pool, and Arrow batching replaces request coalescing.

The default provider reproduces the reference's OWN deterministic test
embedder (tests/lib/opensearch/integration/
test_services_search_service_integration.py:188-202):

    digest = md5(utf8(text)).digest()          # 16 bytes
    v[i]   = digest[i % 16] / 128.0 - 1.0      # i in 0..dim-1

identical text => identical vector (cosine 1.0); distinct text =>
quasi-random vector.  A real sentence-embedding model is a drop-in
replacement behind the same interface (it is not installed in this
container, so ``SentenceEmbeddingProvider`` raises NotImplementedError).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 1024  # reference lib/setup_opensearch.py:19 (Titan fixed 1024)


class EmbeddingProvider:
    """Provider interface: ``dim`` + a batch embed over a pandas Series.

    Mirrors the reference ModelAdapter contract (validate dims, format
    input/output — base_model_adapter.py:23-37) minus the HTTP transport.
    """

    name = "base"

    def __init__(self, dim: int = DEFAULT_DIM):
        if dim <= 0:
            raise ValueError(f"embedding dim must be positive, got {dim}")
        self.dim = dim

    def embed_batch(self, texts: pd.Series) -> np.ndarray:  # (n, dim) float32
        raise NotImplementedError

    def udf(self) -> Callable[..., Column]:
        """Return a pandas UDF ``text -> array<float>`` for this provider."""
        provider = self

        @pandas_udf(ArrayType(FloatType()))
        def _embed(texts: pd.Series) -> pd.Series:
            mat = provider.embed_batch(texts)
            out = pd.Series(list(mat))
            # null/None text => null embedding (reference skips NaN rows
            # before embedding, lib/evaluate.py:97-107)
            nulls = texts.isna().to_numpy()
            if nulls.any():
                out[nulls] = None
            return out

        return _embed


class HashEmbeddingProvider(EmbeddingProvider):
    """Deterministic md5-hash embedding (the reference's test scheme)."""

    name = "hash-md5"

    def embed_one(self, text: str) -> list[float]:
        """Pure-Python single-text version, shared with pytest oracles."""
        digest = hashlib.md5(text.encode()).digest()
        return [(digest[i % 16] / 128.0) - 1.0 for i in range(self.dim)]

    def embed_batch(self, texts: pd.Series) -> np.ndarray:
        n = len(texts)
        digests = np.zeros((n, 16), dtype=np.uint8)
        for i, t in enumerate(texts):
            if t is None or (isinstance(t, float) and np.isnan(t)):
                continue
            digests[i] = np.frombuffer(hashlib.md5(str(t).encode()).digest(), dtype=np.uint8)
        reps = -(-self.dim // 16)  # ceil
        tiled = np.tile(digests, (1, reps))[:, : self.dim]
        return (tiled.astype(np.float32) / 128.0) - 1.0


class TokenHashEmbeddingProvider(EmbeddingProvider):
    """Feature-hashing ("hashing trick") bag-of-features embedding.

    Features = lowercased word unigrams + char 3-grams per word; each feature
    is crc32-hashed to a bucket with a ±1 sign bit, counts L2-normalized.
    Cosine between two vectors then approximates token/ngram overlap — a
    deterministic, model-free stand-in for a sentence embedding that (unlike
    the md5 scheme) is *meaningful for near-duplicates*: token swaps cost 0,
    an abbreviation costs ~1/n.  Public technique: feature hashing
    (Weinberger et al., ICML'09) == Spark MLlib HashingTF.
    """

    name = "token-hash"

    def __init__(self, dim: int = 256, ngram: int = 3):
        super().__init__(dim=dim)
        self.ngram = ngram

    def _features(self, text: str) -> list[str]:
        tokens = str(text).lower().split()
        feats = list(tokens)
        n = self.ngram
        for t in tokens:
            if len(t) > n:
                feats.extend(t[i : i + n] for i in range(len(t) - n + 1))
        return feats

    def embed_one(self, text: str) -> list[float]:
        return list(self.embed_batch(pd.Series([text]))[0])

    def embed_batch(self, texts: pd.Series) -> np.ndarray:
        import zlib

        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            if t is None or (isinstance(t, float) and np.isnan(t)):
                continue
            vec = np.zeros(self.dim, dtype=np.float32)
            for f in self._features(t):
                h = zlib.crc32(f.encode("utf-8"))
                sign = 1.0 if (h >> 31) & 1 else -1.0
                vec[h % self.dim] += sign
            norm = float(np.linalg.norm(vec))
            if norm > 0:
                out[i] = vec / norm
        return out


class SentenceEmbeddingProvider(EmbeddingProvider):
    """Placeholder for a real sentence-transformer model.

    The model libraries are not available in this container; on a real
    cluster this would load the model once per executor python worker and
    run Arrow-batched inference.  The Spark-side plumbing (schema, UDF
    signature, batching) is identical to HashEmbeddingProvider.
    """

    name = "sentence-transformer"

    def embed_batch(self, texts: pd.Series) -> np.ndarray:
        raise NotImplementedError(
            "sentence-transformer weights are not available in this "
            "environment; use HashEmbeddingProvider (deterministic) or plug "
            "a model-backed provider in on the cluster"
        )


PROVIDERS: dict[str, type[EmbeddingProvider]] = {
    HashEmbeddingProvider.name: HashEmbeddingProvider,
    TokenHashEmbeddingProvider.name: TokenHashEmbeddingProvider,
    SentenceEmbeddingProvider.name: SentenceEmbeddingProvider,
}


def get_provider(name: str = "hash-md5", dim: int = DEFAULT_DIM) -> EmbeddingProvider:
    if name not in PROVIDERS:
        raise KeyError(f"unknown embedding provider {name!r}; have {sorted(PROVIDERS)}")
    return PROVIDERS[name](dim=dim)


def with_embedding(
    df,
    text_col: str = "text",
    out_col: str | None = None,
    provider: EmbeddingProvider | None = None,
):
    """Append an ``<text_col>_embedding`` column (reference sibling-column
    convention, lib/vectorize_columns.py:146-158)."""
    provider = provider or HashEmbeddingProvider(dim=DEFAULT_DIM)
    out_col = out_col or f"{text_col}_embedding"
    return df.withColumn(out_col, provider.udf()(F.col(text_col)))
