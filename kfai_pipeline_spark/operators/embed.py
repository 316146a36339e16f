"""Embedding connector (U2): batched text -> vector encoding at the
chunk grain.

The reference encodes in CUDA batches of 128 with normalized outputs
(ref loaders/build_vector_store.py:22-29). Spark form: ``mapInPandas``
— each Arrow batch is re-chunked into ``batch_size`` encoder calls, so
a 1000-executor run drives 1000 independent encoder instances with no
shuffle. The encoder is INJECTED: production wraps a model server /
GPU library; ``hash_embed`` is the deterministic stub (unit-norm, so
cosine math downstream behaves like real normalized embeddings).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose with F)
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

Encoder = Callable[[list[str]], list[list[float]]]


def hash_embed(texts: list[str], dim: int = 64) -> list[list[float]]:
    """Deterministic unit-norm pseudo-embeddings: sha256-seeded values
    per (text, lane). A stable stand-in for a real encoder in tests —
    identical text -> identical vector, cosine(v, v) == 1."""
    out = []
    for t in texts:
        vals = []
        for lane in range(dim):
            h = hashlib.sha256(f"{lane}\x00{t}".encode()).digest()
            vals.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        out.append([v / n for v in vals])
    return out


def embed_texts(
    df: DataFrame,
    encoder: Encoder | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 128,
) -> DataFrame:
    """Append ``out_col ARRAY<FLOAT>`` by batching ``text_col`` through
    ``encoder`` (default: the hash stub). NULL text -> NULL vector."""
    import pandas as pd

    enc = encoder or hash_embed
    out_schema = StructType(df.schema.fields + [StructField(out_col, ArrayType(FloatType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vectors: list[list[float] | None] = [None] * len(pdf)
            texts = pdf[text_col].tolist()
            todo = [i for i, t in enumerate(texts) if t is not None]
            for lo in range(0, len(todo), batch_size):
                idxs = todo[lo : lo + batch_size]
                for i, vec in zip(idxs, enc([texts[i] for i in idxs])):
                    vectors[i] = vec
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(vectors, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
