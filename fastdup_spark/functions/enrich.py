"""Pluggable model-enrichment stage functions — the text analog of the
reference's model-based enrichment run modes (captions/tagging:
/root/reference/fastdup/captions.py:1-150, models_ram.py; embedding
extraction: embeddings_timm.py): a user-supplied batch model runs over the
docs table as an Arrow-batched pandas function and its outputs persist as a
pipeline stage.

The built-in default is a DETERMINISTIC hashing embedder (the "feature
hashing" / hashing-trick text representation): tokens hash into a fixed
number of buckets, counts L2-normalize into a dense unit vector. No model
weights, no downloads — stable across runs/processes (pandas' fixed-key
siphash), so it is testable end-to-end and a drop-in source for
`build_embedding_index` until a real embedding model is plugged in. A real
deployment swaps in e.g. a sentence-transformer batch fn with the same
(pdf in -> pdf out) contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HASHING_EMBEDDER_SCHEMA = "doc_id bigint, embedding array<float>"


def hashing_embedder(dim: int = 64):
    """Batch model fn: (doc_id, text, ...) frame -> (doc_id, embedding).

    ``dim`` is rounded up to a power of two so bucketing is a mask, not a
    modulo (large-array uint64 modulo hits a slow numpy scalar path on
    this host). Hashing uses pandas.util.hash_array — keyed siphash with a
    FIXED key, deterministic across workers and sessions.
    """
    dim = 1 << int(np.ceil(np.log2(max(dim, 2))))
    mask = np.uint64(dim - 1)

    def model(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = pdf["text"].fillna("").str.lower().str.split()
        exploded = toks.reset_index(drop=True).explode().dropna()
        mat = np.zeros((len(pdf), dim), dtype=np.float64)
        if len(exploded):
            rows = exploded.index.to_numpy(dtype=np.int64)
            buckets = (pd.util.hash_array(exploded.to_numpy(dtype=object))
                       & mask).astype(np.int64)
            np.add.at(mat, (rows, buckets), 1.0)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(mat, norms, out=mat, where=norms > 0)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "embedding": list(mat.astype(np.float32)),
        })

    model.__name__ = f"hashing_embedder_{dim}"
    return model
