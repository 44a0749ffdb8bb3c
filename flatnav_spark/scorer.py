"""BM25 scoring kernels — the analog of flatnav's pluggable distance
interface (include/flatnav/distances/DistanceInterface.h:22-59 with L2/IP
implementations). Where flatnav dispatches SIMD kernels by CPU feature
(L2DistanceDispatcher.h:39-87), we stay in float64 numpy: Arrow batches are
Spark's vectorization story, and float64 + fixed summation order buys the
rank-identical determinism the parity contract requires (reference relies
on float ordering in Index.h:396-406; we make it explicit).

Variant: Lucene-style BM25 —
    idf(df)         = ln(1 + (N - df + 0.5) / (df + 0.5))        (always > 0)
    tfn(tf, dl)     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)     = sum over unique query terms, ascending term order,
                      of idf * tfn, accumulated in float64.
Duplicate query terms count once (short-query convention). Ties broken by
ascending doc_id everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75

    def to_dict(self) -> dict:
        return {"k1": self.k1, "b": self.b}

    @staticmethod
    def from_dict(d: dict) -> "BM25Params":
        return BM25Params(k1=float(d["k1"]), b=float(d["b"]))


def idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Lucene BM25 idf, float64, elementwise over df."""
    df64 = np.asarray(df, dtype=np.float64)
    return np.log1p((float(n_docs) - df64 + 0.5) / (df64 + 0.5))


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, params: BM25Params) -> np.ndarray:
    """Term-frequency normalization component (idf-free), float64."""
    tf64 = np.asarray(tf, dtype=np.float64)
    dl64 = np.asarray(dl, dtype=np.float64)
    denom = tf64 + params.k1 * (1.0 - params.b + params.b * dl64 / float(avgdl))
    return tf64 * (params.k1 + 1.0) / denom


def term_scores(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
) -> np.ndarray:
    """Per-posting BM25 contribution of one term: idf(df) * tfn(tf, dl)."""
    return float(idf(np.array([df]), n_docs)[0]) * tf_norm(tf, dl, avgdl, params)


def block_max_tfn(tf: np.ndarray, dl: np.ndarray, avgdl: float, params: BM25Params) -> float:
    """Upper bound of tfn over a posting block (WAND block-max summary).

    Stored idf-free so block encoding needs no global df; the query path
    multiplies by idf(df) to get the block's score upper bound."""
    return float(tf_norm(tf, dl, avgdl, params).max())
