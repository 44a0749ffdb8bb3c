"""Brute-force reference BM25 scorer — the ground-truth oracle.

Plays the role of ann-benchmarks golden ground-truth files in the
reference's test strategy (experiments/README.md:205-211; recall check
python-bindings/unit_tests/test_utils.py:57-91), but exact: the engine's
distributed top-k must be RANK-IDENTICAL (same doc_ids AND same float64
scores) to this single-process implementation.

Determinism contract shared with the engine:
- accumulate per-doc scores over unique query terms in ascending term order,
- float64 throughout,
- ties broken by ascending doc_id,
- idf/tfn formulas from flatnav_spark.scorer (single source of truth).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from flatnav_spark.scorer import BM25Params, get_scorer, idf, tf_norm
from flatnav_spark.tokenizer import get_tokenizer


class ReferenceIndex:
    """In-memory exact inverted index over a small corpus. ``scorer``
    selects the same pluggable scorer variants the engine exposes
    (bm25 / tfidf_ip — the L2/IP pair)."""

    def __init__(
        self,
        docs: Sequence[Tuple[int, str]],
        mode: str = "code",
        params: BM25Params = BM25Params(),
        scorer: str = "bm25",
    ):
        tokenize = get_tokenizer(mode)
        self.params = params
        self.mode = mode
        self.scorer = get_scorer(scorer)
        self.postings: Dict[str, Dict[int, int]] = {}
        self.dl: Dict[int, int] = {}
        for doc_id, content in docs:
            toks = tokenize(content)
            self.dl[int(doc_id)] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[int(doc_id)] = tf
        self.n_docs = len(self.dl)
        total = sum(self.dl.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def score(self, query_text: str) -> Dict[int, float]:
        """Exact per-doc scores for one query (unique terms, ascending)."""
        tokenize = get_tokenizer(self.mode)
        terms = sorted(set(tokenize(query_text)))
        acc: Dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            w = self.scorer.weight(df, self.n_docs)
            doc_ids = np.fromiter(plist.keys(), dtype=np.int64, count=df)
            order = np.argsort(doc_ids)
            doc_ids = doc_ids[order]
            tfs = np.fromiter(plist.values(), dtype=np.int64, count=df)[order]
            dls = np.array([self.dl[d] for d in doc_ids], dtype=np.int64)
            contrib = w * self.scorer.tfn(tfs, dls, self.avgdl, self.params)
            for d, c in zip(doc_ids.tolist(), contrib.tolist()):
                acc[d] = acc.get(d, 0.0) + c
        return acc

    def top_k(self, query_text: str, k: int) -> List[Tuple[int, int, float]]:
        """[(rank 1-based, doc_id, score)] — desc score, ties by asc doc_id."""
        acc = self.score(query_text)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]


def golden_topk(
    docs: Sequence[Tuple[int, str]],
    queries: Sequence[Tuple[int, str]],
    k: int = 10,
    mode: str = "code",
    params: BM25Params = BM25Params(),
    scorer: str = "bm25",
) -> List[Tuple[int, int, int, float]]:
    """Golden table rows (query_id, rank, doc_id, score) for a query set."""
    ref = ReferenceIndex(docs, mode=mode, params=params, scorer=scorer)
    out: List[Tuple[int, int, int, float]] = []
    for qid, qtext in queries:
        for rank, doc_id, score in ref.top_k(qtext, k):
            out.append((int(qid), rank, doc_id, score))
    return out
