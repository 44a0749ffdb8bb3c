"""Batched BM25 top-k query — the analog of flatnav's batched ``search``
(python-bindings/src/flatnav/bindings.cpp:161-228: thread fan-out over
queries against a shared read-only index). Here the read-only index is the
postings parquet, the fan-out is Spark task parallelism over posting
blocks, and the per-query state is a numpy top-k heap per task.

Plan shape — ONE shuffle on the hot path, no join:

  1. tokenize queries with the index's tokenizer (same UDF as build),
     join term_stats for df — the query-term table is tiny (bounded by the
     query batch), so it is collected and closure-broadcast to every task,
     the analog of flatnav's shared read-only index + per-thread queries.
  2. postings scan with a literal ``term IN (...)`` filter (row-group
     pruning on the term-sorted layout) — only segments of query terms
     are read and shuffled.
  3. repartition by block_id, sortWithinPartitions(block_id, term),
     mapInPandas scorer: each task walks its blocks in order; per block it
     decodes every needed segment ONCE and accumulates contributions for
     all queries (vectorized per (term, query) pair, ascending term order
     per doc — the determinism contract shared with
     flatnav_spark.reference). Because block_id = doc_id // block_range is
     term-independent, a doc's full score is computed in exactly one task.
  4. per-task per-query top-k (k rows out per query per task), then a
     final window row_number() over (score desc, doc_id asc) <= k — the
     Q4 sort+truncate analog (Index.h:402-406) with explicit tie-breaking.

Block-max WAND pruning (``prune=True``) — the early-termination analog of
beamSearch's ``max_dist`` cutoff (Index.h:630-632), lossless and
SINGLE-pass: within a task, the per-query threshold t_k from blocks
already scored only grows; a later block whose metadata upper bound
(sum of idf * tfn(block_max_tf, block_min_dl) over the query's terms,
float-safety inflated)
is strictly below t_k provably cannot change the top-k — the global
k-th score is >= any task-local k-th score. Skipped work is counted via
accumulators (the ``_distance_computations`` analog, Index.h:83-84).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from flatnav_spark.codec import decode_gaps, varint_decode
from flatnav_spark.index_io import LoadedIndex
from flatnav_spark.scorer import idf as idf_fn
from flatnav_spark.scorer import tf_norm
from flatnav_spark.tokenizer import make_tokenize_udf

# multiplicative + absolute inflation of upper bounds: guards against
# summation-order float drift between the metadata-side bound and the
# exact scorer; keeps WAND lossless.
_UB_REL = 1e-9
_UB_ABS = 1e-12


class _TopK:
    """Per-query bounded result set with (score desc, doc_id asc) order."""

    __slots__ = ("k", "doc_ids", "scores")

    def __init__(self, k: int):
        self.k = k
        self.doc_ids = np.empty(0, dtype=np.int64)
        self.scores = np.empty(0, dtype=np.float64)

    def push(self, doc_ids: np.ndarray, scores: np.ndarray) -> None:
        d = np.concatenate([self.doc_ids, doc_ids])
        s = np.concatenate([self.scores, scores])
        order = np.lexsort((d, -s))[: self.k]
        self.doc_ids, self.scores = d[order], s[order]

    def threshold(self) -> float:
        """Score a candidate must beat (or tie) to enter: the k-th score,
        or -inf while the set is not full."""
        if self.scores.size < self.k:
            return -np.inf
        return float(self.scores[-1])


def _make_partition_scorer(
    qmap: Dict[str, List[Tuple[int, float]]],
    query_ids: np.ndarray,
    n_docs: int,
    avgdl: float,
    params,
    block_range: int,
    k: int,
    prune: bool,
    acc_blocks_scored=None,
    acc_blocks_pruned=None,
):
    """mapInPandas kernel over a block_id-partitioned, (block_id, term)-
    sorted stream of posting segments. Memory per task: O(block_range ×
    n_queries_active) float64 for the accumulator — bound the query batch
    size upstream for very large Q.

    All per-query bookkeeping is vectorized: per term, the queries using it
    are a pair of numpy arrays (indices, idf weights); upper bounds and the
    accumulate are fancy-indexed adds / outer products. The outer-product
    accumulate applies, per (query, doc) cell, exactly one scalar IEEE add
    of w*tfn per term in ascending term order — bit-identical to the
    reference scorer's sequential accumulation (IEEE multiply commutes)."""
    n_q = len(query_ids)
    # term -> (query index array, idf weight array)
    term_entries = {
        t: (
            np.array([q for q, _ in entry], dtype=np.int64),
            np.array([w for _, w in entry], dtype=np.float64),
        )
        for t, entry in qmap.items()
    }

    def score_partition(batches):
        topk = [_TopK(k) for _ in range(n_q)]
        thr = np.full(n_q, -np.inf)  # per-query k-th score lower bound
        n_scored = 0
        n_pruned = 0

        def do_block(pdf: pd.DataFrame) -> None:
            nonlocal n_scored, n_pruned
            block_id = int(pdf["block_id"].iloc[0])
            base = block_id * block_range
            terms = pdf["term"].to_numpy()
            # avgdl-independent block summary -> tfn upper bound per term:
            # tfn is increasing in tf, decreasing in dl, so
            # tfn(max_tf, min_dl) dominates every posting in the block
            bmaxes = tf_norm(
                pdf["block_max_tf"].to_numpy(np.int64),
                pdf["block_min_dl"].to_numpy(np.int64),
                avgdl,
                params,
            )

            # metadata-only per-query upper bound for this block
            ub = np.zeros(n_q, dtype=np.float64)
            for t_i in range(len(terms)):
                e = term_entries.get(terms[t_i])
                if e is None:
                    continue
                ub[e[0]] += e[1] * bmaxes[t_i]
            present = ub > 0  # queries with at least one term in this block
            ub[present] = ub[present] * (1.0 + _UB_REL) + _UB_ABS

            active = present & (ub >= thr) if prune else present
            if not active.any():
                n_pruned += 1
                return
            n_scored += 1

            acc = np.zeros((block_range, n_q), dtype=np.float64)
            seen = np.zeros((block_range, n_q), dtype=bool)
            # rows arrive term-ascending (sortWithinPartitions) — per-doc
            # accumulation order matches the reference scorer exactly
            for row in pdf.itertuples(index=False):
                e = term_entries.get(row.term)
                if e is None:
                    continue
                mask = active[e[0]]
                if not mask.any():
                    continue
                qi = e[0][mask]
                w = e[1][mask]
                ids = decode_gaps(row.docs_bin, base)
                tfs = varint_decode(row.tfs_bin).astype(np.int64)
                dls = varint_decode(row.dls_bin).astype(np.int64)
                tfn = tf_norm(tfs, dls, avgdl, params)
                li = ids - base
                cell = np.ix_(li, qi)
                acc[cell] += np.multiply.outer(tfn, w)
                seen[cell] = True

            for q_idx in np.flatnonzero(active):
                rows = np.flatnonzero(seen[:, q_idx])
                if rows.size == 0:
                    continue
                t = topk[q_idx]
                t.push(rows + base, acc[rows, q_idx])
                thr[q_idx] = t.threshold()

        carry: Optional[pd.DataFrame] = None
        for batch in batches:
            pdf = pd.concat([carry, batch]) if carry is not None else batch
            if pdf.empty:
                carry = None
                continue
            last = pdf["block_id"].iloc[-1]
            head = pdf[pdf["block_id"] != last]
            carry = pdf[pdf["block_id"] == last]
            if not head.empty:
                for _, grp in head.groupby("block_id", sort=True):
                    do_block(grp)
        if carry is not None and not carry.empty:
            do_block(carry)

        if acc_blocks_scored is not None:
            acc_blocks_scored.add(n_scored)
        if acc_blocks_pruned is not None:
            acc_blocks_pruned.add(n_pruned)

        out_q, out_d, out_s = [], [], []
        for q_idx in range(n_q):
            t = topk[q_idx]
            if t.doc_ids.size:
                out_q.append(np.full(t.doc_ids.size, query_ids[q_idx], dtype=np.int64))
                out_d.append(t.doc_ids)
                out_s.append(t.scores)
        if out_q:
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "score": np.concatenate(out_s),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "query_id": np.empty(0, dtype=np.int64),
                    "doc_id": np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64),
                }
            )

    return score_partition


def _query_terms(spark, index: LoadedIndex, queries_df):
    """(query_id, term, df) for query terms that exist in the index.

    The broadcast of the (tiny) query-term set into the term_stats join is
    the analog of flatnav's broadcastable entry-point stats (B4,
    Index.h:845-870)."""
    from pyspark.sql import functions as F

    tokenize = make_tokenize_udf(index.manifest.tokenizer_mode)
    q_terms = (
        queries_df.select("query_id", F.explode(tokenize(F.col("query_text"))).alias("term"))
        .distinct()
    )
    stats = index.term_stats(spark)
    return stats.join(F.broadcast(q_terms), "term").select("query_id", "term", "df")


def batch_query(
    spark,
    index: LoadedIndex,
    queries_df,
    k: int = 10,
    prune: bool = True,
    num_partitions: Optional[int] = None,
    collect_metrics: bool = False,
):
    """Top-k BM25 for a DataFrame of (query_id, query_text).

    Returns (query_id, rank, doc_id, score) — rank 1-based, score desc,
    ties by ascending doc_id. Queries with no indexed terms return no rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = index.manifest
    # driver-side collect of the query-term table: bounded by the query
    # batch (|queries| × |terms per query|), never by corpus size
    qt_rows = _query_terms(spark, index, queries_df).collect()
    if not qt_rows:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")

    qids = sorted({r["query_id"] for r in qt_rows})
    q_index = {q: i for i, q in enumerate(qids)}
    qmap: Dict[str, List[Tuple[int, float]]] = {}
    for r in qt_rows:
        w = float(idf_fn(np.array([r["df"]]), m.n_docs)[0])
        qmap.setdefault(r["term"], []).append((q_index[r["query_id"]], w))
    terms = sorted(qmap.keys())

    postings = index.postings(spark).filter(F.col("term").isin(terms))
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    acc_s = spark.sparkContext.accumulator(0) if collect_metrics else None
    acc_p = spark.sparkContext.accumulator(0) if collect_metrics else None
    scorer = _make_partition_scorer(
        qmap, np.array(qids, dtype=np.int64), m.n_docs, m.avgdl, m.params,
        m.block_range, k, prune, acc_s, acc_p,
    )
    cand = (
        postings.repartition(num_partitions, "block_id")
        .sortWithinPartitions("block_id", "term")
        .mapInPandas(scorer, "query_id long, doc_id long, score double")
    )

    w_final = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    result = (
        cand.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", "score")
    )
    if collect_metrics:
        result._flatnav_accumulators = {"blocks_scored": acc_s, "blocks_pruned": acc_p}
    return result
