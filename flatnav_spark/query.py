"""Batched BM25 top-k query — the analog of flatnav's batched ``search``
(python-bindings/src/flatnav/bindings.cpp:161-228: thread fan-out over
queries against a shared read-only index). Here the read-only index is the
postings parquet and the fan-out is Spark task parallelism.

Plan shape (one wide shuffle on the hot path):

  1. tokenize queries with the index's tokenizer (same UDF as build)
  2. distinct (query_id, term); join term_stats for df; collect the tiny
     distinct-term list to push ``term IN (...)`` into the parquet scan
     (row-group pruning on the term-sorted postings layout)
  3. postings ⋈ broadcast(query terms) on term
  4. groupBy(query_id, block_id) → applyInPandas exact scorer.
     Because block_id = doc_id // block_range is term-independent, every
     posting of a given doc lands in the same group — a doc's full score
     is computed in exactly one task, in float64, in ascending term order
     (the determinism contract shared with flatnav_spark.reference).
     Per-group local top-k bounds shuffle output to k rows per block.
  5. final window: row_number() over (partition by query_id
     order by score desc, doc_id asc) <= k   (the Q4 sort+truncate analog,
     Index.h:402-406, with explicit tie-breaking)

Block-max WAND pruning (``prune=True``) — the early-termination analog of
beamSearch's ``max_dist`` cutoff (Index.h:630-632), lossless:

  phase 0: per (query, block) upper bound from segment metadata only
           (sum of idf * bmax_tfn, no decode), inflated by a float-safety
           margin so the bound provably dominates any summation order
  phase 1: score just enough highest-bound blocks to cover >= k docs,
           establishing a per-query threshold t_k (a true lower bound of
           the k-th best score)
  phase 2: score remaining blocks only where ub >= t_k; union; final top-k

Accumulators report blocks_scored / blocks_pruned (the
``_distance_computations`` analog, Index.h:83-84).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from flatnav_spark.codec import decode_gaps, varint_decode
from flatnav_spark.index_io import LoadedIndex
from flatnav_spark.scorer import idf as idf_fn
from flatnav_spark.tokenizer import make_tokenize_udf

# multiplicative + absolute inflation of upper bounds: guards against
# summation-order float drift between the metadata-side bound and the
# exact scorer; keeps WAND lossless.
_UB_REL = 1e-9
_UB_ABS = 1e-12


def _make_block_scorer(n_docs: int, avgdl: float, params, block_range: int,
                       k: int, acc_scored=None):
    """applyInPandas kernel: one (query_id, block_id) group of posting
    segments -> local top-k (query_id, doc_id, score) rows."""
    from flatnav_spark.scorer import tf_norm

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        block_id = int(pdf["block_id"].iloc[0])
        base = block_id * block_range
        acc = np.zeros(block_range, dtype=np.float64)
        seen = np.zeros(block_range, dtype=bool)
        # ascending term order => deterministic per-doc summation order
        pdf = pdf.sort_values("term", kind="mergesort")
        for row in pdf.itertuples(index=False):
            ids = decode_gaps(row.docs_bin, base)
            tfs = varint_decode(row.tfs_bin).astype(np.int64)
            dls = varint_decode(row.dls_bin).astype(np.int64)
            w = float(idf_fn(np.array([row.df]), n_docs)[0])
            contrib = w * tf_norm(tfs, dls, avgdl, params)
            li = ids - base
            acc[li] += contrib  # unique indices per term: exact single adds
            seen[li] = True
        li = np.flatnonzero(seen)
        if li.size == 0:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        scores = acc[li]
        doc_ids = li + base
        if li.size > k:
            # top-k by (-score, doc_id): lexsort keys are last-key-primary
            order = np.lexsort((doc_ids, -scores))[:k]
        else:
            order = np.lexsort((doc_ids, -scores))
        if acc_scored is not None:
            acc_scored.add(len(pdf))
        return pd.DataFrame(
            {"query_id": qid, "doc_id": doc_ids[order], "score": scores[order]}
        )

    return score


def _query_terms(spark, index: LoadedIndex, queries_df):
    """(query_id, term, df) for terms that exist in the index.

    The broadcast of the (tiny) query-term set into the term_stats join is
    the analog of flatnav's broadcastable entry-point stats (B4,
    Index.h:845-870): per-query global knowledge shipped to every worker."""
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
    collect_metrics: bool = False,
) -> "DataFrame":
    """Top-k BM25 for a DataFrame of (query_id, query_text).

    Returns (query_id, rank, doc_id, score) — rank 1-based, score desc,
    ties by ascending doc_id. Queries with no indexed terms return no rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = index.manifest
    qt = _query_terms(spark, index, queries_df)

    # tiny driver-side collect: the query set's distinct terms, pushed into
    # the parquet scan as a literal IN-filter for row-group pruning
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )

    postings = index.postings(spark).filter(F.col("term").isin(terms))
    joined = postings.join(F.broadcast(qt), "term")

    acc_scored = spark.sparkContext.accumulator(0) if collect_metrics else None
    scorer = _make_block_scorer(m.n_docs, m.avgdl, m.params, m.block_range, k, acc_scored)
    out_schema = "query_id long, doc_id long, score double"

    if prune:
        # ---- phase 0: metadata-only upper bounds per (query, block) ----
        idf_col = F.log1p((F.lit(float(m.n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        meta = joined.select(
            "query_id", "block_id", "term", "n", "df", "docs_bin", "tfs_bin", "dls_bin",
            (idf_col * F.col("bmax_tfn")).alias("ub_term"),
        )
        ub = meta.groupBy("query_id", "block_id").agg(
            F.sum("ub_term").alias("ub_raw"), F.max("n").alias("max_n")
        ).withColumn("ub", F.col("ub_raw") * (1.0 + _UB_REL) + _UB_ABS)

        # ---- phase 1: score enough best blocks to cover >= k docs ----
        w_ub = Window.partitionBy("query_id").orderBy(F.desc("ub"), F.asc("block_id"))
        ub = ub.withColumn(
            "cum_docs_before",
            F.coalesce(
                F.sum("max_n").over(w_ub.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
            ),
        ).withColumn("phase1", F.col("cum_docs_before") < k)

        sel = joined.join(ub.select("query_id", "block_id", "ub", "phase1"),
                          ["query_id", "block_id"])
        p1_rows = sel.filter("phase1")
        p1_scores = (
            p1_rows.groupBy("query_id", "block_id")
            .applyInPandas(scorer, out_schema)
            .persist()  # consumed twice: threshold derivation + final union
        )

        w_rank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        p1_ranked = p1_scores.withColumn("r", F.row_number().over(w_rank))
        thresholds = (
            p1_ranked.filter(F.col("r") == k)
            .select("query_id", F.col("score").alias("t_k"))
        )

        # ---- phase 2: remaining blocks that can still beat t_k ----
        p2_rows = (
            sel.filter(~F.col("phase1"))
            .join(F.broadcast(thresholds), "query_id", "left")
            .filter(F.col("t_k").isNull() | (F.col("ub") >= F.col("t_k")))
            .drop("t_k")
        )
        p2_scores = p2_rows.groupBy("query_id", "block_id").applyInPandas(scorer, out_schema)
        cand = p1_scores.unionByName(p2_scores)
    else:
        cand = joined.groupBy("query_id", "block_id").applyInPandas(scorer, out_schema)

    w_final = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    result = (
        cand.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", "score")
    )
    return result
