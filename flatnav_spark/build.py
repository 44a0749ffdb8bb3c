"""Index build pipeline — the ``Index::addBatch`` analog
(include/flatnav/index/Index.h:300-329), re-architected for Spark's bulk
shuffle/aggregate execution model instead of flatnav's lock-guarded
in-memory arena inserts (Index.h:353-378).

Pipeline (two checkpointable stages):

Stage 1 — per-group tokenize + doc-id assignment (``allocateNode`` analog,
Index.h:262-272, but without a mutex: ids are a deterministic pure function
of the row key and the split count):

    split   = pmod(xxhash64(repo, path, commit), n_splits)
    ordinal = row_number() over (partition by split order by repo,path,commit)
    doc_id  = (ordinal - 1) * n_splits + split

  No global sort, no range-partitioner sampling, no driver bottleneck:
  ids are dense-ish (compress well under gap coding), stable across
  re-runs/cluster sizes, and balanced across splits by hash. Each group of
  splits writes its ``docs`` rows and ``(term, doc_id, tf, dl)`` runs to a
  checkpoint directory with a lineage marker — the resumable unit
  (north_rule: "resumable from checkpoint with per-partition lineage").

Stage 2 — term-keyed merge into block-max segments (``connectNeighbors``
merge analog, Index.h:765-834):

    block_id = doc_id // block_range
    groupBy(term, block_id) -> varint gap-coded segment + block_max_tfn

  Grouping on (term, block_id) IS the hot-term skew treatment: block_id is
  a deterministic doc-range salt, so ``import`` with df=10^9 becomes many
  bounded groups (each <= block_range docs) instead of one straggler task.
  The per-(term,doc) tf aggregation before it relies on map-side partial
  aggregation (high-cardinality key, no skew); the per-term stats
  aggregation reduces pre-combined partials. AQE skew-join splitting stays
  on as a backstop.

All heavy lifting is DataFrame ops + Arrow-vectorized applyInPandas; the
only Python that touches data runs per Arrow batch on numpy arrays.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Optional

import numpy as np
import pandas as pd

from flatnav_spark.index_io import MANIFEST_VERSION, IndexManifest, LoadedIndex
from flatnav_spark.scorer import BM25Params
from flatnav_spark.tokenizer import make_tfmap_udf

DEFAULT_BLOCK_RANGE = 4096
DEFAULT_N_SPLITS = 64
DEFAULT_N_GROUPS = 8

_STAGE1 = "_stage1"


def _config_hash(mode: str, params: BM25Params, block_range: int, n_splits: int) -> str:
    payload = json.dumps(
        {
            "version": MANIFEST_VERSION,
            "mode": mode,
            "k1": params.k1,
            "b": params.b,
            "block_range": block_range,
            "n_splits": n_splits,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _marker_path(out_path: str, group: int) -> str:
    return os.path.join(out_path, _STAGE1, f"group={group}", "_DONE.json")


def _stage1_group(corpus_split, out_path: str, group: int, n_groups: int,
                  n_splits: int, mode: str, cfg_hash: str) -> None:
    """Tokenize + id-assign one group of splits; write docs + tf runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gdir = os.path.join(out_path, _STAGE1, f"group={group}")
    spark = corpus_split.sparkSession
    sub = corpus_split.filter(F.pmod(F.col("split"), F.lit(n_groups)) == group)

    w = Window.partitionBy("split").orderBy("repo", "path", "commit")
    tfmap = make_tfmap_udf(mode)
    base = sub.withColumn("ordinal", F.row_number().over(w)).withColumn(
        "doc_id", (F.col("ordinal") - 1) * F.lit(int(n_splits)) + F.col("split")
    )

    # single tokenizer pass: UDF emits pre-counted (term -> tf) maps; dl is
    # the JVM-side sum of map values; explode is JVM-side. No groupBy — the
    # per-(term,doc) aggregation already happened inside the Arrow batch.
    tf = (
        base.withColumn("tfmap", tfmap(F.col("content")))
        .withColumn(
            "dl",
            F.aggregate(F.map_values("tfmap"), F.lit(0).cast("long"), lambda a, x: a + x),
        )
        .select("doc_id", "dl", F.explode("tfmap").alias("term", "tf"))
        .withColumn("tf", F.col("tf").cast("long"))
    )
    tf.write.mode("overwrite").parquet(os.path.join(gdir, "tf"))

    # docs table: metadata + sha (no tokenizer); dl joined back from the
    # written tf run (zero-token docs get dl=0)
    dls = (
        spark.read.parquet(os.path.join(gdir, "tf"))
        .select("doc_id", "dl")
        .distinct()
    )
    docs_out = (
        base.select(
            "doc_id", "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
        .join(F.broadcast(dls), "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0).cast("long")))
    )
    docs_out.write.mode("overwrite").parquet(os.path.join(gdir, "docs"))

    # lineage marker: config + content fingerprint of the group's input,
    # computed from the WRITTEN docs table (cheap narrow re-read)
    fp_row = (
        spark.read.parquet(os.path.join(gdir, "docs"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # order-independent, overflow-free content fingerprint
            F.expr("bit_xor(xxhash64(repo, path, `commit`, content_sha))").alias("fp"),
        )
        .collect()[0]
    )
    with open(_marker_path(out_path, group), "w") as f:
        json.dump(
            {"group": group, "config_hash": cfg_hash,
             "n_docs": int(fp_row["n"] or 0), "input_fingerprint": int(fp_row["fp"] or 0)},
            f,
        )


def _make_segment_encoder(block_range: int):
    """mapInPandas kernel over a (term, block_id)-partitioned stream sorted
    by (term, block_id, doc_id): emits one varint-coded segment row per
    (term, block_id) group, fully vectorized — group boundaries by numpy
    diff, gap/varint coding in one pass over the whole batch, block-max by
    ``np.maximum.reduceat``. (selectNeighbors analog, Index.h:714-763: the
    persisted per-block summary that query-time pruning relies on.)

    Groups can span Arrow batch boundaries: the trailing group of each
    batch is carried into the next."""
    from flatnav_spark.codec import encode_groups, grouped_gaps

    _COLS = ("term", "block_id", "doc_id", "tf", "dl")

    def encode_frame(cols) -> pd.DataFrame:
        terms = cols["term"]
        blocks = cols["block_id"]
        doc_ids = cols["doc_id"]
        tfs = cols["tf"]
        dls = cols["dl"]
        n = len(terms)

        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (terms[1:] != terms[:-1]) | (blocks[1:] != blocks[:-1])
        starts = np.flatnonzero(changed)
        ends = np.append(starts[1:], n)

        bases = blocks[starts] * block_range
        gaps = grouped_gaps(doc_ids, starts, bases)
        docs_bin = encode_groups(gaps, starts)
        tfs_bin = encode_groups(tfs, starts)
        dls_bin = encode_groups(dls, starts)
        # block summary = (max tf, min dl): tfn is increasing in tf and
        # decreasing in dl, so tfn(max_tf, min_dl) >= every tfn in the
        # block for ANY avgdl — unlike a materialized bmax_tfn, the bound
        # stays valid when the corpus grows (extend_index shifts avgdl)
        max_tf = np.maximum.reduceat(tfs, starts)
        min_dl = np.minimum.reduceat(dls, starts)

        return pd.DataFrame(
            {
                "term": terms[starts],
                "block_id": blocks[starts],
                "n": (ends - starts).astype(np.int32),
                "docs_bin": docs_bin,
                "tfs_bin": tfs_bin,
                "dls_bin": dls_bin,
                "block_max_tf": max_tf,
                "block_min_dl": min_dl,
            }
        )

    def encode_partition(batches):
        carry = None  # dict of numpy arrays: the trailing (possibly
        # incomplete) group of the previous batch
        for pdf in batches:
            if pdf.empty:
                continue
            cols = {
                "term": pdf["term"].to_numpy(),
                "block_id": pdf["block_id"].to_numpy(np.int64),
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "tf": pdf["tf"].to_numpy(np.int64),
                "dl": pdf["dl"].to_numpy(np.int64),
            }
            if carry is not None:
                cols = {c: np.concatenate([carry[c], cols[c]]) for c in _COLS}
            terms, blocks = cols["term"], cols["block_id"]
            n = len(terms)
            tail_mask = (terms == terms[-1]) & (blocks == blocks[-1])
            if tail_mask.all():
                carry = cols  # whole batch is one group: keep carrying
                continue
            split = n - int(tail_mask[::-1].argmin())
            carry = {c: cols[c][split:] for c in _COLS}
            yield encode_frame({c: cols[c][:split] for c in _COLS})
        if carry is not None and len(carry["term"]):
            yield encode_frame(carry)

    return encode_partition


def build_index(
    corpus_df,
    out_path: str,
    mode: str = "code",
    params: BM25Params = BM25Params(),
    block_range: int = DEFAULT_BLOCK_RANGE,
    n_splits: int = DEFAULT_N_SPLITS,
    n_groups: int = DEFAULT_N_GROUPS,
    out_partitions: Optional[int] = None,
    resume: bool = False,
) -> LoadedIndex:
    """Build a persistent inverted index from a corpus DataFrame with
    columns (repo, path, commit, lang, content). Returns a LoadedIndex.

    ``resume=True`` skips stage-1 groups whose lineage marker matches the
    current config hash (kill-and-restart safe); any marker from a
    different config aborts the build rather than forking lineage.
    """
    from pyspark.sql import functions as F

    spark = corpus_df.sparkSession
    cfg_hash = _config_hash(mode, params, block_range, n_splits)

    if not resume and os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path, exist_ok=True)

    corpus_split = corpus_df.withColumn(
        "split", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_splits)).cast("long")
    )

    # ---- stage 1: per-group checkpointed tokenize + id assignment ----
    # groups are independent jobs; submit them from parallel driver threads
    # so the scheduler overlaps their stages (wall clock ~ max, not sum) —
    # the executeInParallel analog (Multithreading.h:18-48) at job level
    pending = []
    for group in range(n_groups):
        marker = _marker_path(out_path, group)
        if os.path.exists(marker):
            with open(marker) as f:
                meta = json.load(f)
            if meta.get("config_hash") != cfg_hash:
                raise ValueError(
                    f"stage1 group {group} checkpoint was built with a different "
                    f"config ({meta.get('config_hash')} != {cfg_hash}); refusing to resume"
                )
            continue
        pending.append(group)
    if pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(pending), 4)) as pool:
            futures = [
                pool.submit(
                    _stage1_group, corpus_split, out_path, g, n_groups, n_splits, mode, cfg_hash
                )
                for g in pending
            ]
            for f in futures:
                f.result()

    return _stage2(spark, out_path, mode, params, block_range, n_splits, out_partitions, cfg_hash)


def _stage2(spark, out_path, mode, params, block_range, n_splits,
            out_partitions, cfg_hash) -> LoadedIndex:
    """Term-keyed merge of all stage-1 runs into the final index tables.
    Rerunnable: consumes whatever checkpointed groups exist (including
    extension groups) and rewrites postings/docs/stats/manifest."""
    import glob as _glob

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs_all = spark.read.parquet(os.path.join(out_path, _STAGE1, "group=*", "docs"))
    tf_all = spark.read.parquet(os.path.join(out_path, _STAGE1, "group=*", "tf"))

    # ---- corpus stats (exact integer arithmetic -> deterministic avgdl) ----
    stats_row = docs_all.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    n_docs = int(stats_row["n_docs"])
    total_dl = int(stats_row["total_dl"] or 0)

    if out_partitions is None:
        out_partitions = max(spark.sparkContext.defaultParallelism, 8)

    # ---- stage 2a: per-term stats (map-side combined aggregation) ----
    term_stats = tf_all.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    (
        term_stats.repartitionByRange(out_partitions, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_path, "stats"))
    )
    term_stats = spark.read.parquet(os.path.join(out_path, "stats"))

    # ---- stage 2b: block-summary posting segments ----
    seg_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("block_id", T.LongType(), False),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("docs_bin", T.BinaryType(), False),
            T.StructField("tfs_bin", T.BinaryType(), False),
            T.StructField("dls_bin", T.BinaryType(), False),
            T.StructField("block_max_tf", T.LongType(), False),
            T.StructField("block_min_dl", T.LongType(), False),
        ]
    )
    encode = _make_segment_encoder(block_range)
    postings = (
        tf_all.withColumn("block_id", (F.col("doc_id") / F.lit(block_range)).cast("long"))
        # range partitioning doubles as the final term-sorted layout (the
        # gorder/RCM locality analog): one shuffle serves both the encoder's
        # co-location requirement and the query-time row-group pruning
        .repartitionByRange(out_partitions, "term", "block_id")
        .sortWithinPartitions("term", "block_id", "doc_id")
        .mapInPandas(encode, schema=seg_schema)
    )
    postings.write.mode("overwrite").parquet(os.path.join(out_path, "postings"))

    # ---- docs table, doc_id-ordered layout ----
    (
        docs_all.repartitionByRange(out_partitions, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out_path, "docs"))
    )

    # ---- manifest + metrics ----
    seg_df = spark.read.parquet(os.path.join(out_path, "postings"))
    seg_row = seg_df.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("n").alias("n_postings"),
        F.sum(F.length("docs_bin") + F.length("tfs_bin") + F.length("dls_bin")).alias("payload_bytes"),
    ).collect()[0]
    skew_row = term_stats.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.max("df").alias("max_df"),
        F.avg("df").alias("mean_df"),
    ).collect()[0]

    n_postings = int(seg_row["n_postings"] or 0)
    lineage = {}
    for marker in sorted(_glob.glob(os.path.join(out_path, _STAGE1, "group=*", "_DONE.json"))):
        with open(marker) as f:
            meta = json.load(f)
        lineage[str(meta["group"])] = meta

    manifest = IndexManifest(
        version=MANIFEST_VERSION,
        tokenizer_mode=mode,
        k1=params.k1,
        b=params.b,
        block_range=block_range,
        n_splits=n_splits,
        n_docs=n_docs,
        total_dl=total_dl,
        n_terms=int(skew_row["n_terms"] or 0),
        n_postings=n_postings,
        config_hash=cfg_hash,
        metrics={
            "n_segments": int(seg_row["n_segments"] or 0),
            "payload_bytes": int(seg_row["payload_bytes"] or 0),
            "bytes_per_posting": (float(seg_row["payload_bytes"]) / n_postings) if n_postings else 0.0,
            "skew_ratio_max_df_over_mean": (
                float(skew_row["max_df"]) / float(skew_row["mean_df"])
                if skew_row["mean_df"]
                else 0.0
            ),
        },
        lineage=lineage,
    )
    manifest.save(out_path)
    return LoadedIndex(out_path, manifest)


def extend_index(spark, index: LoadedIndex, new_corpus_df,
                 out_partitions: Optional[int] = None) -> LoadedIndex:
    """Incremental insert — the ``Index::add`` analog for a live index
    (Index.h:353-378): append new documents without re-tokenizing the
    existing corpus.

    New docs get doc_ids continuing each split's ordinal sequence, so
    existing doc_ids never change. Documents whose (repo, path, commit)
    already exists are skipped (idempotent re-adds). Stage 2 reruns over
    all checkpointed runs — old + new — so stats (df, avgdl) are globally
    correct; block summaries are avgdl-independent by design, and BM25
    scores naturally shift with the grown corpus exactly as the reference
    scorer's would."""
    import glob as _glob

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out_path = index.path
    # always operate on the ON-DISK state: the caller may hold a stale
    # handle from before a previous extension
    m = IndexManifest.load(out_path)
    index = LoadedIndex(out_path, m)
    params = m.params
    cfg_hash = _config_hash(m.tokenizer_mode, params, m.block_range, m.n_splits)
    if cfg_hash != m.config_hash:
        raise ValueError("manifest config hash mismatch; refusing to extend")

    # next extension group id, from the checkpoint directories themselves
    ext_ids = [
        int(os.path.basename(d).split("=ext")[1])
        for d in _glob.glob(os.path.join(out_path, _STAGE1, "group=ext*"))
    ]
    ext = f"ext{max(ext_ids) + 1 if ext_ids else 0}"
    gdir = os.path.join(out_path, _STAGE1, f"group={ext}")

    existing = index.docs(spark).select("repo", "path", "commit")
    fresh = new_corpus_df.join(existing, ["repo", "path", "commit"], "left_anti")
    if fresh.isEmpty():
        return index  # idempotent re-add: nothing new, index unchanged

    # per-split ordinal offsets from existing doc_ids (doc_id = ord*S + split)
    S = m.n_splits
    offsets = (
        index.docs(spark)
        .select(
            F.pmod(F.col("doc_id"), F.lit(S)).alias("split"),
            (F.col("doc_id") / F.lit(S)).cast("long").alias("ordinal"),
        )
        .groupBy("split")
        .agg((F.max("ordinal") + 1).alias("offset"))
    )

    sub = fresh.withColumn(
        "split", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(S)).cast("long")
    ).join(F.broadcast(offsets), "split", "left").withColumn(
        "offset", F.coalesce(F.col("offset"), F.lit(0).cast("long"))
    )

    w = Window.partitionBy("split").orderBy("repo", "path", "commit")
    tfmap = make_tfmap_udf(m.tokenizer_mode)
    base = sub.withColumn("ordinal", F.row_number().over(w) - 1 + F.col("offset")).withColumn(
        "doc_id", F.col("ordinal") * F.lit(S) + F.col("split")
    )

    tf = (
        base.withColumn("tfmap", tfmap(F.col("content")))
        .withColumn(
            "dl",
            F.aggregate(F.map_values("tfmap"), F.lit(0).cast("long"), lambda a, x: a + x),
        )
        .select("doc_id", "dl", F.explode("tfmap").alias("term", "tf"))
        .withColumn("tf", F.col("tf").cast("long"))
    )
    tf.write.mode("overwrite").parquet(os.path.join(gdir, "tf"))

    dls = spark.read.parquet(os.path.join(gdir, "tf")).select("doc_id", "dl").distinct()
    docs_out = (
        base.select(
            "doc_id", "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
        .join(F.broadcast(dls), "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0).cast("long")))
    )
    docs_out.write.mode("overwrite").parquet(os.path.join(gdir, "docs"))

    fp_row = (
        spark.read.parquet(os.path.join(gdir, "docs"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(repo, path, `commit`, content_sha))").alias("fp"),
        )
        .collect()[0]
    )
    with open(os.path.join(gdir, "_DONE.json"), "w") as f:
        json.dump(
            {"group": ext, "config_hash": cfg_hash,
             "n_docs": int(fp_row["n"] or 0), "input_fingerprint": int(fp_row["fp"] or 0)},
            f,
        )

    return _stage2(spark, out_path, m.tokenizer_mode, params, m.block_range,
                   m.n_splits, out_partitions, cfg_hash)
