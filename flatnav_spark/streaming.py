"""Structured Streaming ingest — continuous index maintenance.

The reference mutates a live index point-by-point under a write path the
caller drives (``Index::add``, Index.h:353-378; thread fan-out
Multithreading.h:18-48). The Spark-native equivalent is a *stream*: new
corpus files land in a directory (the object-store drop zone of a real
pipeline), Structured Streaming's file source discovers them exactly once
(checkpointed offsets), and every micro-batch becomes one
``extend_index`` generation — O(new docs + vocab) work per batch, never
O(corpus). ``optimize_index`` folds accumulated generations back into one
clustered table when they pass a threshold, so a forever-running ingest
keeps a bounded read amplification.

Exactly-once story (the part worth reading twice): the file source's
checkpoint makes each input file processed once per *successful* batch,
and ``extend_index`` is idempotent on (repo, path, commit) with a
crash-safe atomic manifest commit — so a batch replayed after a crash
mid-extend either finds its group checkpoint complete and appends nothing
new, or re-encodes the orphaned group. Restarting the stream with the
same checkpoint directory is therefore safe at every kill point; the
index never double-counts a document (tests/test_streaming.py drives a
checkpointed stop-and-restart; extend's kill-point crash safety is
exercised in tests/test_extend.py and tests/test_resume_invariance.py).

At 100 TB the same topology holds: the drop zone is an object-store
prefix, maxFilesPerTrigger bounds batch size, and each micro-batch's
extend is a small distributed job whose cost tracks the batch, not the
index.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T

# single source of truth for the 5-column corpus contract: corpus.REQUIRED_COLUMNS
from flatnav_spark.corpus import REQUIRED_COLUMNS

CORPUS_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), False) for c in REQUIRED_COLUMNS]
)


def corpus_stream(spark, source_dir: str, max_files_per_trigger: Optional[int] = None):
    """Streaming DataFrame over a drop-zone directory of corpus parquet
    files (the BASELINE.json input_hint schema). The file source requires
    an explicit schema — streaming can't infer one from files that don't
    exist yet."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def ingest_rate_stats(stream_df, window: str = "10 seconds",
                      watermark: str = "30 seconds"):
    """Windowed ingest monitoring: docs + bytes per lang per arrival-time
    window. The watermark bounds state (windows older than it are closed
    and evicted) — the standard late-data pattern, applied to the ingest
    telemetry the build pipeline already reports per batch (M5 metrics)."""
    return (
        stream_df.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("content")).alias("n_bytes"),
        )
    )


DEDUP_OUTPUT_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, sha string"
)


def stream_dedup(stream_df):
    """Streaming exact deduplication — the stateful-operator form of
    textops' sha-groupBy dedup: the first document carrying each content
    sha256 passes through, every later duplicate (same micro-batch or any
    LATER one) is dropped. State is one boolean per seen sha, managed by
    ``applyInPandasWithState`` and restored from the checkpoint on
    restart, so dedup holds across stream restarts exactly like ingest's
    exactly-once story. Within a batch the representative is the smallest
    (repo, path, commit) — deterministic at any parallelism.

    Scale shape: state is keyed by sha (hash-partitioned, scales with
    executors); per-group traffic is only that sha's duplicates. At 100 TB
    the state store holds one tiny row per distinct document — the same
    footprint the batch dedup's groupBy shuffle pays per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = ["repo", "path", "commit", "lang", "content", "sha"]

    def dedup(key, pdfs, state):
        import pandas as pd

        if state.exists:
            return  # sha emitted in an earlier batch: drop all duplicates
        best = None
        for pdf in pdfs:
            if len(pdf):
                pick = pdf.sort_values(["repo", "path", "commit"]).head(1)
                if best is None or tuple(pick.iloc[0][["repo", "path", "commit"]]) < tuple(
                    best.iloc[0][["repo", "path", "commit"]]
                ):
                    best = pick
        state.update((True,))
        if best is not None:
            yield best[cols]

    return (
        stream_df.withColumn("sha", F.sha2("content", 256))
        .groupBy("sha")
        .applyInPandasWithState(
            dedup, DEDUP_OUTPUT_SCHEMA, "seen boolean", "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_ingest(
    spark,
    index_path: str,
    source_dir: str,
    checkpoint_dir: str,
    optimize_every: Optional[int] = None,
    optimize_strategy: str = "doc",
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
    processing_time: Optional[str] = None,
    out_partitions: Optional[int] = None,
):
    """Run the streaming ingest: every micro-batch of new corpus files is
    appended to the index at ``index_path`` as one extend generation;
    when ``optimize_every`` generations accumulate, the postings are
    compacted in place. Returns the started StreamingQuery —
    ``available_now=True`` (the default) drains everything currently in
    the drop zone and stops (awaitTermination() to block), a
    ``processing_time`` trigger keeps it running forever."""
    from flatnav_spark.build import extend_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.maintenance import optimize_index

    def ingest_batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        # everything inside the batch runs on the micro-batch's session so
        # extend's joins never mix DataFrames across session clones
        sess = batch_df.sparkSession
        idx = extend_index(sess, load_index(index_path), batch_df,
                           out_partitions=out_partitions)
        if optimize_every and len(idx.manifest.postings_dirs) >= optimize_every:
            optimize_index(sess, idx, out_partitions=out_partitions,
                           strategy=optimize_strategy)

    writer = (
        corpus_stream(spark, source_dir, max_files_per_trigger)
        .writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query) -> None:
    """Block until an availableNow stream finishes. awaitTermination
    raises StreamingQueryException on any batch failure (including
    foreachBatch Python errors); this wrapper just names the intent at
    call sites."""
    query.awaitTermination()
