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
  re-runs/cluster sizes, and balanced across splits by hash. Each group
  writes ONE combined table per group —

    (doc_id, repo, path, commit, lang, content_sha, dl, tfmap)

  — in a single tokenizer pass (zstd parquet). One write, no join, no
  broadcast of any corpus-sized table (round-1 scale-killer removed:
  tf-map and dl are computed on the same projection the docs columns come
  from). Storing the per-doc tf MAP instead of exploded posting rows cuts
  stage-1 I/O several-fold: doc_id/dl appear once per doc instead of once
  per posting, and parquet dictionary-encodes the map's term keys. A
  lineage marker (config hash, row count, key fingerprint) makes the group
  the resumable unit (north_rule: "resumable from checkpoint with
  per-partition lineage").

Stage 2 — term-keyed merge into block-max segments (``connectNeighbors``
merge analog, Index.h:765-834):

    explode(tfmap) -> chunk_id = doc_id // (block_range * chunk_blocks)
    repartitionByRange(term, chunk_id) -> one chunked varint segment row
    per (term, chunk), with per-block sub-run skip arrays in-row
    term stats (df, cf) are then derived FROM the segments (sum of per-
    segment n / sum_tf) — no second full-corpus aggregation pass.

  Grouping on (term, chunk_id) IS the hot-term skew treatment: chunk_id is
  a deterministic doc-range salt, so ``import`` with df=10^9 becomes many
  bounded groups (each <= block_range * chunk_blocks docs) instead of one
  straggler task. AQE skew handling stays on as a backstop.

All heavy lifting is DataFrame ops + Arrow-vectorized mapInPandas; the
only Python that touches data runs per Arrow batch on numpy arrays.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from flatnav_spark.index_io import MANIFEST_VERSION, IndexManifest, LoadedIndex
from flatnav_spark.scorer import BM25Params
from flatnav_spark.tokenizer import make_tfmap_udf


def _phase_timer():
    """Env-gated phase timing (FLATNAV_BUILD_TIMING=1): prints one line per
    build phase to stderr — the bottleneck-diagnosis tool behind the
    BENCH/BASELINE.md scaling analysis."""
    import sys
    import time

    if os.environ.get("FLATNAV_BUILD_TIMING") != "1":
        return lambda label: None
    state = {"t": time.perf_counter()}

    def mark(label: str) -> None:
        now = time.perf_counter()
        print(f"[build-timing] {label}: {now - state['t']:.2f}s", file=sys.stderr)
        state["t"] = now

    return mark

DEFAULT_BLOCK_RANGE = 4096
DEFAULT_N_SPLITS = 64
DEFAULT_N_GROUPS = 8
DEFAULT_CHUNK_BLOCKS = 16

_STAGE1 = "_stage1"


def _config_hash(mode: str, params: BM25Params, block_range: int, n_splits: int,
                 chunk_blocks: int = DEFAULT_CHUNK_BLOCKS) -> str:
    payload = json.dumps(
        {
            "version": MANIFEST_VERSION,
            "mode": mode,
            "k1": params.k1,
            "b": params.b,
            "block_range": block_range,
            "n_splits": n_splits,
            "chunk_blocks": chunk_blocks,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _marker_path(out_path: str, group) -> str:
    return os.path.join(out_path, _STAGE1, f"group={group}", "_DONE.json")


def _complete_groups(out_path: str) -> List[Tuple[str, dict]]:
    """Stage-1 groups with a valid lineage marker, sorted by name.
    Marker-less directories are crashed partial writes — NOT returned."""
    import glob as _glob

    out = []
    for gdir in sorted(_glob.glob(os.path.join(out_path, _STAGE1, "group=*"))):
        marker = os.path.join(gdir, "_DONE.json")
        if os.path.exists(marker):
            with open(marker) as f:
                out.append((os.path.basename(gdir).split("=", 1)[1], json.load(f)))
    return out


def _clean_orphan_groups(out_path: str) -> List[str]:
    """Delete stage-1 group dirs that have no lineage marker (a crashed
    write): their parquet may be partial and must not feed stage 2 or the
    doc-id offset computation (the orphaned-group doc_id-collision hazard)."""
    import glob as _glob

    removed = []
    for gdir in _glob.glob(os.path.join(out_path, _STAGE1, "group=*")):
        if not os.path.exists(os.path.join(gdir, "_DONE.json")):
            shutil.rmtree(gdir)
            removed.append(gdir)
    return removed


def _group_docs_paths(out_path: str) -> List[str]:
    """Explicit (non-glob) paths of every complete group's docs table —
    the actual stage-2 input set."""
    return [
        os.path.join(out_path, _STAGE1, f"group={g}", "docs")
        for g, _meta in _complete_groups(out_path)
    ]


def _with_doc_features(base, mode: str):
    """content -> (content_sha, tfmap, dl) on the same projection: ONE
    tokenizer pass, no join to bring dl back (round-1 fix: the old layout
    broadcast-joined a per-document dl table, which grows linearly with
    the corpus and cannot be broadcast at 10^9 docs)."""
    from pyspark.sql import functions as F

    tfmap = make_tfmap_udf(mode)
    return (
        base.withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("tfmap", tfmap(F.col("content")))
        .withColumn(
            "dl",
            F.aggregate(F.map_values("tfmap"), F.lit(0).cast("long"), lambda a, x: a + x),
        )
        .select(
            "doc_id", "repo", "path", "commit", "lang", "content_sha", "dl", "tfmap"
        )
    )


def _write_group(spark, combined_df, out_path: str, group, cfg_hash: str) -> dict:
    """Write one stage-1 group (single combined docs+tfmap table, zstd)
    and its lineage marker; returns the marker dict. The fingerprints are
    collected via ``Observation`` DURING the write — the exact row stream
    the writer consumed, one Spark job instead of write + re-read (part of
    the extend fixed-floor cut, round-3 VERDICT #5). ``max_doc_id`` is
    recorded so extend_index derives its chunk boundary from markers with
    zero extra jobs (null for an empty group)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    mark = _phase_timer()
    gdir = os.path.join(out_path, _STAGE1, f"group={group}")
    obs = Observation()
    observed = combined_df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        # order-independent, overflow-free fingerprints
        F.expr("bit_xor(xxhash64(repo, path, `commit`, content_sha))").alias("fp"),
        F.expr("bit_xor(xxhash64(repo, path, `commit`))").alias("kfp"),
        F.max("doc_id").alias("max_doc_id"),
        F.min("doc_id").alias("min_doc_id"),
    )
    observed.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(gdir, "docs")
    )
    vals = obs.get
    mark(f"group={group}:tokenize-write")
    marker = {
        "group": group,
        "config_hash": cfg_hash,
        "n_docs": int(vals["n"] or 0),
        "input_fingerprint": int(vals["fp"] or 0),
        "key_fingerprint": int(vals["kfp"] or 0),
        "max_doc_id": int(vals["max_doc_id"]) if vals["max_doc_id"] is not None else None,
        "min_doc_id": int(vals["min_doc_id"]) if vals["min_doc_id"] is not None else None,
    }
    with open(os.path.join(gdir, "_DONE.json"), "w") as f:
        json.dump(marker, f)
    return marker


def _stage1_group(corpus_split, out_path: str, group: int, n_groups: int,
                  n_splits: int, mode: str, cfg_hash: str) -> None:
    """Tokenize + id-assign one group of splits; one combined write."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = corpus_split.sparkSession
    sub = corpus_split.filter(F.pmod(F.col("split"), F.lit(n_groups)) == group)
    w = Window.partitionBy("split").orderBy("repo", "path", "commit")
    base = sub.withColumn("ordinal", F.row_number().over(w)).withColumn(
        "doc_id", (F.col("ordinal") - 1) * F.lit(int(n_splits)) + F.col("split")
    )
    _write_group(spark, _with_doc_features(base, mode), out_path, group, cfg_hash)


def _verify_resume_input(corpus_split, n_groups: int, done: List[Tuple[str, dict]]) -> None:
    """Refuse to resume when the input no longer matches a checkpointed
    group's lineage (the forked-lineage hazard). One narrow job over the
    key columns only (content is never read): per-group row count +
    order-independent key fingerprint. (repo, path, commit) identifies
    content in a VCS corpus — a content edit changes the commit."""
    from pyspark.sql import functions as F

    done_numeric = {int(g): meta for g, meta in done if str(g).isdigit()}
    if not done_numeric:
        return
    rows = (
        corpus_split.groupBy(F.pmod(F.col("split"), F.lit(n_groups)).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(repo, path, `commit`))").alias("kfp"),
        )
        .collect()
    )
    current = {int(r["g"]): (int(r["n"]), int(r["kfp"] or 0)) for r in rows}
    for g, meta in done_numeric.items():
        cur = current.get(g, (0, 0))
        want = (int(meta.get("n_docs", -1)), int(meta.get("key_fingerprint", 0)))
        if cur != want:
            raise ValueError(
                f"stage1 group {g} checkpoint was built from different input "
                f"(rows/key-fp {want} != current {cur}); refusing to resume on forked lineage"
            )


def _make_segment_encoder(block_range: int, chunk_blocks: int):
    """mapInArrow kernel over a (term, chunk_id)-partitioned stream sorted
    by (term, chunk_id, doc_id): emits ONE chunked segment row per
    (term, chunk) group — a chunk spans ``chunk_blocks`` consecutive
    doc-id blocks — carrying per-block sub-run arrays (block_ids,
    block_counts, block_max_tf, block_min_dl) as in-row skip data, the
    block-max WAND summaries (selectNeighbors analog, Index.h:714-763).

    This is the round-2 defragmentation fix: a tail term with df=200
    scattered over 1000 blocks used to cost ~200 single-posting segment
    rows; chunked it costs at most n_chunks rows, cutting the postings
    table's row count (and the query path's scan/shuffle row volume)
    roughly chunk_blocks-fold while keeping block-grain pruning exact.

    Fully vectorized: terms are Arrow-dictionary-encoded (no per-posting
    Python strings), group/run boundaries by numpy diff, gap coding
    restarts at each block sub-run (grouped_gaps), per-run summaries by
    ``np.*.reduceat``. Groups can span Arrow batch boundaries: the
    trailing (term, chunk) group is carried into the next batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from flatnav_spark.codec import encode_groups, grouped_gaps

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("chunk_id", pa.int64()),
            ("n", pa.int32()),
            ("block_ids", pa.list_(pa.int64())),
            ("block_counts", pa.list_(pa.int32())),
            ("block_max_tf", pa.list_(pa.int64())),
            ("block_min_dl", pa.list_(pa.int64())),
            ("docs_bin", pa.binary()),
            ("tfs_bin", pa.binary()),
            ("dls_bin", pa.binary()),
            ("sum_tf", pa.int64()),
            ("payload_len", pa.int64()),
            ("max_dl", pa.int64()),
        ]
    )

    def encode_run(seg_terms: list, chunks: np.ndarray, doc_ids: np.ndarray,
                   tfs: np.ndarray, dls: np.ndarray, g_starts: np.ndarray,
                   g_ends: np.ndarray) -> pa.RecordBatch:
        # the group layout must tile the arrays exactly: encode_groups runs
        # to the end of each value array, so a stray tail would silently
        # corrupt the final segment
        assert len(doc_ids) == int(g_ends[-1]) and len(seg_terms) == len(g_starts)
        n = len(doc_ids)
        blocks = doc_ids // block_range
        is_start = np.zeros(n, dtype=bool)
        is_start[g_starts] = True
        chg = np.empty(n, dtype=bool)
        chg[0] = True
        chg[1:] = blocks[1:] != blocks[:-1]
        run_starts = np.flatnonzero(chg | is_start)
        run_counts = np.diff(np.append(run_starts, n))
        bases = blocks[run_starts] * block_range
        # per-run gap restart: the first gap of every block sub-run is
        # coded against that block's base, so a run decodes independently
        gaps = grouped_gaps(doc_ids, run_starts, bases)
        docs_run_bytes = encode_groups(gaps, run_starts)
        tfs_bin = encode_groups(tfs, g_starts)
        dls_bin = encode_groups(dls, g_starts)
        # run summary = (max tf, min dl): tfn is increasing in tf and
        # decreasing in dl, so tfn(max_tf, min_dl) >= every tfn in the
        # block for ANY avgdl — the bound stays valid when the corpus
        # grows (extend_index shifts avgdl)
        run_maxtf = np.maximum.reduceat(tfs, run_starts)
        run_mindl = np.minimum.reduceat(dls, run_starts)
        sum_tf = np.add.reduceat(tfs, g_starts)
        # per-SEGMENT max dl: with the segment's posting count n it yields
        # the per-term WAND floor statistic (stats floor_dl10/floor_dl100:
        # "k docs of this term exist with dl <= X") — query.py round 4
        seg_max_dl = np.maximum.reduceat(dls, g_starts)
        run_group = np.searchsorted(g_starts, run_starts, side="right") - 1
        runs_per_group = np.bincount(run_group, minlength=len(g_starts)).astype(np.int64)
        run_off = np.zeros(len(g_starts) + 1, dtype=np.int64)
        np.cumsum(runs_per_group, out=run_off[1:])
        docs_bin = []
        pos = 0
        for cnt in runs_per_group.tolist():
            docs_bin.append(b"".join(docs_run_bytes[pos: pos + cnt]))
            pos += cnt
        payload_len = np.array(
            [len(a) + len(b) + len(c) for a, b, c in zip(docs_bin, tfs_bin, dls_bin)],
            dtype=np.int64,
        )
        offsets = pa.array(run_off.astype(np.int32), type=pa.int32())
        return pa.RecordBatch.from_arrays(
            [
                pa.array(seg_terms, type=pa.string()),
                pa.array(chunks[g_starts]),
                pa.array((g_ends - g_starts).astype(np.int32)),
                pa.ListArray.from_arrays(offsets, pa.array(blocks[run_starts])),
                pa.ListArray.from_arrays(offsets, pa.array(run_counts.astype(np.int32))),
                pa.ListArray.from_arrays(offsets, pa.array(run_maxtf)),
                pa.ListArray.from_arrays(offsets, pa.array(run_mindl)),
                pa.array(docs_bin, type=pa.binary()),
                pa.array(tfs_bin, type=pa.binary()),
                pa.array(dls_bin, type=pa.binary()),
                pa.array(sum_tf),
                pa.array(payload_len),
                pa.array(seg_max_dl),
            ],
            schema=out_schema,
        )

    chunk_span = block_range * chunk_blocks

    def encode_partition(batches):
        # carry: the trailing group of the previous batch — one (term,
        # chunk) pair: (term_str, chunk_id, doc_ids, tfs, dls)
        carry = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tdict = pc.dictionary_encode(rb.column(0))
            tids = tdict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = tdict.dictionary  # pa.StringArray, one entry per distinct term
            doc_ids = rb.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            # chunk_id is derived HERE, not shipped: (term, doc_id, tf, dl)
            # at int32 tf/dl is 16 B/row less through the Arrow hop than
            # the old (term, chunk_id, doc_id, long tf, long dl) stream
            chunks = doc_ids // chunk_span
            tfs = rb.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
            dls = rb.column(3).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(tids)

            changed = np.empty(n, dtype=bool)
            changed[0] = True
            changed[1:] = (tids[1:] != tids[:-1]) | (chunks[1:] != chunks[:-1])
            if carry is not None:
                # batch starts mid-group iff it continues carry's pair
                if vocab[tids[0]].as_py() == carry[0] and chunks[0] == carry[1]:
                    changed[0] = False
                    doc_ids = np.concatenate([carry[2], doc_ids])
                    tfs = np.concatenate([carry[3], tfs])
                    dls = np.concatenate([carry[4], dls])
                    pad = len(carry[2])
                    tids = np.concatenate([np.full(pad, tids[0]), tids])
                    chunks = np.concatenate([np.full(pad, chunks[0]), chunks])
                    changed = np.concatenate([[True], np.zeros(pad - 1, bool), changed])
                    n += pad
                else:
                    yield encode_run([carry[0]], np.array([carry[1]]), carry[2],
                                     carry[3], carry[4], np.array([0]),
                                     np.array([len(carry[2])]))
                carry = None

            starts = np.flatnonzero(changed)
            last_start = int(starts[-1])
            carry = (
                vocab[tids[last_start]].as_py(),
                int(chunks[last_start]),
                doc_ids[last_start:],
                tfs[last_start:],
                dls[last_start:],
            )
            if starts.size == 1:
                continue  # entire batch is (part of) one group: keep carrying
            starts = starts[:-1]
            ends = np.append(starts[1:], last_start)
            seg_terms = pc.take(vocab, pa.array(tids[starts])).to_pylist()
            # slice OFF the carried tail: every yielded array must end at
            # the last complete group boundary
            yield encode_run(seg_terms, chunks[:last_start], doc_ids[:last_start],
                             tfs[:last_start], dls[:last_start], starts, ends)
        if carry is not None:
            yield encode_run([carry[0]], np.array([carry[1]]), carry[2],
                             carry[3], carry[4], np.array([0]),
                             np.array([len(carry[2])]))

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
    chunk_blocks: int = DEFAULT_CHUNK_BLOCKS,
) -> LoadedIndex:
    """Build a persistent inverted index from a corpus DataFrame with
    columns (repo, path, commit, lang, content). Returns a LoadedIndex.

    ``resume=True`` skips stage-1 groups whose lineage marker matches the
    current config hash AND whose input (row count + key fingerprint) still
    matches the current corpus (kill-and-restart safe); any mismatch aborts
    the build rather than forking lineage. Marker-less group directories
    (crashed writes) are deleted and redone.
    """
    from pyspark.sql import functions as F

    spark = corpus_df.sparkSession
    cfg_hash = _config_hash(mode, params, block_range, n_splits, chunk_blocks)

    if not resume and os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path, exist_ok=True)
    _clean_orphan_groups(out_path)

    corpus_split = corpus_df.withColumn(
        "split", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_splits)).cast("long")
    )

    # ---- stage 1: per-group checkpointed tokenize + id assignment ----
    # groups are independent jobs; submit them from parallel driver threads
    # so the scheduler overlaps their stages (wall clock ~ max, not sum) —
    # the executeInParallel analog (Multithreading.h:18-48) at job level
    done = _complete_groups(out_path)
    for g, meta in done:
        if meta.get("config_hash") != cfg_hash:
            raise ValueError(
                f"stage1 group {g} checkpoint was built with a different "
                f"config ({meta.get('config_hash')} != {cfg_hash}); refusing to resume"
            )
    if resume and done:
        _verify_resume_input(corpus_split, n_groups, done)
    for g, _meta in done:
        name = str(g)
        if not name.isdigit() and not name.startswith("ext"):
            raise ValueError(
                f"stage1 group {name!r} is not a build/extend checkpoint "
                "(e.g. an import_postings group); build_index cannot resume over it — "
                "use extend_index to grow an imported index"
            )
    done_ids = {int(g) for g, _ in done if str(g).isdigit()}
    pending = [g for g in range(n_groups) if g not in done_ids]
    mark = _phase_timer()
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
    mark(f"stage1:{len(pending)}-groups")

    return _stage2(spark, out_path, mode, params, block_range, n_splits,
                   out_partitions, cfg_hash, chunk_blocks)


def _auto_out_partitions(spark, n_docs: int) -> int:
    """Merge-shuffle partition count sized to DATA VOLUME, never to core
    count — the round-3 anti-scaling fix. The stage-2 merge sorts the
    exploded (term, chunk_id, doc_id) rows inside each reduce task; with
    partitions == cores, per-task sort footprint GROWS with the corpus
    while the per-task execution-memory share SHRINKS with parallelism —
    at zipf:1M x local[32] that crossed into external-sort spill + GC
    thrash and the build ran 1.9x SLOWER than at local[8] while burning 5x
    the CPU-seconds (bench/build_phases.py, BENCH/BASELINE.md round 4).
    ~8k docs (~2M posting rows at a few hundred distinct terms/doc) per
    task keeps every sort in memory at any parallelism: measured 3.4x
    faster at N32, no harm at N8. More, smaller tasks also ride AQE
    coalescing and stragglers better at cluster scale."""
    return max(spark.sparkContext.defaultParallelism, 8, n_docs // 8192)


def _stats_range_partition(term_stats, bounds, stats_parts: int):
    """Term-sorted range layout for the stats table WITHOUT a second
    range-sampling job: subsample the postings shuffle's term boundaries
    (already proportional to posting mass, which tracks vocabulary mass
    closely enough for a table this small) down to the stats partition
    count. Falls back to repartitionByRange when no boundaries exist."""
    from flatnav_spark.partitioning import repartition_term_range

    if bounds:
        terms = sorted({t for t, _c in bounds})
        if len(terms) >= stats_parts:
            idx = [(i + 1) * len(terms) // stats_parts
                   for i in range(stats_parts - 1)]
            terms = sorted({terms[i] for i in idx})
        if terms:
            return repartition_term_range(term_stats, terms)
    return term_stats.repartitionByRange(stats_parts, "term")


def _docs_range_partition(docs_all, metas, out_partitions: int):
    """doc_id-ordered docs layout via the exact zero-job dense-range
    partitioner: doc ids are dense-ish in [0, max_doc_id] by construction
    (B3), and every lineage marker records its group's max_doc_id, so the
    key-space bound costs no job. Falls back to repartitionByRange only
    for legacy markers lacking max_doc_id."""
    from flatnav_spark.partitioning import (MAX_TOKEN_ROUTE_PARTS,
                                            repartition_exact_dense_range)

    if out_partitions > MAX_TOKEN_ROUTE_PARTS:  # plan-size guard
        return docs_all.repartitionByRange(out_partitions, "doc_id")
    ids = []
    for _g, meta in metas:
        if "max_doc_id" not in meta:
            return docs_all.repartitionByRange(out_partitions, "doc_id")
        if meta["max_doc_id"] is not None:
            ids.append(int(meta["max_doc_id"]))
    hi = max(ids) + 1 if ids else 1
    return repartition_exact_dense_range(docs_all, "doc_id", hi, out_partitions)


def _stage2(spark, out_path, mode, params, block_range, n_splits,
            out_partitions, cfg_hash, chunk_blocks=DEFAULT_CHUNK_BLOCKS) -> LoadedIndex:
    """Term-keyed merge of all stage-1 runs into the final index tables.
    Rerunnable: consumes whatever checkpointed (marker-complete) groups
    exist — including extension groups — and rewrites
    postings/docs/stats/manifest.

    Crash safety (round-3 ADVICE): when a COMMITTED manifest already
    exists (resume over an extended index, import rebuild), output goes to
    fresh uniquely-named directories and the atomic manifest rewrite flips
    the references — same write-new-dir-then-commit protocol as
    _append_generation/optimize_index. The old in-place overwrite could
    crash after clobbering postings/ but before the manifest save, leaving
    a manifest that unioned the rebuilt full postings with still-listed
    extend generations (silent double counting). A fresh build (no
    manifest yet) keeps the plain postings/docs/stats names: every crash
    point there leaves no manifest at all."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    mark = _phase_timer()
    group_paths = _group_docs_paths(out_path)
    if not group_paths:
        raise ValueError(f"no complete stage-1 groups under {out_path}")
    try:
        prior = IndexManifest.load(out_path)
    except FileNotFoundError:
        prior = None  # fresh build: no committed manifest exists
    except ValueError as e:
        # a manifest EXISTS but this code can't read it (newer schema
        # version, torn file): rebuilding in place would overwrite
        # postings/docs/stats the unreadable manifest still references —
        # exactly when the directory contents are least understood.
        # Refuse; the caller must delete the index directory explicitly.
        raise ValueError(
            f"refusing to rebuild over {out_path}: existing manifest is "
            f"unreadable ({e}); delete the index directory to rebuild"
        ) from e
    if prior is None:
        p_dir, d_dir, s_dir, build_gen = "postings", "docs", "stats", 0
    else:
        build_gen = int(prior.metrics.get("build_gen", 0)) + 1
        p_dir, d_dir, s_dir = (
            f"postings_b{build_gen}", f"docs_b{build_gen}", f"stats_b{build_gen}")

    combined = spark.read.parquet(*group_paths)
    docs_all = combined.drop("tfmap")  # parquet never reads the map column
    # tf stays the stage-1 int32; dl narrows to int32 (a single doc's
    # token count — int32 by construction: it is a sum of int32 tfs over
    # one document, and a >2^31-token document would already exceed the
    # 2 GiB Arrow cell cap upstream). Halves those columns' Arrow width.
    tf_all = combined.select(
        "doc_id", F.col("dl").cast("int").alias("dl"),
        F.explode("tfmap").alias("term", "tf")
    )

    if out_partitions is None:
        out_partitions = _auto_out_partitions(
            spark, sum(int(meta.get("n_docs", 0)) for _g, meta in
                       _complete_groups(out_path)))

    # ---- stage 2a: chunked block-summary posting segments (THE shuffle) ----
    seg_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("chunk_id", T.LongType(), False),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("block_ids", T.ArrayType(T.LongType()), False),
            T.StructField("block_counts", T.ArrayType(T.IntegerType()), False),
            T.StructField("block_max_tf", T.ArrayType(T.LongType()), False),
            T.StructField("block_min_dl", T.ArrayType(T.LongType()), False),
            T.StructField("docs_bin", T.BinaryType(), False),
            T.StructField("tfs_bin", T.BinaryType(), False),
            T.StructField("dls_bin", T.BinaryType(), False),
            T.StructField("sum_tf", T.LongType(), False),
            T.StructField("payload_len", T.LongType(), False),
            T.StructField("max_dl", T.LongType(), False),
        ]
    )
    encode = _make_segment_encoder(block_range, chunk_blocks)
    chunk_span = block_range * chunk_blocks
    # range partitioning doubles as the final term-sorted layout (the
    # gorder/RCM locality analog): one shuffle serves both the encoder's
    # co-location requirement and the query-time row-group pruning.
    # Boundaries come from a DRIVER-SIDE sample of stage-1 files
    # (partitioning.sample_term_chunk_boundaries): repartitionByRange's
    # sampling job re-executes the whole read+explode child before the
    # real exchange scans it again — the entire stage-2 input computed
    # twice (measured ~11 s of the 50 s merge at zipf:200k; guide §2.4).
    from flatnav_spark.partitioning import (
        repartition_term_chunk_range, sample_term_chunk_boundaries)

    bounds = sample_term_chunk_boundaries(group_paths, out_partitions, chunk_span)
    chunk_of = F.floor(F.col("doc_id") / F.lit(chunk_span)).cast("long")
    if bounds is not None:
        # chunk_id stays an EXPRESSION through the exchange (monotone in
        # doc_id, so sorting (term, doc_id) IS the (term, chunk_id,
        # doc_id) order) — 8 B/row less shuffle width
        part = repartition_term_chunk_range(tf_all, bounds, chunk_col=chunk_of)
    else:  # sample too small to trust (tiny corpus): one sampled pass is cheap
        part = tf_all.withColumn("chunk_id", chunk_of).repartitionByRange(
            out_partitions, "term", "chunk_id").drop("chunk_id")
    seg_obs = Observation()
    postings = (
        part.sortWithinPartitions("term", "doc_id")
        .select("term", "doc_id", "tf", "dl")
        .mapInArrow(encode, schema=seg_schema)
        # segment metrics ride the write job (no separate collect pass)
        .observe(seg_obs,
                 F.count(F.lit(1)).alias("n_segments"),
                 F.sum("n").alias("n_postings"),
                 F.sum("payload_len").alias("payload_bytes"))
    )
    # the docs rewrite depends only on the stage-1 read, not on the
    # encode: submit it from a parallel driver thread so its tasks
    # back-fill executors under the merge's tail (guide §2.6 — the same
    # job-level overlap _append_generation already uses)
    from concurrent.futures import ThreadPoolExecutor

    docs_obs = Observation()

    def _write_docs():
        (
            _docs_range_partition(docs_all, _complete_groups(out_path),
                                  out_partitions)
            .sortWithinPartitions("doc_id")
            .observe(docs_obs,  # above the exchange: see skew_obs note
                     F.count(F.lit(1)).alias("n_docs"),
                     F.sum("dl").alias("total_dl"),
                     F.max("dl").alias("max_dl"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_path, d_dir))
        )
        return docs_obs.get

    pool = ThreadPoolExecutor(max_workers=1)
    docs_future = pool.submit(_write_docs)

    # zstd: 240 -> 192 MB at zipf:200k with write AND read both faster
    # (A/B'd; the sandbox taxes every written byte via its page-fault path)
    postings.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(out_path, p_dir))
    seg_vals = seg_obs.get
    seg_df = spark.read.parquet(os.path.join(out_path, p_dir))
    mark("stage2:merge-encode-write")

    # ---- stage 2b: per-term stats DERIVED from the segments ----
    # df = sum of per-segment posting counts, cf = sum of per-segment tf
    # sums: aggregates over the (already merged, much smaller) segment
    # table instead of a second full shuffle over every posting row.
    skew_obs = Observation()
    term_stats = seg_df.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        # WAND floor statistics: a segment with n >= K proves K docs of
        # the term exist with dl <= its max_dl, so w * tfn(1, floor_dlK)
        # lower-bounds the term's k-th-best contribution for k <= K —
        # the query path's zero-cost parallelism-independent threshold
        F.min(F.when(F.col("n") >= 10, F.col("max_dl"))).alias("floor_dl10"),
        F.min(F.when(F.col("n") >= 100, F.col("max_dl"))).alias("floor_dl100"),
    )
    # stats layout: reuse the postings boundaries' terms (subsampled to
    # the smaller partition count) instead of a second range-sampling job
    # over the segment aggregation
    stats_parts = max(out_partitions // 4, 1)
    stats_part = _stats_range_partition(term_stats, bounds, stats_parts)
    (
        stats_part.sortWithinPartitions("term")
        # observe ABOVE the range exchange: repartitionByRange runs a
        # sampling job over its child, so a CollectMetrics below the
        # exchange executes twice and double-counts every metric
        .observe(skew_obs,
                 F.count(F.lit(1)).alias("n_terms"),
                 F.max("df").alias("max_df"),
                 F.avg("df").alias("mean_df"))
        .write.mode("overwrite")
        .parquet(os.path.join(out_path, s_dir))
    )
    skew_vals = skew_obs.get
    mark("stage2:stats")

    # ---- docs table (submitted above, overlapping the merge) ----
    docs_vals = docs_future.result()
    pool.shutdown()
    mark("stage2:docs-rewrite")

    n_postings = int(seg_vals["n_postings"] or 0)
    lineage = {str(g): meta for g, meta in _complete_groups(out_path)}

    manifest = IndexManifest(
        version=MANIFEST_VERSION,
        tokenizer_mode=mode,
        k1=params.k1,
        b=params.b,
        block_range=block_range,
        n_splits=n_splits,
        chunk_blocks=chunk_blocks,
        n_docs=int(docs_vals["n_docs"] or 0),
        total_dl=int(docs_vals["total_dl"] or 0),
        n_terms=int(skew_vals["n_terms"] or 0),
        n_postings=n_postings,
        config_hash=cfg_hash,
        metrics={
            "n_segments": int(seg_vals["n_segments"] or 0),
            "payload_bytes": int(seg_vals["payload_bytes"] or 0),
            "bytes_per_posting": (float(seg_vals["payload_bytes"]) / n_postings) if n_postings else 0.0,
            "skew_ratio_max_df_over_mean": (
                float(skew_vals["max_df"]) / float(skew_vals["mean_df"])
                if skew_vals["mean_df"]
                else 0.0
            ),
            # longest document in the corpus: the query path derives its
            # zero-cost WAND floor w * tfn(1, max_dl) from it (query.py)
            "max_dl": int(docs_vals["max_dl"] or 0),
            "build_gen": build_gen,
        },
        lineage=lineage,
        postings_dirs=[p_dir],
        docs_dirs=[d_dir],
        stats_dir=s_dir,
    )
    manifest.save(out_path)  # atomic commit: references flip here
    # only AFTER the commit: delete every superseded table directory (old
    # build outputs, stale extend generations) — never the three just
    # committed
    import glob as _glob

    keep = {p_dir, d_dir, s_dir}
    for d in (
        _glob.glob(os.path.join(out_path, "postings*"))
        + _glob.glob(os.path.join(out_path, "docs*"))
        + _glob.glob(os.path.join(out_path, "stats*"))
    ):
        if os.path.basename(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)
    mark("stage2:metrics-manifest")
    return LoadedIndex(out_path, manifest)


def import_postings(
    spark,
    flat_df,
    out_path: str,
    mode: str = "code",
    params: BM25Params = BM25Params(),
    block_range: int = DEFAULT_BLOCK_RANGE,
    n_splits: int = DEFAULT_N_SPLITS,
    docs_df=None,
    out_partitions: Optional[int] = None,
    chunk_blocks: int = DEFAULT_CHUNK_BLOCKS,
) -> LoadedIndex:
    """Bulk-adopt a prebuilt postings table — the ``Index::buildGraphLinks``
    .mtx graph-import analog (include/flatnav/index/Index.h:187-238): build
    a complete index from an existing (term, doc_id, tf) DataFrame without
    any tokenization.

    ``docs_df`` optionally supplies document metadata (doc_id, repo, path,
    commit, lang, content_sha); absent rows get synthesized placeholders.
    doc_ids are preserved verbatim (validated unique); dl is derived as the
    per-doc tf sum. The import is materialized as a stage-1 group named
    ``import0`` and finalized by the normal stage 2, so an imported index
    is first-class: extendable, re-optimizable, stage-2 re-runnable."""
    from pyspark.sql import functions as F

    cfg_hash = _config_hash(mode, params, block_range, n_splits, chunk_blocks)
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path)

    # collapse duplicate (term, doc_id) pairs, then fold each doc's
    # postings into the stage-1 tfmap shape (sorted entries: deterministic)
    flat = flat_df.groupBy("term", "doc_id").agg(F.sum("tf").cast("int").alias("tf"))
    doc_tf = flat.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("term", "tf")))
        ).alias("tfmap"),
        F.sum("tf").cast("long").alias("dl"),
    )

    # doc_ids are preserved verbatim, so they must satisfy the engine's id
    # arithmetic: non-negative (gap codec / block_id) and below 2^53 (the
    # extend-path ordinal division is exact only in that range)
    bad = doc_tf.filter(
        (F.col("doc_id") < 0) | (F.col("doc_id") >= F.lit(1 << 53))
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"imported doc_id {int(bad[0]['doc_id'])} out of range: "
            "doc_ids must be in [0, 2^53)"
        )

    if docs_df is None:
        docs = doc_tf.select(
            "doc_id",
            F.lit("imported").alias("repo"),
            F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
            F.lit("").alias("commit"),
            F.lit("").alias("lang"),
            F.lit("").alias("content_sha"),
        )
    else:
        docs = docs_df.select("doc_id", "repo", "path", "commit", "lang", "content_sha")
        # the LEFT join below keeps only docs-side rows: a posting whose
        # doc_id is missing from docs_df would silently vanish (understating
        # n_postings/df/cf). Validate coverage and fail loudly instead.
        orphan = doc_tf.join(docs, "doc_id", "left_anti").limit(1).collect()
        if orphan:
            raise ValueError(
                f"postings reference doc_id {int(orphan[0]['doc_id'])} that is "
                "missing from docs_df; supply metadata for every posting doc_id "
                "(or pass docs_df=None to synthesize placeholders)"
            )

    combined = (
        docs.join(doc_tf, "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0).cast("long")))
        .withColumn(
            "tfmap",
            F.coalesce(
                F.col("tfmap"),
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<int>")
                ),
            ),
        )
        .select("doc_id", "repo", "path", "commit", "lang", "content_sha", "dl", "tfmap")
    )
    n = combined.count()
    n_distinct = combined.select("doc_id").distinct().count()
    if n != n_distinct:
        raise ValueError(f"imported doc_ids are not unique: {n} rows, {n_distinct} distinct")

    _write_group(spark, combined, out_path, "import0", cfg_hash)
    return _stage2(spark, out_path, mode, params, block_range, n_splits,
                   out_partitions, cfg_hash, chunk_blocks)


def extend_index(spark, index: LoadedIndex, new_corpus_df,
                 out_partitions: Optional[int] = None) -> LoadedIndex:
    """Incremental insert — the ``Index::add`` analog for a live index
    (Index.h:353-378): append new documents without re-tokenizing OR
    re-encoding the existing corpus.

    New docs get doc_ids continuing each split's ordinal sequence — but
    rounded up to the next CHUNK boundary, so no (term, chunk) pair is
    ever shared between old and new postings. That makes the merge a pure
    APPEND: the new group's segments become a fresh postings generation
    directory, docs a fresh docs generation, and term stats an
    outer-join merge of old stats with the generation's — work is
    O(new docs + vocab), never O(corpus). The manifest (written
    atomically) is the commit point; optimize_index compacts generations.

    Existing doc_ids never change; documents whose (repo, path, commit)
    already exists are skipped (idempotent re-adds). Global stats
    (df, N, avgdl) are exact after the merge; block summaries are
    avgdl-independent by design, so BM25 scores equal a fresh build's
    semantics over the grown corpus (rank-identical, tests/test_extend.py).

    Crash safety: offsets and existing keys come from the union of
    marker-complete stage-1 groups (never the final docs table); any
    checkpointed group not yet in manifest lineage — e.g. from an extend
    that crashed mid-merge — is picked up and encoded by the next call.
    Marker-less (partially written) groups are deleted first.
    """
    import glob as _glob

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out_path = index.path
    # always operate on the ON-DISK state: the caller may hold a stale
    # handle from before a previous extension
    caller = index
    caller_manifest = index.manifest
    m = IndexManifest.load(out_path)
    index = LoadedIndex(out_path, m)
    params = m.params
    cfg_hash = _config_hash(m.tokenizer_mode, params, m.block_range, m.n_splits,
                            m.chunk_blocks)
    if cfg_hash != m.config_hash:
        raise ValueError("manifest config hash mismatch; refusing to extend")

    _clean_orphan_groups(out_path)

    # next extension group id, from the checkpoint directories themselves
    ext_ids = [
        int(os.path.basename(d).split("=ext")[1])
        for d in _glob.glob(os.path.join(out_path, _STAGE1, "group=ext*"))
    ]
    ext = f"ext{max(ext_ids) + 1 if ext_ids else 0}"

    # the authoritative existing-docs view: union of all complete stage-1
    # groups (column-pruned read: keys only, tfmap never touched)
    complete = _complete_groups(out_path)
    s1_docs = spark.read.parquet(*_group_docs_paths(out_path)).select(
        "repo", "path", "commit"
    )
    fresh = new_corpus_df.join(s1_docs, ["repo", "path", "commit"], "left_anti")

    # chunk boundary above every existing doc_id, from the lineage markers
    # (written at group-write time via Observation) — zero Spark jobs; one
    # narrow fallback agg only for pre-round-4 markers lacking max_doc_id
    S = m.n_splits
    chunk_span = m.block_range * m.chunk_blocks
    if all("max_doc_id" in meta for _g, meta in complete):
        ids = [meta["max_doc_id"] for _g, meta in complete
               if meta["max_doc_id"] is not None]
        max_id = max(ids) if ids else None
    else:  # legacy index: markers predate max_doc_id
        max_id = (
            spark.read.parquet(*_group_docs_paths(out_path))
            .agg(F.max("doc_id")).collect()[0][0]
        )
    boundary = ((int(max_id) // chunk_span) + 1) * chunk_span if max_id is not None else 0

    # Every existing doc_id < boundary, so for each split the next free
    # ordinal max_ord+1 <= ceil((boundary - split)/S): the per-split offset
    # is exactly ceil((boundary - split)/S) — a row-local expression, no
    # per-split aggregation or join (round-3 VERDICT #5: this plus the
    # marker-derived boundary and Observation-folded metrics cuts the
    # extend driver round-trips from ~12 jobs to 4 writes).
    sub = fresh.withColumn(
        "split", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(S)).cast("long")
    ).withColumn(
        "offset", F.ceil((F.lit(boundary) - F.col("split")) / F.lit(S)).cast("long")
    )
    w = Window.partitionBy("split").orderBy("repo", "path", "commit")
    base = sub.withColumn(
        "ordinal", F.row_number().over(w) - 1 + F.col("offset")
    ).withColumn("doc_id", F.col("ordinal") * F.lit(S) + F.col("split"))
    # the anti-join executes inside this one write job; the marker's count
    # replaces the old standalone isEmpty() round trip
    marker = _write_group(spark, _with_doc_features(base, m.tokenizer_mode),
                          out_path, ext, cfg_hash)
    if marker["n_docs"] == 0:
        # nothing fresh: drop the empty checkpoint again
        shutil.rmtree(os.path.join(out_path, _STAGE1, f"group={ext}"),
                      ignore_errors=True)

    # merge every checkpointed group the manifest hasn't committed yet —
    # normally just the one written above, plus any from a crashed extend
    pending = [g for g, _meta in _complete_groups(out_path) if g not in m.lineage]
    if not pending:
        # idempotent re-add: nothing new on disk — but the caller's handle
        # may still predate an EARLIER extension, so sync it (and drop a
        # cache built against the stale manifest) before returning
        if vars(caller_manifest) != vars(m):
            caller_manifest.__dict__.update(vars(m))
            caller._stats_cache = None
        return index
    out = _append_generation(spark, out_path, m, pending, out_partitions)
    # sync the caller's handle (stats dir was swapped; old one is deleted)
    # AND drop its preloaded term-stats cache: a standing service that
    # extended its index must not keep serving query_one from pre-extend
    # df/floor stats against post-extend n_docs/avgdl (stale-cache scores
    # match neither index, and terms new to the corpus would silently
    # return empty). preload_term_stats re-arms it on demand.
    caller_manifest.__dict__.update(vars(out.manifest))
    caller._stats_cache = None
    return out


def _append_generation(spark, out_path: str, m: IndexManifest,
                       pending: List[str], out_partitions: Optional[int]) -> LoadedIndex:
    """Encode ONLY the pending stage-1 groups into a new postings/docs
    generation and outer-join-merge the term stats — the O(new docs)
    incremental stage 2. Chunk disjointness (extension ids start at a
    fresh chunk boundary) guarantees no (term, chunk) row exists in two
    generations. The atomic manifest rewrite commits the generation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    mark = _phase_timer()
    tag = "-".join(pending)
    gen_postings = f"postings_{tag}"
    gen_docs = f"docs_{tag}"
    gen_stats = f"stats_{tag}"

    group_paths = [os.path.join(out_path, _STAGE1, f"group={g}", "docs") for g in pending]
    combined = spark.read.parquet(*group_paths)
    docs_new = combined.drop("tfmap")
    tf_new = combined.select(
        "doc_id", F.col("dl").cast("int").alias("dl"),
        F.explode("tfmap").alias("term", "tf")
    )  # int32 tf/dl, chunk_id derived in the encoder — see _stage2

    if out_partitions is None:
        # sized to the NEW docs only — the generation is the unit of work
        metas = dict(_complete_groups(out_path))
        out_partitions = _auto_out_partitions(
            spark, sum(int(metas.get(g, {}).get("n_docs", 0)) for g in pending))

    seg_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("chunk_id", T.LongType(), False),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("block_ids", T.ArrayType(T.LongType()), False),
            T.StructField("block_counts", T.ArrayType(T.IntegerType()), False),
            T.StructField("block_max_tf", T.ArrayType(T.LongType()), False),
            T.StructField("block_min_dl", T.ArrayType(T.LongType()), False),
            T.StructField("docs_bin", T.BinaryType(), False),
            T.StructField("tfs_bin", T.BinaryType(), False),
            T.StructField("dls_bin", T.BinaryType(), False),
            T.StructField("sum_tf", T.LongType(), False),
            T.StructField("payload_len", T.LongType(), False),
            T.StructField("max_dl", T.LongType(), False),
        ]
    )
    encode = _make_segment_encoder(m.block_range, m.chunk_blocks)
    chunk_span = m.block_range * m.chunk_blocks

    # every delta/metric rides its write job as an Observation — the extend
    # fixed floor is 3 writes here + 1 group write, no standalone collects
    # (round-3 VERDICT #5). The docs write depends only on the stage-1
    # read, not on the encode, so it's submitted from a parallel driver
    # thread and overlaps the encode+stats chain (round-4 VERDICT #6:
    # wall = group + max(encode+stats, docs), not the sum — the same
    # job-level executeInParallel pattern stage 1 uses).
    from concurrent.futures import ThreadPoolExecutor

    docs_obs = Observation()

    # zero-job dense-range layout over the generation's [min, max] doc-id
    # window (from the markers — extend ids are dense-ish above the chunk
    # boundary); repartitionByRange's sampling job was one of the fixed
    # jobs in extend's floor. Legacy markers without min_doc_id fall back.
    metas_by_g = dict(_complete_groups(out_path))
    gen_metas = [metas_by_g.get(g, {}) for g in pending]
    lo_ids = [meta.get("min_doc_id") for meta in gen_metas]
    hi_ids = [meta.get("max_doc_id") for meta in gen_metas]
    have_window = (all("min_doc_id" in meta for meta in gen_metas)
                   and any(v is not None for v in lo_ids))
    docs_parts = max(out_partitions // 2, 1)

    def _docs_layout(df):
        from flatnav_spark.partitioning import (MAX_TOKEN_ROUTE_PARTS,
                                                repartition_exact_dense_range)

        if not have_window or docs_parts > MAX_TOKEN_ROUTE_PARTS:
            return df.repartitionByRange(docs_parts, "doc_id")
        lo = min(v for v in lo_ids if v is not None)
        hi = max(v for v in hi_ids if v is not None) + 1
        return repartition_exact_dense_range(
            df, "doc_id", hi - lo, docs_parts, lo=lo)

    def _write_docs():
        (
            _docs_layout(docs_new)
            .sortWithinPartitions("doc_id")
            .observe(docs_obs,  # above the exchange: see _stage2 note
                     F.count(F.lit(1)).alias("n"),
                     F.sum("dl").alias("dl"),
                     F.max("dl").alias("max_dl"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_path, gen_docs))
        )
        return docs_obs.get

    pool = ThreadPoolExecutor(max_workers=1)
    docs_future = pool.submit(_write_docs)

    # sampled-boundary range partition (see _stage2): repartitionByRange's
    # sampling job would re-execute the generation's read+explode child —
    # one of the fixed jobs in extend's floor
    from flatnav_spark.partitioning import (
        repartition_term_chunk_range, sample_term_chunk_boundaries)

    gen_bounds = sample_term_chunk_boundaries(group_paths, out_partitions, chunk_span)
    gen_chunk_of = F.floor(F.col("doc_id") / F.lit(chunk_span)).cast("long")
    if gen_bounds is not None:
        gen_part = repartition_term_chunk_range(tf_new, gen_bounds,
                                                chunk_col=gen_chunk_of)
    else:
        gen_part = tf_new.withColumn("chunk_id", gen_chunk_of).repartitionByRange(
            out_partitions, "term", "chunk_id").drop("chunk_id")
    seg_obs = Observation()
    (
        gen_part.sortWithinPartitions("term", "doc_id")
        .select("term", "doc_id", "tf", "dl")
        .mapInArrow(encode, schema=seg_schema)
        .observe(seg_obs,
                 F.count(F.lit(1)).alias("n_segments"),
                 F.sum("n").alias("n_postings"),
                 F.sum("payload_len").alias("payload_bytes"))
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(os.path.join(out_path, gen_postings))
    )
    srow = seg_obs.get
    seg_df = spark.read.parquet(os.path.join(out_path, gen_postings))
    mark(f"extend:{tag}:encode")

    # ---- stats merge: old stats ⟗ generation stats (O(vocab), no
    # posting-level work on the existing corpus) ----
    new_stats = seg_df.groupBy("term").agg(
        F.sum("n").cast("long").alias("df_new"),
        F.sum("sum_tf").cast("long").alias("cf_new"),
        F.min(F.when(F.col("n") >= 10, F.col("max_dl"))).alias("f10_new"),
        F.min(F.when(F.col("n") >= 100, F.col("max_dl"))).alias("f100_new"),
    )
    old_stats = spark.read.parquet(os.path.join(out_path, m.stats_dir))
    for c in ("floor_dl10", "floor_dl100"):  # legacy stats: treat as absent
        if c not in old_stats.columns:
            old_stats = old_stats.withColumn(c, F.lit(None).cast("long"))
    skew_obs = Observation()
    merged = (
        old_stats.join(new_stats, "term", "full_outer")
        .select(
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("df_new"), F.lit(0)))
            .cast("long").alias("df"),
            (F.coalesce(F.col("cf"), F.lit(0)) + F.coalesce(F.col("cf_new"), F.lit(0)))
            .cast("long").alias("cf"),
            # least() skips nulls: the floor stays the tightest proven
            # bound across generations
            F.least("floor_dl10", "f10_new").alias("floor_dl10"),
            F.least("floor_dl100", "f100_new").alias("floor_dl100"),
        )
    )
    (
        # reuse the generation boundaries' terms: the stats-merge child is
        # a full outer join (old stats scan + new agg) that a range
        # sampling job would execute twice
        _stats_range_partition(merged, gen_bounds, max(out_partitions // 4, 1))
        .sortWithinPartitions("term")
        .observe(skew_obs,  # above the exchange: see _stage2 note
                 F.count(F.lit(1)).alias("n_terms"),
                 F.max("df").alias("max_df"),
                 F.avg("df").alias("mean_df"))
        .write.mode("overwrite")
        .parquet(os.path.join(out_path, gen_stats))
    )
    skew_row = skew_obs.get
    mark(f"extend:{tag}:stats-merge")

    drow = docs_future.result()
    pool.shutdown()
    mark(f"extend:{tag}:docs")

    old_stats_dir = m.stats_dir
    m.n_docs += int(drow["n"] or 0)
    m.total_dl += int(drow["dl"] or 0)
    m.n_postings += int(srow["n_postings"] or 0)
    m.n_terms = int(skew_row["n_terms"] or 0)
    m.metrics["n_segments"] = int(m.metrics.get("n_segments", 0)) + int(srow["n_segments"] or 0)
    m.metrics["payload_bytes"] = int(m.metrics.get("payload_bytes", 0)) + int(srow["payload_bytes"] or 0)
    m.metrics["bytes_per_posting"] = (
        m.metrics["payload_bytes"] / m.n_postings if m.n_postings else 0.0
    )
    m.metrics["skew_ratio_max_df_over_mean"] = (
        float(skew_row["max_df"]) / float(skew_row["mean_df"]) if skew_row["mean_df"] else 0.0
    )
    m.metrics["max_dl"] = max(int(m.metrics.get("max_dl", 0)),
                              int(drow["max_dl"] or 0))
    m.postings_dirs = list(m.postings_dirs) + [gen_postings]
    m.docs_dirs = list(m.docs_dirs) + [gen_docs]
    m.stats_dir = gen_stats
    m.lineage = {str(g): meta for g, meta in _complete_groups(out_path)}
    m.save(out_path)  # atomic commit point
    if old_stats_dir != gen_stats:
        shutil.rmtree(os.path.join(out_path, old_stats_dir), ignore_errors=True)
    mark(f"extend:{tag}:commit")
    return LoadedIndex(out_path, m)
