"""Index persistence: parquet tables + JSON manifest.

The serialization boundary — analog of flatnav's cereal archive
(Index::saveIndex/loadIndex, include/flatnav/index/Index.h:442-490): a
metadata header plus the index payload, with the contract that a reloaded
index returns identical results for every query
(include/flatnav/tests/test_serialization.cpp:64-75).

On-disk layout under ``<path>/``:

    manifest.json        schema version, tokenizer mode, BM25 params,
                         block_range, n_splits, corpus stats (N, avgdl),
                         build metrics, per-stage checkpoint lineage
    docs/                (doc_id, repo, path, commit, lang, content_sha, dl)
                         range-partitioned + sorted by doc_id
    postings/            (term, chunk_id, n, block_ids[], block_counts[],
                         block_max_tf[], block_min_dl[], docs_bin, tfs_bin,
                         dls_bin) range-partitioned + sorted by
                         (term, chunk_id) — one row per (term, chunk of
                         chunk_blocks doc-id blocks) with in-row per-block
                         skip data; the gorder/RCM locality analog
                         (Reordering.h:26-200): layout chosen so a query's
                         term lookups hit few row groups
    stats/               (term, df, cf)
    _stage1/             per-group build checkpoints: group=*/docs is ONE
                         combined zstd table (doc_id, repo, path, commit,
                         lang, content_sha, dl, tfmap) + _DONE.json lineage
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields

from flatnav_spark.scorer import BM25Params

# v2: combined stage-1 layout (docs+tfmap single table), sum_tf segment
# column, key_fingerprint lineage markers — v1 checkpoints refuse to resume
# v3: chunked postings — one row per (term, chunk of chunk_blocks doc-id
# blocks) with per-block sub-run skip arrays (block_ids/block_counts/
# block_max_tf/block_min_dl); per-run gap restart in docs_bin
MANIFEST_VERSION = 3


@dataclass
class IndexManifest:
    version: int
    tokenizer_mode: str
    k1: float
    b: float
    block_range: int
    n_splits: int
    chunk_blocks: int
    n_docs: int
    total_dl: int
    n_terms: int
    n_postings: int
    config_hash: str
    metrics: dict = field(default_factory=dict)
    lineage: dict = field(default_factory=dict)
    # generational table layout (incremental extend): each extend appends a
    # postings/docs generation directory and swaps in a merged stats dir;
    # optimize_index compacts generations back to the defaults. The
    # manifest is the atomic commit point — an unreferenced directory is
    # dead weight, never wrong data.
    postings_dirs: list = field(default_factory=lambda: ["postings"])
    docs_dirs: list = field(default_factory=lambda: ["docs"])
    stats_dir: str = "stats"
    # optional positional-postings artifact (flatnav_spark/phrase.py):
    # positions_n_docs stamps the generation it was built against — phrase
    # queries refuse when it trails n_docs (extend without rebuild)
    positions_dir: str | None = None
    positions_n_docs: int = 0

    @property
    def avgdl(self) -> float:
        # exact: integer total / integer count, single float64 division —
        # bit-identical to the reference scorer's computation
        return float(self.total_dl) / float(self.n_docs) if self.n_docs else 0.0

    @property
    def params(self) -> BM25Params:
        return BM25Params(k1=self.k1, b=self.b)

    def save(self, path: str) -> None:
        # write-then-rename: the manifest is the commit point for every
        # multi-directory mutation (extend generations, optimize swap), so
        # a crash mid-save must never leave a torn file
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(path, "manifest.json"))

    @staticmethod
    def load(path: str) -> "IndexManifest":
        with open(os.path.join(path, "manifest.json")) as f:
            d = json.load(f)
        if d.get("version") != MANIFEST_VERSION:
            raise ValueError(f"unsupported index manifest version {d.get('version')}")
        # additive-field forward compatibility within a version: readers
        # ignore keys they don't know (new OPTIONAL fields — e.g. the
        # positions artifact — must not brick older readers; anything
        # semantics-changing bumps MANIFEST_VERSION instead)
        known = {f.name for f in fields(IndexManifest)}
        return IndexManifest(**{k: v for k, v in d.items() if k in known})


class LoadedIndex:
    """Handle to a persisted index; tables open lazily (no data motion)."""

    def __init__(self, path: str, manifest: IndexManifest):
        self.path = path
        self.manifest = manifest
        self._stats_cache = None  # term -> stats dict (preload_term_stats)

    def preload_term_stats(self, spark) -> int:
        """Opt-in driver-side cache of the term-stats table for the
        query_one latency fast path (one Spark job instead of two per
        query: the tokenize+stats-join job is replaced by a dict lookup).
        Costs one scan now plus ~100 B of driver memory per term — right
        for standing single-query services on vocabularies up to ~10^7
        terms; batch_query never needs it (its stats join is amortized
        over the batch). Returns the number of cached terms."""
        # Arrow collect (toPandas) instead of the row-based collect():
        # materializing 10^5-10^6 Row objects driver-side was the slow
        # part of arming the cache (r6; guide §6 Arrow-for-driver-transfers)
        stats = self.term_stats(spark)
        has_floor = "floor_dl10" in stats.columns
        cols = ["term", "df"] + (
            ["floor_dl10", "floor_dl100"] if has_floor else [])
        pdf = stats.select(*cols).toPandas()
        terms = pdf["term"].tolist()
        dfs = pdf["df"].tolist()
        if has_floor:
            import pandas as pd

            # nullable int columns arrive as float NaN; keep ints-or-None
            f10 = [None if pd.isna(v) else int(v) for v in pdf["floor_dl10"].tolist()]
            f100 = [None if pd.isna(v) else int(v) for v in pdf["floor_dl100"].tolist()]
        else:
            f10 = f100 = [None] * len(terms)
        self._stats_cache = {
            t: {"df": int(d), "floor_dl10": a, "floor_dl100": b}
            for t, d, a, b in zip(terms, dfs, f10, f100)
        }
        return len(self._stats_cache)

    def docs(self, spark):
        return spark.read.parquet(
            *[os.path.join(self.path, d) for d in self.manifest.docs_dirs]
        )

    def postings(self, spark):
        return spark.read.parquet(
            *[os.path.join(self.path, d) for d in self.manifest.postings_dirs]
        )

    def term_stats(self, spark):
        return spark.read.parquet(os.path.join(self.path, self.manifest.stats_dir))

    def info(self) -> dict:
        """getIndexSummary analog (Index.h:538-548)."""
        m = self.manifest
        return {
            "path": self.path,
            "n_docs": m.n_docs,
            "n_terms": m.n_terms,
            "n_postings": m.n_postings,
            "avgdl": m.avgdl,
            "block_range": m.block_range,
            "chunk_blocks": m.chunk_blocks,
            "tokenizer_mode": m.tokenizer_mode,
            "bm25": {"k1": m.k1, "b": m.b},
            "metrics": m.metrics,
        }


def load_index(path: str) -> LoadedIndex:
    return LoadedIndex(path, IndexManifest.load(path))
