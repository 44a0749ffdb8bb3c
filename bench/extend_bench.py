"""Incremental-extend cost bench — the round-2 VERDICT #7 'done' gauge,
extended (round-4 VERDICT #8) with the live-service maintenance cycle:

  build (~97%)  ->  extend x3 (~1% each)  ->  query over 4 generations
                ->  optimize_index (compact to 1 generation) -> query A/B

Extending must cost a small fraction of a fresh build (O(new docs +
vocab), not O(corpus) — the remaining cost is a fixed job floor, flat in
corpus size, documented in BENCH/BASELINE.md). The optimize A/B measures
what generation fragmentation actually costs queries and what compaction
buys back — the query-before/after-reorder protocol of the reference
(tools/query_npy.cpp:34-41).

Usage: FLATNAV_BENCH_CORPUS=zipf:200000 python bench/extend_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from pyspark.sql import functions as F

    from bench import _get_corpus, make_query_set
    from flatnav_spark.build import build_index, extend_index
    from flatnav_spark.maintenance import optimize_index
    from flatnav_spark.query import batch_query
    from flatnav_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:200000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "500"))
    spark = get_spark("flatnav_extend_bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = os.path.join(tempfile.mkdtemp(prefix="flatnav_ext_", dir=tmp_root), "index")

    corpus = _get_corpus(spark, "", corpus_spec)
    # deterministic ~97/1/1/1 split, independent of partitioning
    bucket = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(100))
    base = corpus.filter(bucket >= 3)
    slices = [corpus.filter(bucket == i) for i in range(3)]
    n_base = base.count()
    n_slices = [s.count() for s in slices]

    t0 = time.perf_counter()
    index = build_index(base, out, mode="code", n_splits=64, n_groups=2,
                        block_range=1024, out_partitions=None)
    t_build = time.perf_counter() - t0

    t_extends = []
    for s in slices:
        t0 = time.perf_counter()
        index = extend_index(spark, index, s, out_partitions=None)
        t_extends.append(round(time.perf_counter() - t0, 2))
    assert index.manifest.n_docs == n_base + sum(n_slices)
    assert len(index.manifest.postings_dirs) == 4

    queries = make_query_set(spark, index, n_queries)
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    batch_query(spark, index, qdf.limit(8), k=10).count()  # warm-up

    def timed_query():
        t0 = time.perf_counter()
        batch_query(spark, index, qdf, k=10, prune=True).count()
        return round(time.perf_counter() - t0, 2)

    q_frag = min(timed_query() for _ in range(2))

    t0 = time.perf_counter()
    index = optimize_index(spark, index, out_partitions=None)
    t_opt = round(time.perf_counter() - t0, 2)
    assert len(index.manifest.postings_dirs) == 1

    q_compact = min(timed_query() for _ in range(2))

    result = {
        "metric": "incremental extend + optimize cycle vs fresh build",
        "corpus": corpus_spec,
        "cpus": cpus,
        "n_base": n_base,
        "n_ext": n_slices,
        "build_sec": round(t_build, 2),
        "extend_sec": t_extends,
        "extend_over_build": round(t_extends[0] / t_build, 4),
        "optimize_sec": t_opt,
        "query_frag_sec": q_frag,
        "query_compact_sec": q_compact,
        "n_queries": n_queries,
    }
    spark.stop()
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)

    lines = [
        "",
        "## Incremental extend + optimize cycle (bench/extend_bench.py)",
        "",
        f"Corpus {corpus_spec}, local[{cpus}]: fresh build of {n_base} docs "
        f"{result['build_sec']} s; three ~1% extends "
        f"({', '.join(str(n) for n in n_slices)} docs) took "
        f"{', '.join(str(t) for t in t_extends)} s "
        f"({100 * result['extend_over_build']:.1f}% of fresh build each — "
        "fixed job floor, flat in corpus size).",
        "",
        f"Query A/B ({n_queries} queries, WAND, min-of-2): 4 generations "
        f"{q_frag} s -> optimize_index {t_opt} s -> 1 generation "
        f"{q_compact} s ({'+' if q_compact > q_frag else ''}"
        f"{100 * (q_compact - q_frag) / q_frag:.1f}% vs fragmented).",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
