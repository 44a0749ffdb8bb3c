"""Layout-strategy A/B bench — the reorder speedup measurement analog
(tools/query_npy.cpp:34-41: query before/after gorder vs rcm).

Builds one index, then measures the same batched-query workload under the
default build layout, the 'term' optimized layout, and the 'doc' optimized
layout. Prints one JSON line.

Usage: FLATNAV_BENCH_CORPUS=synth:50000 python bench/layout.py
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
    from bench import make_query_set, _get_corpus  # noqa: E402 (repo-root bench.py)
    from flatnav_spark.build import build_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.maintenance import optimize_index
    from flatnav_spark.query import batch_query
    from flatnav_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "1000"))
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "synth:50000")
    k = int(os.environ.get("FLATNAV_BENCH_K", "10"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))

    spark = get_spark("flatnav_layout_bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = os.path.join(tempfile.mkdtemp(prefix="flatnav_layout_", dir=tmp_root), "index")

    corpus = _get_corpus(spark, sf_dir, corpus_spec)
    index = build_index(corpus, out_dir, mode="code",
                        n_splits=max(cpus * 2, 16), n_groups=2,
                        block_range=1024, out_partitions=None)
    queries = make_query_set(spark, index, n_queries)
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")

    def measure(idx) -> float:
        batch_query(spark, idx, qdf.limit(8), k=k).count()  # warm-up
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            batch_query(spark, idx, qdf, k=k, prune=True).count()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {"build_default": round(measure(index), 3)}
    for strategy in ("term", "doc"):
        idx = optimize_index(spark, load_index(out_dir), strategy=strategy)
        results[f"layout_{strategy}"] = round(measure(idx), 3)

    out = {
        "metric": "batched query wall clock by postings layout",
        "unit": "sec",
        "corpus": corpus_spec,
        "cpus": cpus,
        "n_queries": n_queries,
        "k": k,
        "layouts": results,
    }
    spark.stop()
    shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
