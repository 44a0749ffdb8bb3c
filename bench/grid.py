"""Parameter-grid benchmark runner — the experiment-runner analog
(run-benchmark.py:265-359,391-419: grid over (M, ef_construction,
ef_search), JSON results appended per run). Ours sweeps the engine knobs:

    block_range   (posting block doc-range; the M/segment-size analog)
    prune         (block-max WAND on/off; the ef_search-style tradeoff)
    k

Appends one JSON line per cell to BENCH/grid_results.jsonl.

Usage: python bench/grid.py [--corpus synth:50000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCK_RANGES = [512, 1024, 4096]
KS = [10, 100]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="synth:50000")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", type=int, default=500)
    args = ap.parse_args()

    from bench import _get_corpus, make_query_set  # noqa: E402
    from flatnav_spark.build import build_index
    from flatnav_spark.query import batch_query
    from flatnav_spark.session import get_spark

    spark = get_spark("flatnav_grid", cores=args.cpus, shuffle_partitions=max(args.cpus, 8))
    corpus = _get_corpus(spark, "/root/testdata/sf0.1", args.corpus)
    n_docs = corpus.count()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_jsonl = os.path.join(REPO, "BENCH", "grid_results.jsonl")

    for block_range in BLOCK_RANGES:
        out_dir = os.path.join(tempfile.mkdtemp(prefix="flatnav_grid_"), "index")
        t0 = time.perf_counter()
        index = build_index(corpus, out_dir, mode="code",
                            n_splits=max(args.cpus * 2, 16), n_groups=2,
                            block_range=block_range,
                            out_partitions=max(args.cpus, 8))
        build_s = time.perf_counter() - t0
        queries = make_query_set(spark, index, args.queries)
        qdf = spark.createDataFrame(queries, "query_id long, query_text string")
        batch_query(spark, index, qdf.limit(8), k=10).count()  # warm-up
        for k in KS:
            for prune in (True, False):
                t0 = time.perf_counter()
                batch_query(spark, index, qdf, k=k, prune=prune).count()
                q_s = time.perf_counter() - t0
                cell = {
                    "corpus": args.corpus, "n_docs": n_docs, "cpus": args.cpus,
                    "block_range": block_range, "k": k, "prune": prune,
                    "build_sec": round(build_s, 3), "query_sec": round(q_s, 3),
                    "files_per_sec": round(n_docs / build_s, 2),
                    "qps": round(args.queries / q_s, 2),
                    "index_bytes": index.manifest.metrics.get("payload_bytes"),
                }
                with open(out_jsonl, "a") as f:
                    f.write(json.dumps(cell) + "\n")
                print(json.dumps(cell), flush=True)
        shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
