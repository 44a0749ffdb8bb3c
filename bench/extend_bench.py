"""Incremental-extend cost bench — the round-2 VERDICT #7 'done' gauge:
extending a built index by ~1% of its corpus must cost a small fraction
of a fresh build (O(new docs + vocab), not O(corpus)).

Builds an index over ~99% of a synthetic corpus, extends with the
remaining ~1%, times both, and appends the measured table to
BENCH/BASELINE.md.

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

    from bench import _get_corpus
    from flatnav_spark.build import build_index, extend_index
    from flatnav_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:200000")
    spark = get_spark("flatnav_extend_bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = os.path.join(tempfile.mkdtemp(prefix="flatnav_ext_", dir=tmp_root), "index")

    corpus = _get_corpus(spark, "", corpus_spec)
    # deterministic ~99/1 split, independent of partitioning
    is_ext = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(100)) == 0
    base = corpus.filter(~is_ext)
    ext = corpus.filter(is_ext)
    n_base, n_ext = base.count(), ext.count()

    t0 = time.perf_counter()
    index = build_index(base, out, mode="code", n_splits=64, n_groups=2,
                        block_range=1024, out_partitions=None)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    ext_idx = extend_index(spark, index, ext, out_partitions=None)
    t_extend = time.perf_counter() - t0
    assert ext_idx.manifest.n_docs == n_base + n_ext

    result = {
        "metric": "incremental extend cost vs fresh build",
        "corpus": corpus_spec,
        "cpus": cpus,
        "n_base": n_base,
        "n_ext": n_ext,
        "ext_frac": round(n_ext / max(n_base, 1), 4),
        "build_sec": round(t_build, 2),
        "extend_sec": round(t_extend, 2),
        "extend_over_build": round(t_extend / t_build, 4),
    }
    spark.stop()
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)

    lines = [
        "",
        "## Incremental extend cost (bench/extend_bench.py)",
        "",
        f"Corpus {corpus_spec}, local[{cpus}]: fresh build of {n_base} docs "
        f"{result['build_sec']} s; extend of {n_ext} docs "
        f"({100 * result['ext_frac']:.1f}% of corpus) {result['extend_sec']} s "
        f"= {100 * result['extend_over_build']:.1f}% of a fresh build "
        f"(append-only generation + O(vocab) stats merge; target <= 5%).",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
