"""Pattern-query (prefix '*' / fuzzy '~N') cost at zipf scale: expansion
wall on the cold stats-scan path vs the preloaded-cache path, and
batch-query wall for pattern batches vs the equivalent plain-term
batches (the expansion's scoring is ordinary BM25, so the delta is
expansion + wider term lists).

Patterns are sampled from the corpus vocabulary: prefixes are the first
3-4 chars of real terms (nonzero expansions), fuzzy bases are real terms
with one char dropped (distance-1 hits exist by construction).

Usage: python bench/pattern_bench.py  (env: FLATNAV_BENCH_CORPUS=
zipf:200000, FLATNAV_BENCH_QUERIES=100, FLATNAV_BENCH_INDEX,
FLATNAV_BENCH_CPUS=32, FLATNAV_BENCH_REPEATS=2). Appends to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:200000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "100"))
    cpus = int(os.environ.get("FLATNAV_BENCH_CPUS", "32"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX",
                                "/dev/shm/flatnav_pattern/index")

    from bench import _get_corpus, _phase_cpu
    from flatnav_spark.build import build_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.query import (
        batch_query,
        expand_query_patterns,
        prefix_query_batch,
    )
    from flatnav_spark.session import get_spark

    spark = get_spark("pattern_bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    corpus = _get_corpus(spark, "", corpus_spec)
    build_wall = None
    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        build_wall, _, _, _ = _phase_cpu(lambda: build_index(
            corpus, index_path, mode="code", n_splits=64, n_groups=2,
            block_range=1024, out_partitions=None))
    index = load_index(index_path)

    # vocabulary sample for realistic patterns: mid-df terms (hot terms
    # expand the widest prefixes; rare terms make empty expansions)
    vocab = [
        r["term"] for r in index.term_stats(spark)
        .orderBy("df", ascending=False).limit(5000).collect()
    ]
    step = max(1, len(vocab) // n_queries)
    sample = [t for t in vocab[:: step] if len(t) >= 4][:n_queries]
    prefix_pairs = [(i, t[:3] + "*") for i, t in enumerate(sample)]
    fuzzy_pairs = [(i, t[:-1] + "~1") for i, t in enumerate(sample)]
    plain_pairs = [(i, t) for i, t in enumerate(sample)]

    # expansion cost: cold (one filtered stats read) vs warm (dict sweep)
    cold_w, _, _, _ = _phase_cpu(
        lambda: expand_query_patterns(spark, index, prefix_pairs))
    n_terms_prefix = len(expand_query_patterns(spark, index, prefix_pairs))
    index.preload_term_stats(spark)
    warm_w, _, _, _ = _phase_cpu(
        lambda: expand_query_patterns(spark, index, prefix_pairs))
    fuzzy_warm_w, _, _, _ = _phase_cpu(
        lambda: expand_query_patterns(spark, index, fuzzy_pairs))
    n_terms_fuzzy = len(expand_query_patterns(spark, index, fuzzy_pairs))

    def run(pairs, fn):
        walls = []
        for _ in range(repeats):
            qdf = spark.createDataFrame(
                pairs, "query_id long, query_text string")
            w, _, b, s = _phase_cpu(
                lambda: fn(spark, index, qdf, k=10).collect())
            walls.append((w, b, s))
        return min(walls), walls

    plain_best, plain_raw = run(plain_pairs, batch_query)
    prefix_best, prefix_raw = run(prefix_pairs, prefix_query_batch)
    fuzzy_best, fuzzy_raw = run(fuzzy_pairs, prefix_query_batch)

    lines = ["", f"## Pattern queries at scale ({corpus_spec}, "
             f"{len(sample)} queries/batch, local[{cpus}], min-of-{repeats}, "
             "preloaded stats)", "",
             "| batch | wall (s) | QPS | qt_rows |", "|---|---|---|---|",
             f"| plain single-term | {plain_best[0]:.2f} "
             f"(busy/steal {plain_best[1]:.1f}/{plain_best[2]:.1f}) "
             f"| {len(sample)/plain_best[0]:.1f} | {len(sample)} |",
             f"| prefix 3-char '*' | {prefix_best[0]:.2f} "
             f"(busy/steal {prefix_best[1]:.1f}/{prefix_best[2]:.1f}) "
             f"| {len(sample)/prefix_best[0]:.1f} | {n_terms_prefix} |",
             f"| fuzzy '~1' | {fuzzy_best[0]:.2f} "
             f"(busy/steal {fuzzy_best[1]:.1f}/{fuzzy_best[2]:.1f}) "
             f"| {len(sample)/fuzzy_best[0]:.1f} | {n_terms_fuzzy} |",
             "",
             f"Expansion wall, prefix batch: cold stats-scan {cold_w:.2f} s "
             f"(one filtered read, StringStartsWith pushdown) vs preloaded "
             f"dict sweep {warm_w:.3f} s; fuzzy dict sweep (banded "
             f"Levenshtein DP over the vocabulary) {fuzzy_warm_w:.3f} s.",
             "Raw: " + json.dumps({
                 "build_wall": build_wall, "cold_expand": cold_w,
                 "warm_expand": warm_w, "fuzzy_expand": fuzzy_warm_w,
                 "plain": plain_raw, "prefix": prefix_raw,
                 "fuzzy": fuzzy_raw, "n_terms_prefix": n_terms_prefix,
                 "n_terms_fuzzy": n_terms_fuzzy})]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
