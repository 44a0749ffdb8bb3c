"""Approximate WAND sweep — recall@k vs QPS, the reference's headline
tradeoff (experiments/run-benchmark.py:43-85,270-313 sweeps ef_search and
reports recall/QPS/distance-computations; here the knob is the WAND
threshold factor theta, Broder et al. CIKM 2003 §6).

One persisted zipf index, one JVM, theta sweep interleaved across repeat
rounds (steal-fair); per theta: batched-query wall (min-of-N), seg/pair
prune fracs (accumulators), and recall@k against the theta=1.0 lossless
result. Appends its table to BENCH/BASELINE.md.

Usage: python bench/approx_bench.py   (env: FLATNAV_BENCH_INDEX,
FLATNAV_BENCH_CORPUS=zipf:200000, FLATNAV_BENCH_QUERIES=1000,
FLATNAV_BENCH_K=10, FLATNAV_BENCH_REPEATS=3, FLATNAV_BENCH_CPUS=32).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THETAS = (1.0, 1.1, 1.25, 1.5, 2.0)


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:200000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "1000"))
    k = int(os.environ.get("FLATNAV_BENCH_K", "10"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "3"))
    cpus = int(os.environ.get("FLATNAV_BENCH_CPUS", "32"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX",
                                "/dev/shm/flatnav_approx/index")

    from bench import _get_corpus, _phase_cpu, make_query_set
    from flatnav_spark.build import build_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.query import batch_query
    from flatnav_spark.session import get_spark

    spark = get_spark("approx_bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        corpus = _get_corpus(spark, "", corpus_spec)
        build_index(corpus, index_path, mode="code", n_splits=64, n_groups=2,
                    block_range=1024, out_partitions=None)
    index = load_index(index_path)
    index.preload_term_stats(spark)
    queries = make_query_set(spark, index, n_queries)
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")

    # ground truth: the lossless pruned path (theta=1.0 == exact top-k)
    truth: dict[int, set] = {}
    for r in batch_query(spark, index, qdf, k=k, prune=True).collect():
        truth.setdefault(r.query_id, set()).add(r.doc_id)
    n_truth = sum(len(s) for s in truth.values())

    def run_theta(theta: float) -> dict:
        res = batch_query(spark, index, qdf, k=k, prune=True,
                          approx_factor=theta, collect_metrics=True)
        rows = []
        wall, _, busy, steal = _phase_cpu(lambda: rows.extend(res.collect()))
        a = res._flatnav_accumulators
        segs = int(a["segments_scored"].value), int(a["segments_pruned"].value)
        pairs = int(a["pairs_scored"].value), int(a["pairs_pruned"].value)
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.doc_id)
        hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
        return {
            "wall": round(wall, 3), "busy": busy, "steal": steal,
            "recall": round(hits / max(n_truth, 1), 4),
            "seg_frac": round(segs[1] / max(sum(segs), 1), 4),
            "pair_frac": round(pairs[1] / max(sum(pairs), 1), 4),
            "qps": round(n_queries / wall, 1),
        }

    runs: dict[float, list] = {t: [] for t in THETAS}
    for _ in range(repeats):
        for t in THETAS:  # interleaved: every theta sees every steal window
            runs[t].append(run_theta(t))

    lines = ["", f"## Approximate WAND (theta sweep) — recall@{k} vs QPS "
             f"({corpus_spec}, {n_queries} queries, local[{cpus}], "
             f"min-of-{repeats} interleaved)", "",
             "| theta | recall@k | QPS | wall (s) | seg prune frac | "
             "pair prune frac | busy/steal |",
             "|---|---|---|---|---|---|---|"]
    report = {}
    for t in THETAS:
        best = min(runs[t], key=lambda r: r["wall"])
        # recall/prune fracs are deterministic per theta; wall is min-of-N
        report[str(t)] = best
        lines.append(
            f"| {t} | {best['recall']:.4f} | {best['qps']:.1f} | "
            f"{best['wall']:.2f} | {best['seg_frac']:.3f} | "
            f"{best['pair_frac']:.3f} | {best['busy']:.1f} / "
            f"{best['steal']:.1f} |")
    lines += [
        "",
        "theta = WAND threshold factor (Broder et al. 2003): prune when "
        "block upper bound < attained-k-th * theta. theta=1.0 is the "
        "lossless default (recall 1.0 by construction); returned scores "
        "are exact at every theta — only completeness is traded. The "
        "engine analog of the reference's ef_search recall/QPS sweep.",
        "Raw: " + json.dumps({str(t): r for t, r in runs.items()}),
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
