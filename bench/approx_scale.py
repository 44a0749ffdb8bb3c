"""Approximate WAND vs parallelism — does theta buy back the cold-path
pruning that task multiplication destroys?

Cold task-local WAND thresholds decay with task count (zipf:1M seg prune
0.34 @8 tasks -> 0.10 @32 -> floor-bound at cluster scale); the seeded
standing-service path removes the decay for REPEATED queries
(bench/service_bench.py). This harness measures the other regime: cold,
one-shot batches, where theta (the WAND threshold factor,
bench/approx_bench.py) inflates whatever threshold the task has — so the
recovered pruning should hold at BOTH parallelism levels, at a bounded,
measured recall cost. Fresh JVM per point, local[8]/local[32]
interleaved; recall vs the same JVM's theta=1.0 run (lossless, and
rank-identical across parallelism by the determinism contract).

Usage: python bench/approx_scale.py   (env: FLATNAV_BENCH_INDEX,
FLATNAV_BENCH_CORPUS=zipf:1000000, FLATNAV_BENCH_QUERIES=1000,
FLATNAV_BENCH_K=10, FLATNAV_BENCH_REPEATS=2). Appends to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THETAS = (1.0, 1.25, 1.5)

WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import make_query_set, _phase_cpu
from flatnav_spark.index_io import load_index
from flatnav_spark.query import batch_query
from flatnav_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark("approx_scale", cores=cpus, shuffle_partitions=max(cpus, 8))
index = load_index({index!r})
index.preload_term_stats(spark)
queries = make_query_set(spark, index, {n_queries})
qdf = spark.createDataFrame(queries, "query_id long, query_text string")
k = {k}

# warm-up (JIT + python workers + page cache), excluded from timing
batch_query(spark, index, qdf.limit(8), k=k).collect()

out = {{}}
truth = None
for theta in {thetas}:
    res = batch_query(spark, index, qdf, k=k, prune=True,
                      approx_factor=theta, collect_metrics=True)
    rows = []
    wall, _, busy, steal = _phase_cpu(lambda: rows.extend(res.collect()))
    a = res._flatnav_accumulators
    segs = int(a["segments_scored"].value), int(a["segments_pruned"].value)
    pairs = int(a["pairs_scored"].value), int(a["pairs_pruned"].value)
    got = {{}}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.doc_id)
    if theta == 1.0:
        truth = got  # lossless: this IS the exact top-k
    hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    n_truth = sum(len(s) for s in truth.values())
    out[str(theta)] = {{
        "wall": round(wall, 3), "busy": busy, "steal": steal,
        "recall": round(hits / max(n_truth, 1), 4),
        "seg_frac": round(segs[1] / max(sum(segs), 1), 4),
        "pair_frac": round(pairs[1] / max(sum(pairs), 1), 4),
    }}
print("APX " + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int, script: str) -> dict:
    out = subprocess.run([sys.executable, "-c", script, str(cpus)],
                         capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("APX ")][-1]
    return json.loads(line[4:])


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:1000000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "1000"))
    k = int(os.environ.get("FLATNAV_BENCH_K", "10"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX",
                                "/dev/shm/flatnav_approx_scale/index")

    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        from bench import _get_corpus
        from flatnav_spark.build import build_index
        from flatnav_spark.session import get_spark

        spark = get_spark("apx_build", cores=32)
        corpus = _get_corpus(spark, "", corpus_spec)
        build_index(corpus, index_path, mode="code", n_splits=64, n_groups=2,
                    block_range=1024, out_partitions=None)
        spark.stop()

    script = WORKER.format(repo=REPO, index=index_path, n_queries=n_queries,
                           k=k, thetas=repr(tuple(THETAS)))
    runs = {8: [], 32: []}
    for _ in range(repeats):
        runs[8].append(run_at(8, script))
        runs[32].append(run_at(32, script))

    lines = ["", f"## Approximate WAND vs parallelism — cold batches "
             f"({corpus_spec}, {n_queries} queries, k={k}, fresh JVMs, "
             f"interleaved min-of-{repeats})", "",
             "| parallelism | theta | recall@k | wall (s) | seg prune frac | "
             "pair prune frac | busy/steal |",
             "|---|---|---|---|---|---|---|"]
    report = {}
    for cpus in (8, 32):
        for t in THETAS:
            best = min(runs[cpus], key=lambda r: r[str(t)]["wall"])[str(t)]
            report[f"{t}@{cpus}"] = best
            lines.append(
                f"| local[{cpus}] | {t} | {best['recall']:.4f} | "
                f"{best['wall']:.2f} | {best['seg_frac']:.3f} | "
                f"{best['pair_frac']:.3f} | {best['busy']:.1f} / "
                f"{best['steal']:.1f} |")
    r8 = report["1.0@8"]["seg_frac"]
    r32 = report["1.0@32"]["seg_frac"]
    a32 = report["1.25@32"]["seg_frac"]
    lines += [
        "",
        f"Cold theta=1.0 shows the task-count decay (seg {r8:.3f} @N8 -> "
        f"{r32:.3f} @N32); theta=1.25 at N32 recovers pruning to "
        f"{a32:.3f} at the recall cost shown — the one-shot-batch "
        "complement to seeded threshold reuse (which is lossless but needs "
        "repeats). Recall is measured against the same JVM's theta=1.0 run "
        "(lossless, rank-identical at any parallelism). NB approximate "
        "recall CAN differ between parallelism levels: pruning follows "
        "task-local threshold evolution, which depends on the partitioning "
        "— only the theta=1.0 results are parallelism-invariant.",
        "Raw: " + json.dumps(runs),
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
