"""Standing-service threshold reuse at two parallelism levels — the WAND
scale path (round-4 VERDICT #1).

Task-local WAND thresholds decay with task count (each task's top-k
fills later with fewer chunks/task): zipf:1M seg prune 0.34 @8 tasks ->
0.10 @32 -> trending to the analytic floor at cluster scale. The fix is
threshold REUSE: a standing service (flatnav_spark/service.py) remembers
each query's attained k-th score and seeds it into every task on repeat,
making pruning parallelism-INDEPENDENT. This harness measures exactly
that: one persisted zipf index, fresh JVM per point, interleaved
local[8] / local[32], per batch kind:

    cold    first sight of the query set (floor-only thresholds)
    seeded  identical query set repeated (cache-hit regime, the bar:
            N32 seg-prune frac within 2x of N8's)
    mixed   50% repeats / 50% fresh (realistic service cache-hit rate)

Usage: python bench/service_bench.py   (env: FLATNAV_BENCH_INDEX,
FLATNAV_BENCH_CORPUS=zipf:1000000, FLATNAV_BENCH_QUERIES, _REPEATS).
Appends its table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import make_query_set, _phase_cpu
from flatnav_spark.index_io import load_index
from flatnav_spark.service import StandingQueryService
from flatnav_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark("svc_bench", cores=cpus, shuffle_partitions=max(cpus, 8))
index = load_index({index!r})
queries = make_query_set(spark, index, {n_queries})
fresh = make_query_set(spark, index, {n_queries}, seed=43)
mixed = [queries[i] if i % 2 == 0 else (i, fresh[i][1])
         for i in range(len(queries))]

svc = StandingQueryService(spark, index, k={k})
svc.search_batch(queries[:8])  # warm-up: JIT + python workers (seeds 8 texts)
svc._thr.clear()               # ...but measure the cold batch truly cold

def frac(m, kind):
    p, s = m[kind + "_pruned"], m[kind + "_scored"]
    return round(p / max(p + s, 1), 4)

out = {{}}
for kind, batch in (("cold", queries), ("seeded", queries), ("mixed", mixed)):
    w, _, b, s = _phase_cpu(
        lambda batch=batch: svc.search_batch(batch, collect_metrics=True))
    m = svc.last_metrics
    out[kind] = {{"wall": round(w, 3), "seg_frac": frac(m, "segments"),
                  "pair_frac": frac(m, "pairs"), "busy": b, "steal": s,
                  "cached": svc.cached_thresholds}}
print("SVC " + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int, script: str) -> dict:
    out = subprocess.run([sys.executable, "-c", script, str(cpus)],
                         capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("SVC ")][-1]
    return json.loads(line[4:])


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:1000000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "1000"))
    k = int(os.environ.get("FLATNAV_BENCH_K", "10"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "3"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX",
                                "/dev/shm/flatnav_qscale_r4/index")

    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        from bench import _get_corpus
        from flatnav_spark.build import build_index
        from flatnav_spark.session import get_spark

        spark = get_spark("svc_build", cores=32)
        corpus = _get_corpus(spark, "", corpus_spec)
        build_index(corpus, index_path, mode="code", n_splits=64, n_groups=2,
                    block_range=1024, out_partitions=None)
        spark.stop()

    script = WORKER.format(repo=REPO, index=index_path, n_queries=n_queries,
                           k=k)
    runs = {8: [], 32: []}
    for _ in range(repeats):
        runs[8].append(run_at(8, script))
        runs[32].append(run_at(32, script))

    kinds = ("cold", "seeded", "mixed")
    lines = ["", f"## Standing-service threshold reuse ({corpus_spec}, "
             f"{n_queries} queries, k={k}, fresh JVMs, interleaved min-of-{repeats})",
             "",
             "| parallelism | batch | wall (s) | seg prune frac | pair prune frac | busy/steal cores |",
             "|---|---|---|---|---|---|"]
    report = {}
    for cpus in (8, 32):
        for kind in kinds:
            best = min(runs[cpus], key=lambda r: r[kind]["wall"])[kind]
            report[f"{kind}@{cpus}"] = best
            lines.append(
                f"| local[{cpus}] | {kind} | {best['wall']:.2f} | "
                f"{best['seg_frac']:.3f} | {best['pair_frac']:.3f} | "
                f"{best['busy']:.1f} / {best['steal']:.1f} |")
    s8 = report["seeded@8"]["seg_frac"]
    s32 = report["seeded@32"]["seg_frac"]
    ratio = s8 / max(s32, 1e-9)
    bar = "MET" if ratio <= 2.0 else "UNMET"
    lines += [
        "",
        f"Seeded seg-prune frac: N8 {s8:.3f} vs N32 {s32:.3f} — ratio "
        f"{ratio:.2f}x ({bar}: bar is N32 within 2x of N8). Cold fracs show "
        "the task-local decay the seed removes; `mixed` is the 50% cache-hit "
        "regime a real service sees.",
        "Raw: " + json.dumps(runs),
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
