"""Read-path + compute N→4N scaling against ONE persisted index.

The full-build scaling harness (bench/scaling.py) is dominated on this
sandbox by the serial page-fault tax on written bytes (ARCHITECTURE.md §5)
— a per-environment artifact. This harness isolates the phases a real
cluster's executors actually scale: batched query (read-only index, small
output) and the tokenizer compute core (no writes at all). One index is
built once; each measurement runs in a fresh JVM at local[8] / local[32],
interleaved, min-of-N.

Usage: FLATNAV_BENCH_CORPUS=synth:1000000 python bench/query_scaling.py
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
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bench import make_query_set, _get_corpus, _phase_cpu
from flatnav_spark.index_io import load_index
from flatnav_spark.query import batch_query
from flatnav_spark.session import get_spark
from flatnav_spark.tokenizer import make_tfmap_udf
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
spark = get_spark("qscale", cores=cpus, shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": str(32*1024*1024)}})
index = load_index({index!r})
corpus = _get_corpus(spark, "", {corpus!r})
corpus.count()
queries = make_query_set(spark, index, {n_queries})
qdf = spark.createDataFrame(queries, "query_id long, query_text string")
batch_query(spark, index, qdf.limit(8), k=10).count()  # warm-up

out = {{}}
if os.environ.get("FLATNAV_QSCALE_SKIP_TOKENIZE", "") != "1":
    tfmap = make_tfmap_udf("code")
    w, _, b, s = _phase_cpu(lambda: corpus.withColumn("m", tfmap(F.col("content")))
                            .select(F.explode("m").alias("t", "f"))
                            .agg(F.count(F.lit(1)), F.sum("f")).collect())
    out["tokenize_compute"] = (w, b, s)
w, _, b, s = _phase_cpu(lambda: batch_query(spark, index, qdf, k=10, prune=False).count())
out["query_batch"] = (w, b, s)
w, _, b, s = _phase_cpu(lambda: batch_query(spark, index, qdf, k=10, prune=True).count())
out["query_batch_wand"] = (w, b, s)
print("QSCALE " + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int, script: str) -> dict:
    out = subprocess.run([sys.executable, "-c", script, str(cpus)],
                         capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("QSCALE ")][-1]
    return json.loads(line[7:])


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "synth:1000000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "5000"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX", "/dev/shm/flatnav_qscale/index")

    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        from bench import _get_corpus
        from flatnav_spark.build import build_index
        from flatnav_spark.session import get_spark

        spark = get_spark("qscale_build", cores=32)
        corpus = _get_corpus(spark, "", corpus_spec)
        build_index(corpus, index_path, mode="code", n_splits=64, n_groups=2,
                    block_range=1024, out_partitions=None)
        spark.stop()

    script = WORKER.format(repo=REPO, index=index_path, corpus=corpus_spec,
                           n_queries=n_queries)
    runs = {8: [], 32: []}
    for _ in range(repeats):
        runs[8].append(run_at(8, script))
        runs[32].append(run_at(32, script))

    report = {}
    lines = ["", "## Read-path + compute scaling (one persisted index, fresh JVMs, interleaved min-of-%d)" % repeats, ""]
    lines.append("| phase | T@N=8 (s) | T@4N=32 (s) | busy cores @8/@32 | scaling eff |")
    lines.append("|---|---|---|---|---|")
    phases = [p for p in ("tokenize_compute", "query_batch", "query_batch_wand")
              if p in runs[8][0]]
    for phase in phases:
        t8 = min(r[phase][0] for r in runs[8])
        t32 = min(r[phase][0] for r in runs[32])
        b8 = max(r[phase][1] for r in runs[8])
        b32 = max(r[phase][1] for r in runs[32])
        eff = (t8 / t32) / 4
        report[phase] = {"t8": round(t8, 2), "t32": round(t32, 2), "eff": round(eff, 3)}
        lines.append(f"| {phase} | {t8:.2f} | {t32:.2f} | {b8:.1f} / {b32:.1f} | {eff:.3f} |")
    lines.append("")
    lines.append("Raw: " + json.dumps(runs))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
