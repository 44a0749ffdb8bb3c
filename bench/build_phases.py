"""Per-phase build timing at two parallelism levels — the instrument for
the round-3 demand "pin the build anti-scaling with phase-level evidence"
(VERDICT r3 #2): N8 284.8 s -> N32 468.3 s on zipf:1M could not be
explained by the memory-bandwidth ceiling (which predicts T32 ~ T8/2, not
1.64x T8), so something at higher parallelism does MORE work or
serializes.

Runs build-only jobs in fresh JVM subprocesses with FLATNAV_BUILD_TIMING=1
and parses the [build-timing] stderr marks into a per-phase table:

    stage1 wall (and per-group tokenize-write durations)
    stage2: merge-encode-write / stats / docs-rewrite / metrics-manifest

Interleaved A/B pairs (same protocol as bench/scaling.py); per-run
(busy, steal) cores from /proc/stat so host noise is visible per row.

A/B knobs (each run spec is "cpus[:key=val,...]"):
    groups=N     stage-1 checkpoint groups (concurrent write jobs)
    shuf=N       spark.sql.shuffle.partitions (stage-1 write concurrency:
                 the tokenize+zstd+write stage runs with this many tasks
                 PER group job)
    outparts=N   stage-2 segment/docs output partitions

Usage:
    python bench/build_phases.py zipf:200000 8 32            # plain pair
    python bench/build_phases.py zipf:1000000 8 32 32:shuf=8 # + A/B run
    FLATNAV_BP_REPEATS=2 python bench/build_phases.py ...
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import bench as B
from flatnav_spark.build import build_index
from flatnav_spark.session import get_spark

cpus = {cpus}
spark = get_spark(
    "build_phases", cores=cpus, shuffle_partitions={shuf},
    extra_conf={{"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)}},
)
corpus = B._get_corpus(spark, "", {corpus!r})
n_docs = corpus.count()
out_dir = os.path.join(tempfile.mkdtemp(prefix="flatnav_bp_", dir="/dev/shm"), "index")
# warm-up build (excluded): driver JIT/codegen tax, same as bench.py
warm = out_dir + "_warm"
build_index(corpus.limit(500), warm, mode="code", n_splits=8, n_groups=1,
            block_range=1024, out_partitions=4)
shutil.rmtree(warm, ignore_errors=True)
print("BP_REAL_START", file=sys.stderr, flush=True)

def ticks():
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return v[0] + v[1] + v[2] + v[5] + v[6], v[7]

chunk_blocks = max(1, min(16, n_docs // (1024 * 96)))
b0, s0 = ticks()
t0 = time.perf_counter()
build_index(corpus, out_dir, mode="code", n_splits=64, n_groups={groups},
            block_range=1024, chunk_blocks=chunk_blocks,
            out_partitions={outparts})
wall = time.perf_counter() - t0
b1, s1 = ticks()
print("PHASES_TOTAL", json.dumps({{
    "wall": round(wall, 2), "n_docs": n_docs,
    "busy_cores": round((b1 - b0) / 100.0 / wall, 1),
    "steal_cores": round((s1 - s0) / 100.0 / wall, 1),
}}))
import json
shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)
spark.stop()
"""


def parse_spec(spec: str):
    if ":" in spec:
        cpus_s, kvs = spec.split(":", 1)
        opts = dict(kv.split("=") for kv in kvs.split(","))
    else:
        cpus_s, opts = spec, {}
    cpus = int(cpus_s)
    return {
        "spec": spec,
        "cpus": cpus,
        "groups": int(opts.get("groups", 2)),
        "shuf": int(opts.get("shuf", max(cpus, 8))),
        "outparts": int(opts.get("outparts", 32)),
        "mem": opts.get("mem"),  # e.g. 96g — driver/executor heap A/B
    }


def run_once(cfg: dict, corpus: str) -> dict:
    code = RUN_TEMPLATE.format(
        repo=REPO, cpus=cfg["cpus"], shuf=cfg["shuf"], groups=cfg["groups"],
        outparts=cfg["outparts"], corpus=corpus,
    )
    # the json import in the template must exist before first use
    code = "import json\n" + code
    env = dict(os.environ, FLATNAV_BUILD_TIMING="1")
    if cfg.get("mem"):
        env["FLATNAV_SPARK_DRIVER_MEM"] = cfg["mem"]
    t0 = time.time()
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"run {cfg['spec']} failed rc={out.returncode}")
    phases: dict[str, float] = {}
    group_writes = []
    # only marks AFTER the sentinel (the warm-up build also emits marks)
    stderr = out.stderr.split("BP_REAL_START", 1)[-1]
    for m in re.finditer(r"\[build-timing\] (.+?): ([0-9.]+)s", stderr):
        label, secs = m.group(1), float(m.group(2))
        if label.endswith(":tokenize-write"):
            group_writes.append(secs)
        else:
            phases[label] = phases.get(label, 0.0) + secs
    total = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("PHASES_TOTAL")][-1]
        .split(" ", 1)[1]
    )
    return {
        "cfg": cfg, "wall": total["wall"], "n_docs": total["n_docs"],
        "busy_cores": total["busy_cores"], "steal_cores": total["steal_cores"],
        "phases": {k: round(v, 2) for k, v in sorted(phases.items())},
        "group_write_secs": [round(s, 2) for s in group_writes],
        "harness_wall": round(time.time() - t0, 1),
    }


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "zipf:200000"
    specs = sys.argv[2:] or ["8", "32"]
    repeats = int(os.environ.get("FLATNAV_BP_REPEATS", "2"))
    cfgs = [parse_spec(s) for s in specs]
    runs: dict[str, list] = {c["spec"]: [] for c in cfgs}
    for i in range(repeats):
        for cfg in cfgs:  # interleaved so host drift hits all specs equally
            r = run_once(cfg, corpus)
            runs[cfg["spec"]].append(r)
            print(json.dumps({"repeat": i, **r}), flush=True)

    # per-spec minima table
    summary = {}
    for spec, rs in runs.items():
        keys = set().union(*(r["phases"].keys() for r in rs))
        summary[spec] = {
            "wall_min": min(r["wall"] for r in rs),
            "busy_cores": [r["busy_cores"] for r in rs],
            "steal_cores": [r["steal_cores"] for r in rs],
            "phases_min": {k: min(r["phases"].get(k, float("inf")) for r in rs)
                           for k in sorted(keys)},
            "group_writes": [r["group_write_secs"] for r in rs],
        }
    print("SUMMARY " + json.dumps({"corpus": corpus, "repeats": repeats,
                                   "specs": summary}))


if __name__ == "__main__":
    main()
