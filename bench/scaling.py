"""N -> 4N scaling-efficiency harness (BASELINE.md protocol).

Runs the identical build + batched-query job at local[8] and local[32]
on the same input — the sandbox stand-in for N vs 4N executors per the
driver's instruction — each in a FRESH JVM (subprocess) so neither run
inherits the other's JIT/caches, and writes BENCH/BASELINE.md with
throughput at both parallelism levels and the scaling efficiency
    eff = (T_N / T_4N) / 4.

Usage:  python bench/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str, n_queries: int, tag: str = "") -> dict:
    # bench.py prints a compact driver-parseable headline and writes the
    # full result (3-grain counters, index info) to FLATNAV_BENCH_FULL_OUT;
    # the scaling harness keeps every full artifact under BENCH/raw/
    full_out = os.path.join(REPO, "BENCH", "raw", f"scaling_N{cpus}_{tag}.json")
    os.makedirs(os.path.dirname(full_out), exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        FLATNAV_BENCH_QUERIES=str(n_queries),
        FLATNAV_BENCH_FULL_OUT=full_out,
        # a deterministic code corpus large enough that per-task compute,
        # not per-action driver overhead, dominates (FIXTURES.md §5 scaled
        # up 4x for the same reason the reference benchmarks at 1M+ points)
        FLATNAV_BENCH_CORPUS=os.environ.get("FLATNAV_BENCH_CORPUS", "synth:200000"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    head = json.loads(line)
    try:
        with open(full_out) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return head


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "1000"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))
    n_small, n_large = 8, 32
    os.environ.setdefault("FLATNAV_BENCH_FAST", "1")

    # host ceiling first: bare-process fixed-work speedup at 8 -> 32 —
    # no engine phase can scale better than this
    sys.path.insert(0, os.path.join(REPO, "bench"))
    from cpu_probe import probe

    raw_dir = os.path.join(REPO, "BENCH", "raw")
    ceiling_path = os.path.join(raw_dir, "ceiling.json")
    if "--summarize" in sys.argv:
        # rebuild BASELINE.md from existing BENCH/raw artifacts — used to
        # fold in extra interleaved repeats (e.g. after a steal-window
        # contaminated run) without redoing the whole harness
        import glob

        with open(ceiling_path) as f:
            ceiling = json.load(f)
        runs_small = [json.load(open(f)) for f in
                      sorted(glob.glob(os.path.join(raw_dir, "scaling_N8_run*.json")))]
        runs_large = [json.load(open(f)) for f in
                      sorted(glob.glob(os.path.join(raw_dir, "scaling_N32_run*.json")))]
        repeats = max(len(runs_small), len(runs_large))
    else:
        ceiling = probe(repeats=2)
        os.makedirs(raw_dir, exist_ok=True)
        with open(ceiling_path, "w") as f:
            json.dump(ceiling, f)

        # INTERLEAVED A/B pairs (N8, N32, N8, N32, ...) so slow host drift
        # hits both configs equally; min per phase over repeats — the
        # sandbox host shows multi-second interference spikes, minima
        # estimate capacity.
        runs_small, runs_large = [], []
        for i in range(repeats):
            runs_small.append(run_at(n_small, sf_dir, n_queries, tag=f"run{i}"))
            runs_large.append(run_at(n_large, sf_dir, n_queries, tag=f"run{i}"))

    def best_of(runs) -> dict:
        # EVERY derived throughput is recomputed from the per-phase minima
        # (round-3 VERDICT #4: qps_wand was left stale from run 0, so the
        # raw artifact contradicted the table built from the minima)
        best = dict(runs[0])
        best["queries"] = {
            phase: min(r["queries"][phase] for r in runs) for phase in runs[0]["queries"]
        }
        best["files_per_sec"] = round(best["n_docs"] / best["queries"]["build"], 2)
        best["qps"] = round(best["n_queries"] / best["queries"]["query_batch"], 2)
        if "query_batch_wand" in best["queries"]:
            best["qps_wand"] = round(
                best["n_queries"] / best["queries"]["query_batch_wand"], 2)
        best["all_runs"] = [r["queries"] for r in runs]
        return best

    r_small = best_of(runs_small)
    r_large = best_of(runs_large)

    rows = []
    effs = {}
    phases = ["build", "query_batch", "query_batch_wand"]
    if "tokenize_compute" in r_small["queries"]:
        phases.append("tokenize_compute")
    for phase in phases:
        t_n = r_small["queries"][phase]
        t_4n = r_large["queries"][phase]
        eff = (t_n / t_4n) / (n_large / n_small)
        effs[phase] = eff
        if phase == "build":
            thr_unit, thr_n, thr_4n = "files/sec", r_small["files_per_sec"], r_large["files_per_sec"]
        elif phase == "tokenize_compute":
            thr_unit = "files/sec"
            thr_n = round(r_small["n_docs"] / t_n, 1)
            thr_4n = round(r_large["n_docs"] / t_4n, 1)
        else:
            thr_unit = "QPS"
            thr_n = round(r_small["n_queries"] / t_n, 1)
            thr_4n = round(r_large["n_queries"] / t_4n, 1)
        rows.append((phase, t_n, t_4n, thr_n, thr_4n, thr_unit, eff))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        corpus_spec = r_large.get("corpus", "documents")
        corpus_label = (f"corpus `{corpus_spec}`" if corpus_spec != "documents"
                        else f"`{sf_dir}` documents")
        f.write("# BENCH/BASELINE — measured throughput & N→4N scaling\n\n")
        f.write(f"Input: {corpus_label} ({r_large['n_docs']} docs), "
                f"{n_queries} queries, k={r_large['k']}, "
                f"tokenizer=code, block_range=1024.\n")
        f.write(f"Protocol: identical job at local[{n_small}] (N) and "
                f"local[{n_large}] (4N), fresh JVM each, one excluded "
                f"warm-up batch; efficiency = (T_N / T_4N) / 4. "
                f"Sandbox stand-in for N vs 4N executors per driver "
                f"instruction (BASELINE.md).\n\n")
        f.write(f"Host ceiling (bench/cpu_probe.py, bare processes, fixed "
                f"arithmetic, no writes): 8→32 workers efficiency "
                f"**{ceiling['ceiling_eff_8_to_32']:.3f}** "
                f"(t8 {ceiling['t8']}s → t32 {ceiling['t32']}s; 1→8 eff "
                f"{ceiling['eff_1_to_8']:.3f}). No engine phase can exceed "
                f"this on this host; 'norm eff' divides by it.\n\n")
        f.write("| phase | T at N=8 (s) | T at 4N=32 (s) | thr @N | thr @4N | unit | scaling eff | norm eff |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        ceil = max(ceiling["ceiling_eff_8_to_32"], 1e-9)
        for phase, t_n, t_4n, thr_n, thr_4n, unit, eff in rows:
            f.write(f"| {phase} | {t_n:.2f} | {t_4n:.2f} | {thr_n:.1f} | "
                    f"{thr_4n:.1f} | {unit} | {eff:.3f} | {eff / ceil:.3f} |\n")
        f.write("\nTarget: efficiency >= 0.8 for both phases "
                "(BASELINE.json north_rule); on this host the bare-process "
                "ceiling itself is below 0.8, so norm eff (phase eff / "
                "host ceiling) is the comparable number.\n\n")
        f.write("## Raw results\n\n```json\n")
        f.write(json.dumps({"host_ceiling": ceiling, "N8": r_small, "N32": r_large}, indent=2))
        f.write("\n```\n")

    print(json.dumps({"efficiency": effs, "report": md}))


if __name__ == "__main__":
    main()
