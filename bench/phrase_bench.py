"""Phrase-search cost at zipf scale: positions-build wall vs index build,
positions artifact size vs postings, and phrase-query wall for a batch of
REAL bigrams/trigrams sampled from the corpus (a zipf corpus has few
natural repeats, so phrases are sampled from actual documents to make
match counts nonzero).

Usage: python bench/phrase_bench.py   (env: FLATNAV_BENCH_CORPUS=
zipf:200000, FLATNAV_BENCH_QUERIES=200, FLATNAV_BENCH_INDEX,
FLATNAV_BENCH_CPUS=32, FLATNAV_BENCH_REPEATS=2). Appends to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main():
    corpus_spec = os.environ.get("FLATNAV_BENCH_CORPUS", "zipf:200000")
    n_queries = int(os.environ.get("FLATNAV_BENCH_QUERIES", "200"))
    cpus = int(os.environ.get("FLATNAV_BENCH_CPUS", "32"))
    repeats = int(os.environ.get("FLATNAV_BENCH_REPEATS", "2"))
    index_path = os.environ.get("FLATNAV_BENCH_INDEX",
                                "/dev/shm/flatnav_phrase/index")

    from bench import _get_corpus, _phase_cpu
    from flatnav_spark.build import build_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.phrase import build_positions, phrase_query_batch
    from flatnav_spark.session import get_spark
    from flatnav_spark.tokenizer import get_pos_tokenizer

    spark = get_spark("phrase_bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    corpus = _get_corpus(spark, "", corpus_spec)
    build_wall = None
    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        build_wall, _, _, _ = _phase_cpu(lambda: build_index(
            corpus, index_path, mode="code", n_splits=64, n_groups=2,
            block_range=1024, out_partitions=None))
    index = load_index(index_path)
    m = index.manifest

    if not m.positions_dir:
        pos_wall, _, pb, ps = _phase_cpu(
            lambda: build_positions(spark, corpus, index))
    else:
        pos_wall, pb, ps = None, None, None

    postings_bytes = sum(
        _dir_bytes(os.path.join(index_path, d)) for d in m.postings_dirs)
    positions_bytes = _dir_bytes(os.path.join(index_path, m.positions_dir))

    # REAL phrases: consecutive-token windows sampled from actual docs
    fn = get_pos_tokenizer(m.tokenizer_mode)
    sample = corpus.select("content").limit(n_queries * 2).collect()
    phrases, i = [], 0
    for r in sample:
        toks = [t for t, _ in fn(r.content)][:200]
        if len(toks) < 6:
            continue
        w = 2 + (i % 2)  # alternate bigrams / trigrams
        start = (i * 7) % (len(toks) - w)
        phrases.append((i, " ".join(toks[start:start + w])))
        i += 1
        if i >= n_queries:
            break
    qdf = spark.createDataFrame(phrases, "query_id long, phrase_text string")

    walls, n_rows = [], 0
    for _ in range(repeats):
        rows = []
        w, _, b, s = _phase_cpu(
            lambda: rows.extend(phrase_query_batch(spark, index, qdf, k=10).collect()))
        walls.append((w, b, s))
        n_rows = len(rows)
    best = min(walls)

    lines = ["", f"## Phrase search at scale ({corpus_spec}, "
             f"{len(phrases)} sampled bigram/trigram phrases, local[{cpus}], "
             f"min-of-{repeats})", "",
             "| metric | value |", "|---|---|"]
    if build_wall is not None:
        lines.append(f"| index build wall (s) | {build_wall:.1f} |")
    if pos_wall is not None:
        lines.append(
            f"| positions build wall (s) | {pos_wall:.1f} "
            f"(busy/steal {pb:.1f}/{ps:.1f}) |")
    lines += [
        f"| postings bytes | {postings_bytes:,} |",
        f"| positions bytes | {positions_bytes:,} "
        f"({positions_bytes / max(postings_bytes, 1):.2f}x postings) |",
        f"| phrase batch wall (s) | {best[0]:.2f} "
        f"(busy/steal {best[1]:.1f}/{best[2]:.1f}) |",
        f"| phrase QPS | {len(phrases) / best[0]:.1f} |",
        f"| result rows | {n_rows} |",
        "",
        "Positions are every OCCURRENCE (vs one row per (term, doc) in the "
        "postings), so the artifact is larger by roughly the mean "
        "within-doc term repetition; the phrase query path reads only the "
        "queried terms' rows off the term-sorted layout and verifies "
        "adjacency in Column ops (no UDF).",
        "Raw: " + json.dumps({"walls": walls, "n_phrases": len(phrases),
                              "build_wall": build_wall, "pos_wall": pos_wall,
                              "postings_bytes": postings_bytes,
                              "positions_bytes": positions_bytes}),
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"pos_wall": pos_wall, "phrase_wall": best[0],
                      "qps": round(len(phrases) / best[0], 1),
                      "rows": n_rows,
                      "positions_over_postings":
                      round(positions_bytes / max(postings_bytes, 1), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
