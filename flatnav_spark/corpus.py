"""Deterministic synthetic source-code corpus + query set (FIXTURES.md §1-2).

The engine's own fixture generator: an Iceberg-shaped table
(repo, path, commit, lang, content) whose contents mix camelCase /
snake_case identifiers, language keywords and literals under a Zipf
(s≈1.1) vocabulary so head terms (``import``, ``def``) are genuinely hot —
the skew the salted merge path must handle (BASELINE.json north_star).

Mirrors the reference's randomized fixtures (test_utils.py:28-29 random
matrices, seed-fixed) but fully deterministic: seed=42, no wall clock.
All generation is numpy-vectorized; Spark ingests the result via
``createDataFrame`` (Arrow path) or a parquet round-trip.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np

SEED = 42
LANGS = ["python", "java", "go", "js", "c"]
LANG_W = [0.40, 0.20, 0.15, 0.15, 0.10]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}
KEYWORDS = {
    "python": ["import", "def", "class", "return", "self", "None", "for", "if"],
    "java": ["import", "public", "class", "static", "void", "return", "new", "final"],
    "go": ["package", "import", "func", "return", "type", "struct", "defer", "go"],
    "js": ["import", "function", "const", "return", "class", "let", "async", "await"],
    "c": ["include", "static", "void", "return", "struct", "int", "char", "sizeof"],
}

_CAMEL_HEADS = ["get", "set", "parse", "build", "run", "load", "save", "merge",
                "split", "read", "write", "find", "make", "init", "handle", "emit"]
_CAMEL_TAILS = ["Index", "Buffer", "Query", "Token", "Result", "Config", "Batch",
                "Stream", "Node", "Block", "Score", "Cache", "Shard", "Worker"]
_SNAKE_A = ["doc", "term", "block", "posting", "shard", "partition", "hash",
            "byte", "file", "row", "query", "score", "merge", "token"]
_SNAKE_B = ["count", "size", "offset", "limit", "index", "table", "buffer",
            "stats", "cache", "state", "reader", "writer", "codec", "heap"]


def _vocabulary() -> List[str]:
    """~2,000 deterministic identifiers: keywords first (Zipf head), then
    camelCase, snake_case, plain words and literals."""
    vocab: List[str] = []
    for lang in LANGS:
        for kw in KEYWORDS[lang]:
            if kw not in vocab:
                vocab.append(kw)
    for h in _CAMEL_HEADS:
        for t in _CAMEL_TAILS:
            vocab.append(h + t)                      # 224 camelCase
    for a in _SNAKE_A:
        for b in _SNAKE_B:
            vocab.append(f"{a}_{b}")                 # 196 snake_case
    rng = np.random.default_rng(SEED)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for i in range(1200):
        n = int(rng.integers(3, 10))
        vocab.append("".join(rng.choice(letters, size=n)) + str(i % 7))
    for i in range(100):
        vocab.append(str(int(rng.integers(0, 100000))))  # number literals
    # dedupe preserving order
    seen = set()
    out = []
    for v in vocab:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


def synth_corpus(n_docs: int, seed: int = SEED, start: int = 0) -> List[Tuple[str, str, str, str, str]]:
    """Rows (repo, path, commit, lang, content), deterministic in (n_docs,
    seed, start). Token sampling is one vectorized Zipf draw over the whole
    chunk. ``start`` offsets doc identities so large corpora can be
    generated in independent deterministic chunks (see write_corpus_parquet)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocabulary())
    weights = _zipf_weights(len(vocab))
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    # ~5-100 "lines" of ~6 tokens each -> 30..600 tokens per doc
    toks_per_doc = (rng.integers(20, 401, size=n_docs) // 4) * 6
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(toks_per_doc, out=offsets[1:])
    flat = rng.choice(vocab, size=int(offsets[-1]), p=weights)
    rows: List[Tuple[str, str, str, str, str]] = []
    for j in range(n_docs):
        i = start + j
        lang = LANGS[int(lang_idx[j])]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/mod{i % 41}/file{i}.{EXT[lang]}"
        commit = hashlib.sha256(f"commit{i // 50}".encode()).hexdigest()[:40]
        kw = KEYWORDS[lang]
        body = " ".join(flat[offsets[j]: offsets[j + 1]].tolist())
        content = f"{kw[0]} {kw[1]}\n{body}"
        rows.append((repo, path, commit, lang, content))
    return rows


def write_corpus_parquet(path: str, n_docs: int, seed: int = SEED,
                         chunk: int = 100_000) -> str:
    """Deterministic corpus written straight to parquet via pyarrow in
    independent chunks (seed derived per chunk) — memory-safe for the
    million-doc scaling fixture without a Spark session."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    n_chunks = (n_docs + chunk - 1) // chunk
    for c in range(n_chunks):
        start = c * chunk
        n = min(chunk, n_docs - start)
        rows = synth_corpus(n, seed=seed + c * 10_007, start=start)
        cols = list(zip(*rows))
        table = pa.table(
            {
                "repo": pa.array(cols[0]),
                "path": pa.array(cols[1]),
                "commit": pa.array(cols[2]),
                "lang": pa.array(cols[3]),
                "content": pa.array(cols[4]),
            }
        )
        pq.write_table(table, os.path.join(path, f"part-{c:05d}.parquet"))
    return path


# ---------------------------------------------------------------------------
# Realistic-scale fixture (round-2 VERDICT #2): a >=100k-term Zipf vocabulary
# with heavy-tailed term frequencies AND document lengths, so the engine's
# scale features (block-max WAND pruning, salted hot-term merge, row-group
# pruning) are actually exercised. The reference benchmarks on real datasets
# up to 100M points (experiments/README.md:225-256); this is the synthetic
# stand-in with comparable statistical shape for a code corpus:
#   - term ranks ~ Zipf(s=1.07): `import`-class keywords in ~every doc,
#     a long tail of identifiers with df in the hundreds
#   - doc lengths ~ lognormal (median ~200 tokens, tail to 4000)

ZIPF_VOCAB = 120_000
ZIPF_S = 1.07


def _zipf_vocabulary(n_terms: int = ZIPF_VOCAB) -> List[str]:
    """Deterministic n_terms-sized identifier vocabulary, hot-first:
    keywords, then structured camelCase/snake_case (which the code
    tokenizer further splits — realistic subtoken sharing), then unique
    unstructured lowercase identifiers (1:1 with index terms)."""
    vocab: List[str] = []
    seen = set()

    def add(t: str) -> None:
        if t not in seen:
            seen.add(t)
            vocab.append(t)

    for lang in LANGS:
        for kw in KEYWORDS[lang]:
            add(kw)
    for suffix in ("", "2", "3"):
        for h in _CAMEL_HEADS:
            for t in _CAMEL_TAILS:
                add(h + t + suffix)
        for a in _SNAKE_A:
            for b in _SNAKE_B:
                add(f"{a}_{b}{suffix}")
    # unstructured tail: base-26 letter strings, unique by construction
    letters = "abcdefghijklmnopqrstuvwxyz"
    i = 0
    while len(vocab) < n_terms:
        x = i
        s = ""
        for _ in range(7):
            s += letters[x % 26]
            x //= 26
        add("v" + s)
        i += 1
    return vocab[:n_terms]


def synth_zipf_corpus(n_docs: int, seed: int = SEED, start: int = 0,
                      n_terms: int = ZIPF_VOCAB,
                      median_dl: int = 200) -> List[Tuple[str, str, str, str, str]]:
    """Heavy-tailed corpus chunk, deterministic in (n_docs, seed, start).
    One vectorized Zipf draw for all tokens; dl ~ clipped lognormal."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_zipf_vocabulary(n_terms))
    weights = _zipf_weights(n_terms, s=ZIPF_S)
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    toks_per_doc = np.clip(
        rng.lognormal(mean=np.log(median_dl), sigma=1.0, size=n_docs), 20, 4000
    ).astype(np.int64)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(toks_per_doc, out=offsets[1:])
    flat_idx = rng.choice(n_terms, size=int(offsets[-1]), p=weights)
    flat = vocab[flat_idx]
    rows: List[Tuple[str, str, str, str, str]] = []
    for j in range(n_docs):
        i = start + j
        lang = LANGS[int(lang_idx[j])]
        repo = f"org{i % 13}/zrepo{i % 97}"
        path = f"src/pkg{i % 211}/zfile{i}.{EXT[lang]}"
        commit = hashlib.sha256(f"zcommit{i // 50}".encode()).hexdigest()[:40]
        kw = KEYWORDS[lang]
        body = " ".join(flat[offsets[j]: offsets[j + 1]].tolist())
        content = f"{kw[0]} {kw[1]}\n{body}"
        rows.append((repo, path, commit, lang, content))
    return rows


def _write_zipf_chunk(args) -> str:
    path, c, n, seed, start, n_terms, median_dl = args
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = synth_zipf_corpus(n, seed=seed, start=start,
                             n_terms=n_terms, median_dl=median_dl)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "repo": pa.array(cols[0]),
            "path": pa.array(cols[1]),
            "commit": pa.array(cols[2]),
            "lang": pa.array(cols[3]),
            "content": pa.array(cols[4]),
        }
    )
    out = os.path.join(path, f"part-{c:05d}.parquet")
    pq.write_table(table, out)
    return out


def write_zipf_corpus_parquet(path: str, n_docs: int, seed: int = SEED,
                              chunk: int = 50_000, n_terms: int = ZIPF_VOCAB,
                              median_dl: int = 200, workers: int = 8) -> str:
    """Deterministic Zipf corpus straight to parquet — same contract as
    write_corpus_parquet. Chunks are independent (per-chunk derived seed),
    so generation fans out over a process pool; the output bytes do not
    depend on worker count."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(path, exist_ok=True)
    n_chunks = (n_docs + chunk - 1) // chunk
    jobs = [
        (path, c, min(chunk, n_docs - c * chunk), seed + c * 10_007,
         c * chunk, n_terms, median_dl)
        for c in range(n_chunks)
    ]
    if n_chunks <= 1 or workers <= 1:
        for j in jobs:
            _write_zipf_chunk(j)
    else:
        with ProcessPoolExecutor(max_workers=min(workers, n_chunks)) as pool:
            list(pool.map(_write_zipf_chunk, jobs))
    return path


def synth_queries(n_queries: int, seed: int = SEED) -> List[Tuple[int, str]]:
    """(query_id, query_text): 60% mid-frequency, 25% with one hot keyword,
    15% with one rare/absent term (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocabulary()
    hot = vocab[:10]
    mid = vocab[40:600]
    out: List[Tuple[int, str]] = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        r = rng.random()
        terms = [mid[int(rng.integers(0, len(mid)))] for _ in range(n_terms)]
        if r >= 0.60 and r < 0.85:
            terms[0] = hot[int(rng.integers(0, len(hot)))]
        elif r >= 0.85:
            terms[0] = f"zz_absent_{qid}" if rng.random() < 0.5 else vocab[-1 - qid % 90]
        out.append((qid, " ".join(terms)))
    return out


def corpus_df(spark, n_docs: int, seed: int = SEED):
    """Corpus as a Spark DataFrame with the BASELINE.json input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ])
    return spark.createDataFrame(synth_corpus(n_docs, seed), schema=schema)


def corpus_from_files(spark, root: str, repo: str = "local",
                      pattern: str = "*", recursive: bool = True):
    """Raw source files on disk / object store -> corpus DataFrame via
    Spark's ``binaryFile`` source — the chunked binary-scan analog (S3:
    reference ``BinaryDatasetLoader.load_data()``, experiments/
    data_loader.py:128-219, np.memmap chunked reads). Spark's natural
    chunking replaces memmap: files are split across partitions, read
    executor-side (no driver I/O), decoded per batch.

    Columns follow the input_hint schema: lang is derived from the file
    extension, commit from the content sha (a content-addressed stand-in
    when no VCS metadata exists — stable across re-scans)."""
    from pyspark.sql import functions as F

    ext_lang = {v: k for k, v in EXT.items()}
    lang_map = F.create_map(
        *[F.lit(x) for pair in ext_lang.items() for x in pair]
    )
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(root)
    ext = F.element_at(F.split(F.col("path"), "\\."), -1)
    return df.select(
        F.lit(repo).alias("repo"),
        F.regexp_replace(F.col("path"), "^file:/*", "/").alias("path"),
        F.sha2(F.col("content"), 256).substr(1, 40).alias("commit"),
        F.coalesce(lang_map[ext], F.lit("unknown")).alias("lang"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
    )


REQUIRED_COLUMNS = ("repo", "path", "commit", "lang", "content")


def corpus_from_table(spark, table: str):
    """Corpus from a CATALOG TABLE — the Iceberg source of the north rule
    (`input_hint`: "Iceberg table of source-code repositories with columns
    (repo, path, commit, lang, content)").

    ``spark.read.table`` is catalog-agnostic: with an Iceberg (or Delta /
    Hive) catalog configured in spark-defaults the same call gets
    snapshot-isolated scans, partition pruning, and metadata-driven file
    skipping from the table format — no engine change needed, which is
    why the engine standardizes on the DataFrame-in interface
    (build_index takes any DataFrame) and this helper only validates the
    contract: the five input_hint columns must exist; extras are pruned
    so the scan's ReadSchema stays minimal. This sandbox has no Iceberg
    runtime jar, so tests exercise the same code path through the
    session catalog (temp views / managed tables), which resolves through
    the identical ``read.table`` API."""
    from pyspark.sql import functions as F

    df = spark.read.table(table)
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"table {table!r} is missing corpus columns {missing}; "
            f"expected {list(REQUIRED_COLUMNS)} (BASELINE.json input_hint)"
        )
    return df.select(*[F.col(c) for c in REQUIRED_COLUMNS])


def resolve_corpus(spark, source: str):
    """CLI corpus resolver: ``table:<catalog.db.name>`` reads through the
    catalog (Iceberg-ready, corpus_from_table); anything else is a
    parquet path."""
    if source.startswith("table:"):
        return corpus_from_table(spark, source[len("table:"):])
    return spark.read.parquet(source)


def documents_as_corpus(spark, sf_dir: str):
    """Adapt the driver's documents.parquet (doc_id, text, lang, source,
    n_chars) to the corpus schema — TESTDATA.md stand-in per FIXTURES.md §1."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
