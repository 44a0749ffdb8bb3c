"""Structured Streaming ingest: micro-batches become extend generations,
checkpointed restarts are exactly-once, compaction folds generations, and
the streamed index stays rank-identical to a fresh build over the same
corpus (the Index::add-under-a-stream analog, Index.h:353-378)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_spark.build import build_index
from flatnav_spark.corpus import synth_corpus, synth_queries
from flatnav_spark.index_io import load_index
from flatnav_spark.query import batch_query
from flatnav_spark.reference import golden_topk
from flatnav_spark.streaming import corpus_stream, drain, ingest_rate_stats, stream_ingest

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _write_wave(source_dir: str, name: str, rows) -> None:
    """Write one drop-zone file atomically (write tmp, rename in)."""
    cols = list(zip(*rows))
    table = pa.table({
        "repo": pa.array(cols[0]), "path": pa.array(cols[1]),
        "commit": pa.array(cols[2]), "lang": pa.array(cols[3]),
        "content": pa.array(cols[4]),
    })
    tmp = os.path.join(source_dir, f".{name}.tmp")
    pq.write_table(table, tmp)
    os.rename(tmp, os.path.join(source_dir, name))


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    out = {
        "index": str(base / "index"),
        "source": str(base / "drop"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(out["source"])
    return out


@pytest.fixture(scope="module")
def rows():
    return synth_corpus(220)


@pytest.fixture(scope="module")
def base_index(spark, dirs, rows):
    corpus = spark.createDataFrame(rows[:100], SCHEMA)
    return build_index(corpus, dirs["index"], mode="code", n_splits=8,
                       n_groups=2, block_range=64, out_partitions=4)


def test_stream_ingest_micro_batches_extend(spark, dirs, rows, base_index):
    # two files, one per trigger -> two micro-batches -> two generations
    _write_wave(dirs["source"], "w1.parquet", rows[100:150])
    _write_wave(dirs["source"], "w2.parquet", rows[150:200])
    q = stream_ingest(spark, dirs["index"], dirs["source"], dirs["ckpt"],
                      max_files_per_trigger=1, out_partitions=4)
    drain(q)
    idx = load_index(dirs["index"])
    assert idx.manifest.n_docs == 200
    assert len(idx.manifest.postings_dirs) == 3  # base + 2 stream generations


def test_restart_same_checkpoint_is_noop_then_picks_up_new(spark, dirs, rows):
    # restart with nothing new: checkpoint replays no file, index unchanged
    q = stream_ingest(spark, dirs["index"], dirs["source"], dirs["ckpt"],
                      max_files_per_trigger=1, out_partitions=4)
    drain(q)
    idx = load_index(dirs["index"])
    assert idx.manifest.n_docs == 200
    assert len(idx.manifest.postings_dirs) == 3

    # a third wave after restart is discovered and appended exactly once
    _write_wave(dirs["source"], "w3.parquet", rows[200:220])
    q = stream_ingest(spark, dirs["index"], dirs["source"], dirs["ckpt"],
                      max_files_per_trigger=1, out_partitions=4)
    drain(q)
    idx = load_index(dirs["index"])
    assert idx.manifest.n_docs == 220
    ids = [r.doc_id for r in idx.docs(spark).collect()]
    assert len(ids) == len(set(ids)) == 220


def test_streamed_index_rank_identical_to_fresh_build(spark, dirs, rows):
    idx = load_index(dirs["index"])
    queries = synth_queries(10)
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    engine = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in batch_query(spark, idx, qdf, k=10).collect()
    )
    corpus = spark.createDataFrame(rows, SCHEMA)
    docs = (
        idx.docs(spark).join(corpus, ["repo", "path", "commit"])
        .select("doc_id", "content").collect()
    )
    golden = sorted(golden_topk([(r.doc_id, r.content) for r in docs],
                                queries, k=10, mode="code"))
    assert engine == golden


def test_optimize_every_compacts_generations(spark, tmp_path, rows):
    index_path = str(tmp_path / "index")
    source = str(tmp_path / "drop")
    os.makedirs(source)
    corpus = spark.createDataFrame(rows[:100], SCHEMA)
    build_index(corpus, index_path, mode="code", n_splits=8, n_groups=2,
                block_range=64, out_partitions=4)
    _write_wave(source, "w1.parquet", rows[100:140])
    _write_wave(source, "w2.parquet", rows[140:180])
    q = stream_ingest(spark, index_path, source, str(tmp_path / "ckpt"),
                      optimize_every=2, max_files_per_trigger=1, out_partitions=4)
    drain(q)
    idx = load_index(index_path)
    assert idx.manifest.n_docs == 180
    assert len(idx.manifest.postings_dirs) == 1  # compacted
    assert idx.manifest.metrics.get("opt_gen", 0) >= 1


def test_ingest_rate_stats_windowed(spark, tmp_path, rows):
    source = str(tmp_path / "drop")
    os.makedirs(source)
    _write_wave(source, "w1.parquet", rows[:60])
    stats = ingest_rate_stats(corpus_stream(spark, source))
    q = (stats.writeStream.outputMode("complete").format("memory")
         .queryName("ingest_stats").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "SELECT lang, sum(n_docs) AS n, sum(n_bytes) AS b FROM ingest_stats GROUP BY lang"
    ).collect()
    want = {}
    for r in rows[:60]:
        lang, content = r[3], r[4]
        n, b = want.get(lang, (0, 0))
        want[lang] = (n + 1, b + len(content))
    assert {r.lang: (r.n, r.b) for r in got} == want


def test_stream_dedup_stateful_across_batches(spark, tmp_path, rows):
    """applyInPandasWithState dedup: first occurrence of each content sha
    passes, duplicates are dropped within and across micro-batches, and
    the state survives a checkpointed restart."""
    from flatnav_spark.streaming import stream_dedup

    source = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(source)
    _write_wave(source, "w1.parquet", rows[:50])
    _write_wave(source, "w2.parquet", rows[40:90])  # 40..49 duplicate w1

    out = str(tmp_path / "deduped")

    def run():
        # parquet sink (not memory): file sinks are the ones that support
        # checkpoint recovery, and a dedup stage feeding a table is the
        # real topology
        q = (stream_dedup(corpus_stream(spark, source, max_files_per_trigger=1))
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    got = run()
    paths = sorted(r.path for r in got)
    want = sorted({r[1] for r in rows[:90]})
    assert paths == want  # 90 unique docs, duplicates emitted once
    assert len({r.sha for r in got}) == len(got)

    # restart: w3 duplicates w1 rows 0..19 plus 10 new docs -> only the
    # 10 new pass (state restored from the checkpoint)
    _write_wave(source, "w3.parquet", rows[:20] + rows[90:100])
    got2 = run()
    assert len(got2) == 100
    paths2 = sorted(r.path for r in got2)
    assert paths2 == sorted({r[1] for r in rows[:100]})
