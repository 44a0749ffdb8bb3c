"""optimize / postings debug view / validate — the reordering contract:
layout changes, results don't (tools/query_npy.cpp:34-41 measures reorder
speedups; test_index.py:94-120 asserts recall survives reordering — ours
is exact, so we assert identical top-k)."""

import pytest
from pyspark.sql import functions as F

from flatnav_spark.build import build_index
from flatnav_spark.corpus import corpus_df, synth_queries
from flatnav_spark.maintenance import optimize_index, postings_table, validate_index
from flatnav_spark.query import batch_query


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("maint") / "index")
    corpus = corpus_df(spark, 150)
    index = build_index(corpus, out, mode="code", n_splits=8, n_groups=2,
                        block_range=64, out_partitions=4)
    return index


def _topk(spark, index, queries, k=10):
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in batch_query(spark, index, qdf, k=k).collect()
    )


def test_validate_fresh_index(spark, built):
    stats = validate_index(spark, built)
    assert stats["n_docs"] == 150
    assert stats["df_sum"] == stats["n_postings"]


def test_postings_table_roundtrip(spark, built):
    """Decoded postings must reproduce the exact (term, doc, tf) multiset
    the stage-1 runs produced (codec round-trip at table scope)."""
    import os

    decoded = postings_table(spark, built)
    tf_all = (
        spark.read.parquet(os.path.join(built.path, "_stage1", "group=0", "docs"),
                           os.path.join(built.path, "_stage1", "group=1", "docs"))
        .select("doc_id", "dl", F.explode("tfmap").alias("term", "tf"))
        .withColumn("tf", F.col("tf").cast("long"))
    )
    a = decoded.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(term, doc_id, tf, dl))").alias("fp"),
    ).collect()[0]
    b = tf_all.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(term, doc_id, tf, dl))").alias("fp"),
    ).collect()[0]
    assert (a["n"], a["fp"]) == (b["n"], b["fp"])


def test_optimize_identical_results(spark, built):
    queries = synth_queries(12)
    before = _topk(spark, built, queries)
    opt = optimize_index(spark, built, out_partitions=2)
    after = _topk(spark, opt, queries)
    assert before == after
    validate_index(spark, opt)


def test_validate_detects_manifest_drift(spark, built):
    built.manifest.n_docs += 1
    try:
        with pytest.raises(ValueError, match="validation failed"):
            validate_index(spark, built)
    finally:
        built.manifest.n_docs -= 1


def test_optimize_doc_strategy_identical_results(spark, built, tmp_path):
    """Second layout strategy (rcm analog): different physical order, same
    logical content and identical query results."""
    import os
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(built.path, clone)
    from flatnav_spark.index_io import load_index
    idx = load_index(clone)
    queries = synth_queries(12)
    before = _topk(spark, idx, queries)
    opt = optimize_index(spark, idx, out_partitions=2, strategy="doc")
    assert opt.manifest.metrics["layout_strategy"] == "doc"
    assert before == _topk(spark, opt, queries)
    validate_index(spark, opt)
    with pytest.raises(ValueError, match="unknown layout strategy"):
        optimize_index(spark, opt, strategy="zorder")


def test_optimize_crash_recovery(spark, built, tmp_path):
    """Optimize commits by atomic manifest rewrite: a run that died after
    partially writing its compact output (manifest untouched) leaves the
    index fully consistent, and a re-run overwrites the dead output and
    converges."""
    import os
    import shutil

    clone = str(tmp_path / "crashclone")
    shutil.copytree(built.path, clone)
    from flatnav_spark.index_io import load_index
    idx = load_index(clone)
    queries = synth_queries(8)
    before = _topk(spark, idx, queries)

    # dead run's partial output: the dir the next optimize will target
    next_gen = int(idx.manifest.metrics.get("opt_gen", 0)) + 1
    dead = os.path.join(clone, f"postings_opt{next_gen}")
    os.makedirs(os.path.join(dead, "junk"))

    # index still reads fine (manifest never referenced the dead dir) ...
    assert _topk(spark, load_index(clone), queries) == before
    # ... and the re-run converges, superseding the dead output
    opt = optimize_index(spark, load_index(clone), out_partitions=2)
    assert _topk(spark, opt, queries) == before
    assert opt.manifest.postings_dirs == [f"postings_opt{next_gen}"]
    assert not os.path.exists(os.path.join(dead, "junk"))
    validate_index(spark, opt)
