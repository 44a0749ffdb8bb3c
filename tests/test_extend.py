"""Incremental insert (extend_index) — the Index::add-on-a-live-index
analog: existing doc_ids stable, re-adds idempotent, global stats correct,
and query results rank-identical to the reference oracle over the grown
corpus."""

import pytest

from flatnav_spark.build import build_index, extend_index
from flatnav_spark.corpus import corpus_df, synth_corpus, synth_queries
from flatnav_spark.query import batch_query
from flatnav_spark.reference import golden_topk

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ext") / "index")
    rows = synth_corpus(120)
    first, second = rows[:80], rows[80:]
    corpus1 = spark.createDataFrame(first, SCHEMA)
    index = build_index(corpus1, out, mode="code", n_splits=8, n_groups=2,
                        block_range=64, out_partitions=4)
    return index, first, second


def _parity(spark, index, all_rows, queries, k=10):
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    engine = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in batch_query(spark, index, qdf, k=k).collect()
    )
    corpus = spark.createDataFrame(all_rows, SCHEMA)
    docs = (
        index.docs(spark)
        .join(corpus, ["repo", "path", "commit"])
        .select("doc_id", "content")
        .collect()
    )
    golden = sorted(golden_topk([(r.doc_id, r.content) for r in docs], queries, k=k, mode="code"))
    assert engine == golden


def test_extend_grows_and_stays_rank_identical(spark, setup):
    index, first, second = setup
    old_ids = {
        (r.repo, r.path, r.commit): r.doc_id for r in index.docs(spark).collect()
    }
    corpus2 = spark.createDataFrame(second, SCHEMA)
    ext = extend_index(spark, index, corpus2, out_partitions=4)

    assert ext.manifest.n_docs == 120
    new_ids = {(r.repo, r.path, r.commit): r.doc_id for r in ext.docs(spark).collect()}
    # existing doc_ids unchanged
    for key, did in old_ids.items():
        assert new_ids[key] == did
    assert len(set(new_ids.values())) == 120
    _parity(spark, ext, first + second, synth_queries(15))


def test_extend_idempotent_readd(spark, setup):
    index, first, second = setup
    # re-adding already-indexed docs is a no-op on counts
    before = index.manifest.n_docs if index.manifest.n_docs >= 120 else None
    ext = extend_index(spark, index, spark.createDataFrame(second, SCHEMA), out_partitions=4)
    assert ext.manifest.n_docs == 120
    assert ext.docs(spark).select("doc_id").distinct().count() == 120
    _parity(spark, ext, first + second, synth_queries(8))
