"""Bulk postings import (the Index::buildGraphLinks .mtx ingest analog,
Index.h:187-238): an index adopted from a flat (term, doc_id, tf) table
must answer queries identically to the index that exported it, and be
first-class (extendable)."""

import pytest

from flatnav_spark.build import build_index, extend_index, import_postings
from flatnav_spark.corpus import corpus_df, synth_corpus, synth_queries
from flatnav_spark.maintenance import postings_table, validate_index
from flatnav_spark.query import batch_query

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _topk(spark, index, queries, k=10):
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in batch_query(spark, index, qdf, k=k).collect()
    )


def test_import_roundtrip_identical(spark, tmp_path):
    corpus = corpus_df(spark, 150)
    orig = build_index(corpus, str(tmp_path / "orig"), mode="code", n_splits=8,
                       n_groups=2, block_range=64, out_partitions=4)
    flat = postings_table(spark, orig).select("term", "doc_id", "tf")
    docs = orig.docs(spark).select("doc_id", "repo", "path", "commit", "lang", "content_sha")
    imported = import_postings(spark, flat, str(tmp_path / "imp"), mode="code",
                               block_range=64, n_splits=8, docs_df=docs,
                               out_partitions=4)
    assert imported.manifest.n_docs == orig.manifest.n_docs
    assert imported.manifest.n_postings == orig.manifest.n_postings
    assert imported.manifest.total_dl == orig.manifest.total_dl
    validate_index(spark, imported)
    queries = synth_queries(15)
    assert _topk(spark, orig, queries) == _topk(spark, imported, queries)

    # imported index is first-class: extend it with fresh docs
    extra = spark.createDataFrame(synth_corpus(30, seed=7, start=1000), SCHEMA)
    ext = extend_index(spark, imported, extra, out_partitions=4)
    assert ext.manifest.n_docs == 180
    ids = [r.doc_id for r in ext.docs(spark).collect()]
    assert len(set(ids)) == 180


def test_import_duplicate_doc_ids_rejected(spark, tmp_path):
    flat = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 1)], "term string, doc_id long, tf int"
    )
    docs = spark.createDataFrame(
        [(1, "r", "p", "c", "l", "s"), (1, "r", "p2", "c", "l", "s")],
        "doc_id long, repo string, path string, commit string, lang string, content_sha string",
    )
    with pytest.raises(ValueError, match="not unique"):
        import_postings(spark, flat, str(tmp_path / "dup"), docs_df=docs)


def test_import_synthesized_docs(spark, tmp_path):
    flat = spark.createDataFrame(
        [("alpha", 0, 3), ("alpha", 5, 1), ("beta", 5, 2)],
        "term string, doc_id long, tf int",
    )
    idx = import_postings(spark, flat, str(tmp_path / "synth"), block_range=64,
                          out_partitions=2)
    assert idx.manifest.n_docs == 2
    assert idx.manifest.n_postings == 3
    out = _topk(spark, idx, [(0, "alpha")], k=5)
    assert [r[2] for r in out] == [0, 5]


def test_import_orphan_postings_rejected(spark, tmp_path):
    """A posting whose doc_id is absent from docs_df must fail loudly, not
    silently vanish through the docs-side LEFT join (ADVICE r2)."""
    flat = spark.createDataFrame(
        [("a", 1, 2), ("b", 7, 1)], "term string, doc_id long, tf int"
    )
    docs = spark.createDataFrame(
        [(1, "r", "p", "c", "l", "s")],
        "doc_id long, repo string, path string, commit string, lang string, content_sha string",
    )
    with pytest.raises(ValueError, match="missing from docs_df"):
        import_postings(spark, flat, str(tmp_path / "orphan"), docs_df=docs)


def test_import_out_of_range_doc_ids_rejected(spark, tmp_path):
    for bad in (-3, 1 << 53):
        flat = spark.createDataFrame(
            [("a", bad, 1)], "term string, doc_id long, tf int"
        )
        with pytest.raises(ValueError, match="out of range"):
            import_postings(spark, flat, str(tmp_path / f"bad{bad}"))


def test_resume_over_imported_index_refused(spark, tmp_path):
    """build_index(resume=True) over an import_postings checkpoint must
    raise a descriptive error, not crash on int('import0') (ADVICE r2)."""
    flat = spark.createDataFrame(
        [("alpha", 0, 3), ("beta", 5, 2)], "term string, doc_id long, tf int"
    )
    out = str(tmp_path / "imp_resume")
    import_postings(spark, flat, out, block_range=64, out_partitions=2)
    corpus = corpus_df(spark, 10)
    with pytest.raises(ValueError, match="import"):
        build_index(corpus, out, mode="code", block_range=64, resume=True,
                    out_partitions=2)
