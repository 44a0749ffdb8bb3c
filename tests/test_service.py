"""StandingQueryService — threshold reuse across batches (the WAND scale
path) must be lossless (repeat queries bit-identical to a cold run),
must actually increase pruning on a skewed corpus, and must drop its
caches when the index is extended underneath it."""

import pytest

from flatnav_spark.build import build_index, extend_index
from flatnav_spark.query import batch_query
from flatnav_spark.service import StandingQueryService

SCHEMA = "repo string, path string, commit string, lang string, content string"

QUERIES = [
    (0, "vaaaaaaa0 import"),
    (1, "vbaaaaaa0"),
    (2, "def return self"),
    (3, "vcaaaaaa0 vdaaaaaa0"),
    (4, "parseIndex mergeBuffer"),
    (5, "vaeaaaaa0 class"),
]


@pytest.fixture(scope="module")
def zidx(spark, tmp_path_factory):
    from flatnav_spark.corpus import synth_zipf_corpus

    rows = synth_zipf_corpus(3000, n_terms=20000, median_dl=80)
    corpus = spark.createDataFrame(rows, SCHEMA)
    return build_index(corpus, str(tmp_path_factory.mktemp("svc") / "zidx"),
                       mode="code", n_splits=8, n_groups=1, block_range=64,
                       chunk_blocks=4, out_partitions=4)


def test_repeat_batch_bit_identical_and_prunes_more(spark, zidx):
    # num_partitions pinned to the multi-task regime this test is about:
    # r6's data-sized pass partitioning runs this tiny fixture as ONE
    # task, where cold task-local thresholds already prune maximally and
    # "seeded prunes strictly more" (the scale property under test, which
    # needs >1 task to be visible) vacuously fails
    svc = StandingQueryService(spark, zidx, k=5, num_partitions=8)
    cold = svc.search_batch(QUERIES, collect_metrics=True)
    cold_m = svc.last_metrics
    assert svc.cached_thresholds > 0
    warm = svc.search_batch(QUERIES, collect_metrics=True)
    warm_m = svc.last_metrics
    # losslessness: the attained k-th score is a true lower bound, so the
    # seeded repeat returns the identical (rank, doc_id, score) rows
    assert warm == cold
    # and the seed must not prune LESS than the cold run (on this skewed
    # fixture it prunes strictly more (query,block) pairs)
    assert warm_m["pairs_pruned"] >= cold_m["pairs_pruned"]
    assert warm_m["pairs_scored"] <= cold_m["pairs_scored"]
    assert warm_m["pairs_pruned"] > cold_m["pairs_pruned"]
    # matches a plain cold batch_query exactly
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    plain = {}
    for r in batch_query(spark, zidx, qdf, k=5).collect():
        plain.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.doc_id), float(r.score)))
    for hits in plain.values():
        hits.sort()
    assert warm == plain


def test_search_one_seeded_repeat_identical(spark, zidx):
    svc = StandingQueryService(spark, zidx, k=5)
    first = svc.search_one("vaaaaaaa0 import")
    assert first
    assert svc.cached_thresholds == 1
    again = svc.search_one("vaaaaaaa0 import")
    assert again == first


def test_threshold_cache_fifo_eviction(spark, zidx):
    svc = StandingQueryService(spark, zidx, k=5, thr_cache_size=2)
    svc.search_batch(QUERIES[:3])
    assert svc.cached_thresholds <= 2


def test_extend_under_live_service_drops_caches(spark, tmp_path):
    from flatnav_spark.corpus import synth_corpus

    out = str(tmp_path / "index")
    rows = synth_corpus(100, seed=11)
    second = [(r[0], r[1], r[2], r[3], r[4] + " zzservicenewterm")
              for r in rows[80:]]
    index = build_index(spark.createDataFrame(rows[:80], SCHEMA), out,
                        mode="code", n_splits=8, n_groups=1, block_range=64,
                        out_partitions=4)
    svc = StandingQueryService(spark, index, k=5)
    before = svc.search_batch([(0, "import def")])
    assert svc.cached_thresholds >= 1
    extend_index(spark, index, spark.createDataFrame(second, SCHEMA),
                 out_partitions=4)
    # stamp changed -> thresholds and stats cache dropped on next call;
    # a term that exists ONLY in the extension must now be served
    hits = svc.search_batch([(0, "zzservicenewterm")])
    assert hits and hits[0]
    # and the pre-extend query still matches a cold batch over the grown
    # index (stale thresholds would have been unsound here)
    after = svc.search_batch([(0, "import def")])
    qdf = spark.createDataFrame([(0, "import def")],
                                "query_id long, query_text string")
    plain = sorted((int(r.rank), int(r.doc_id), float(r.score))
                   for r in batch_query(spark, index, qdf, k=5).collect())
    assert after[0] == plain
    assert before[0] != after[0] or index.manifest.n_docs == 100


def test_batch_query_preloaded_stats_bit_identical(spark, zidx):
    """_resolve_query_terms: the zero-job driver-side stats resolution must
    return bit-identical batches to the distributed stats join, for both
    the pruned and exact paths."""
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    for prune in (True, False):
        zidx._stats_cache = None
        cold = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in batch_query(spark, zidx, qdf, k=5, prune=prune).collect()
        )
        zidx.preload_term_stats(spark)
        fast = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in batch_query(spark, zidx, qdf, k=5, prune=prune).collect()
        )
        zidx._stats_cache = None
        assert fast == cold
