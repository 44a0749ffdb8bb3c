"""Approximate WAND (threshold factor theta) — the recall/QPS tradeoff knob.

theta is the classic WAND threshold factor F (Broder et al., CIKM 2003
§6): prune blocks whose upper bound is below thr * theta. The engine's
analog of the reference's ef_search recall@k sweep
(experiments/run-benchmark.py:43-85,270-313).

Contract pinned here:
  - theta = 1.0 is bit-identical to the default lossless path;
  - theta > 1.0 returns only TRUE (doc, exact-score) pairs — the score of
    every returned doc equals its exact score (approximation only drops
    results, never corrupts them);
  - per-rank results are a "prefix with holes" of the exact ranking:
    returned docs appear in exact relative order;
  - pruning is monotone in theta (more aggressive never prunes less);
  - theta < 1.0 is rejected.
"""

from __future__ import annotations

import pytest

from flatnav_spark.query import batch_query

K = 5


@pytest.fixture(scope="module")
def zidx(spark, tmp_path_factory):
    from flatnav_spark.build import build_index
    from flatnav_spark.corpus import synth_zipf_corpus

    rows = synth_zipf_corpus(3000, n_terms=20000, median_dl=80)
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = str(tmp_path_factory.mktemp("approx") / "zidx")
    return build_index(corpus, out, mode="code", n_splits=8, n_groups=1,
                       block_range=64, chunk_blocks=4, out_partitions=4)


@pytest.fixture(scope="module")
def qdf(spark):
    queries = [(i, t) for i, t in enumerate(
        ["vaaaaaaa0 import", "vbaaaaaa0", "def return self", "vcaaaaaa0 vdaaaaaa0",
         "parseIndex mergeBuffer", "vaeaaaaa0 class"]
    )]
    return spark.createDataFrame(queries, "query_id long, query_text string")


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


def test_theta_one_is_exact(spark, zidx, qdf):
    exact = _rows(batch_query(spark, zidx, qdf, k=K, prune=True))
    theta1 = _rows(batch_query(spark, zidx, qdf, k=K, prune=True, approx_factor=1.0))
    assert theta1 == exact


@pytest.mark.parametrize("theta", [1.25, 2.0])
def test_approx_returns_true_scores_in_exact_order(spark, zidx, qdf, theta):
    # corpus-deep exact ranking: approx answers may contain ANY exact rank
    deep = batch_query(spark, zidx, qdf, k=3000, prune=False).collect()
    exact_score = {(r.query_id, r.doc_id): r.score for r in deep}
    exact_pos = {(r.query_id, r.doc_id): r.rank for r in deep}

    approx = batch_query(spark, zidx, qdf, k=K, prune=True,
                         approx_factor=theta).collect()
    assert approx  # theta must not wipe out every result on this fixture
    by_q: dict[int, list] = {}
    for r in approx:
        # every returned score is the doc's TRUE exact score
        assert (r.query_id, r.doc_id) in exact_score
        assert r.score == exact_score[(r.query_id, r.doc_id)]
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        # ranks are 1..n dense and docs appear in exact relative order
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        pos = [exact_pos[(q, r.doc_id)] for r in rs]
        assert pos == sorted(pos)


def test_pruning_monotone_in_theta(spark, zidx, qdf):
    pruned_at = {}
    for theta in (1.0, 1.5, 3.0):
        res = batch_query(spark, zidx, qdf, k=K, prune=True,
                          approx_factor=theta, collect_metrics=True)
        res.collect()
        accs = res._flatnav_accumulators
        pruned_at[theta] = int(accs["pairs_pruned"].value)
    assert pruned_at[1.0] <= pruned_at[1.5] <= pruned_at[3.0]
    assert pruned_at[3.0] > pruned_at[1.0]  # the knob actually bites


def test_recall_reasonable_at_mild_theta(spark, zidx, qdf):
    exact = batch_query(spark, zidx, qdf, k=K, prune=True).collect()
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.doc_id)
    approx = batch_query(spark, zidx, qdf, k=K, prune=True,
                         approx_factor=1.1).collect()
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.doc_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.5  # mild overshoot keeps most of the top-k


def test_theta_below_one_rejected(spark, zidx, qdf):
    with pytest.raises(ValueError, match="approx_factor"):
        batch_query(spark, zidx, qdf, k=K, approx_factor=0.9)
    from flatnav_spark.query import query_one
    with pytest.raises(ValueError, match="approx_factor"):
        query_one(spark, zidx, "import", k=K, approx_factor=0.5)


def test_query_one_and_service_approx_true_scores(spark, zidx):
    """query_one and StandingQueryService honor theta; returned scores are
    true scores, and the service's threshold cache (fed from approximate
    answers — still valid lower bounds) keeps repeats consistent."""
    from flatnav_spark.query import query_one
    from flatnav_spark.service import StandingQueryService

    text = "def return self"
    # corpus-deep exact map: approximate answers may contain docs from
    # ANY exact rank (pruned-away better docs are replaced by lower ones)
    exact = {d: s for _, d, s in query_one(spark, zidx, text, k=3000,
                                           prune=False)}
    approx = query_one(spark, zidx, text, k=K, approx_factor=1.5)
    assert approx
    for _, doc_id, score in approx:
        assert exact[doc_id] == score

    svc = StandingQueryService(spark, zidx, k=K, approx_factor=1.5)
    first = svc.search_one(text)
    again = svc.search_one(text)  # seeded from the approximate k-th
    for hits in (first, again):
        for _, doc_id, score in hits:
            assert exact[doc_id] == score
