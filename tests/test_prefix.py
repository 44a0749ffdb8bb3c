"""Prefix (wildcard) queries (flatnav_spark/query.py:
expand_query_patterns / prefix_query_batch).

Semantics gate: BM25 is additive over query terms, so a prefix query's
scores must equal the per-doc SUM of single-term query scores over the
expanded vocabulary — computed here by running each expanded term as its
own batch_query and merging driver-side. Also pins: cache/no-cache
expansion equivalence, overlap dedup (pattern + literal naming the same
term), max_expansions capping, absent prefixes, and the bare-'*' refusal.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from flatnav_spark.query import (
    batch_query,
    expand_query_patterns,
    prefix_query_batch,
)

K = 8


@pytest.fixture(scope="module")
def qidx(spark, tmp_path_factory):
    from flatnav_spark.build import build_index
    from flatnav_spark.corpus import write_corpus_parquet

    root = str(tmp_path_factory.mktemp("prefix"))
    write_corpus_parquet(f"{root}/corpus", 150)
    corpus = spark.read.parquet(f"{root}/corpus")
    return build_index(corpus, f"{root}/idx", mode="code", n_splits=4,
                       n_groups=1)


def _expanded_terms(spark, index, pattern_text):
    rows = expand_query_patterns(spark, index, [(0, pattern_text)])
    return sorted({r["term"] for r in rows})


def _sum_of_single_terms(spark, index, terms, k):
    """Per-doc sum of single-term BM25 scores == the multi-term score."""
    acc = defaultdict(float)
    for i, t in enumerate(terms):
        qdf = spark.createDataFrame([(i, t)], "query_id long, query_text string")
        # huge k: gather every matching doc for the term
        for r in batch_query(spark, index, qdf, k=10**6).collect():
            acc[r.doc_id] += r.score
    ranked = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, d, round(s, 9)) for i, (d, s) in enumerate(ranked)]


def test_prefix_scores_are_sum_over_expansion(spark, qidx):
    terms = _expanded_terms(spark, qidx, "mer*")
    assert len(terms) >= 1
    # single-term texts must tokenize to themselves for the reference sum
    from flatnav_spark.tokenizer import get_tokenizer
    tok = get_tokenizer(qidx.manifest.tokenizer_mode)
    terms = [t for t in terms if tok(t) == [t]]
    expect = _sum_of_single_terms(spark, qidx, terms, K)
    qdf = spark.createDataFrame([(0, "mer*")], "query_id long, query_text string")
    got = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in prefix_query_batch(spark, qidx, qdf, k=K).collect()
    )
    assert got == expect


def test_expansion_cache_and_scan_paths_agree(spark, qidx, tmp_path):
    import shutil

    from flatnav_spark.index_io import load_index

    pairs = [(0, "impor* merge"), (1, "de*"), (2, "zzqqabsent*")]
    cold = expand_query_patterns(spark, qidx, pairs)
    cp = str(tmp_path / "idxcopy")
    shutil.copytree(qidx.path, cp)
    warm_idx = load_index(cp)
    warm_idx.preload_term_stats(spark)
    warm = expand_query_patterns(spark, warm_idx, pairs)
    key = lambda rs: sorted(
        (r["query_id"], r["term"], int(r["df"])) for r in rs)
    assert key(cold) == key(warm)
    assert not any(r["query_id"] == 2 for r in cold)  # absent prefix


def test_overlapping_pattern_and_literal_dedup(spark, qidx):
    # 'import' matches both the literal and the pattern: one qt_row only
    rows = expand_query_patterns(spark, qidx, [(0, "import impor*")])
    terms = [r["term"] for r in rows]
    assert len(terms) == len(set(terms))
    assert "import" in terms


def test_max_expansions_keeps_highest_df(spark, qidx):
    full = expand_query_patterns(spark, qidx, [(0, "de*")])
    assert len(full) > 2
    capped = expand_query_patterns(spark, qidx, [(0, "de*")],
                                   max_expansions=2)
    assert len(capped) == 2
    top2 = sorted(full, key=lambda r: (-r["df"], r["term"]))[:2]
    assert {r["term"] for r in capped} == {r["term"] for r in top2}


def test_bare_star_refused(spark, qidx):
    with pytest.raises(ValueError, match="vocabulary"):
        expand_query_patterns(spark, qidx, [(0, "merge *")])


def test_lev_within_matches_brute_dp():
    from flatnav_spark.query import _lev_within

    def brute(a, b):
        dp = [[i + j if i * j == 0 else 0 for j in range(len(b) + 1)]
              for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                               dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return dp[-1][-1]

    words = ["table", "tble", "tables", "cable", "merge", "mergi", "",
             "a", "ab", "window", "wndow", "custmer", "customer"]
    for a in words:
        for b in words:
            for n in (0, 1, 2):
                assert _lev_within(a, b, n) == (brute(a, b) <= n), (a, b, n)


def test_fuzzy_expansion_cache_and_scan_paths_agree(spark, qidx, tmp_path):
    import shutil

    from flatnav_spark.index_io import load_index

    pairs = [(0, "mergi~1"), (1, "impor~2 def"), (2, "zzqqabsent~1")]
    cold = expand_query_patterns(spark, qidx, pairs)
    cp = str(tmp_path / "idxcopyf")
    shutil.copytree(qidx.path, cp)
    warm_idx = load_index(cp)
    warm_idx.preload_term_stats(spark)
    warm = expand_query_patterns(spark, warm_idx, pairs)
    key = lambda rs: sorted(
        (r["query_id"], r["term"], int(r["df"])) for r in rs)
    assert key(cold) == key(warm)
    assert any(r["query_id"] == 0 and r["term"] == "merge" for r in cold)
    assert not any(r["query_id"] == 2 for r in cold)


def test_fuzzy_scores_are_sum_over_expansion(spark, qidx):
    from flatnav_spark.tokenizer import get_tokenizer

    terms = sorted({r["term"] for r in
                    expand_query_patterns(spark, qidx, [(0, "mergi~1")])})
    assert terms  # 'merge' at least
    tok = get_tokenizer(qidx.manifest.tokenizer_mode)
    terms = [t for t in terms if tok(t) == [t]]
    expect = _sum_of_single_terms(spark, qidx, terms, K)
    qdf = spark.createDataFrame([(0, "mergi~1")],
                                "query_id long, query_text string")
    got = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in prefix_query_batch(spark, qidx, qdf, k=K).collect()
    )
    assert got == expect


def test_fuzzy_edge_syntax(spark, qidx):
    with pytest.raises(ValueError, match="bare '~'"):
        expand_query_patterns(spark, qidx, [(0, "~1")])
    with pytest.raises(ValueError, match="max 2"):
        expand_query_patterns(spark, qidx, [(0, "merge~3")])
    # ~0 degenerates to the literal term
    a = expand_query_patterns(spark, qidx, [(0, "merge~0")])
    b = expand_query_patterns(spark, qidx, [(0, "merge")])
    key = lambda rs: sorted((r["term"], int(r["df"])) for r in rs)
    assert key(a) == key(b)


def test_plain_query_through_prefix_path_matches_batch_query(spark, qidx):
    qdf = spark.createDataFrame(
        [(0, "def import"), (1, "merge token")],
        "query_id long, query_text string")
    a = sorted(map(tuple, prefix_query_batch(spark, qidx, qdf, k=K).collect()))
    b = sorted(map(tuple, batch_query(spark, qidx, qdf, k=K).collect()))
    assert a == b


def test_fuzzy_matches_rejects_are_lossless():
    # the length-band + character-set pre-DP rejects in _fuzzy_matches
    # must never drop a true match: pin against the reject-free sweep
    # on a deterministic pseudo-random vocabulary that exercises repeats,
    # anagrams (same char set, different order), and length extremes
    import random

    from flatnav_spark.query import _fuzzy_matches, _lev_within

    rng = random.Random(7)
    alphabet = "abcde"
    vocab = {"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
             for _ in range(400)}
    vocab |= {"abc", "cba", "bca", "aabbcc", "ccbbaa", "", "a" * 12}
    vocab = sorted(vocab)
    bases = ["abc", "abcd", "aabb", "edcba", "a", "abcdeabc"]
    fuzzies = [(b, d) for b in bases for d in (0, 1, 2)]

    got = _fuzzy_matches(vocab, fuzzies)
    want = {(b, d): sorted(t for t in vocab if _lev_within(b, t, d))
            for b, d in fuzzies}
    assert got == want
