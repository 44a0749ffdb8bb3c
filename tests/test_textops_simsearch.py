"""Unit tests for the training-pipeline operators: dedup, MinHash/LSH,
SimHash, language-ID, quality scoring, and similarity search (exact +
LSH-bucketed ANN with measured recall — the recall@k axis of the
reference's harness, metrics.py:53-66)."""

import pytest
from pyspark.sql import functions as F

from flatnav_spark import simsearch, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog"),     # near dup
        (3, "import numpy def main return class static void"),  # code-ish
        (4, "el gato y la casa de la madre es un perro en"),     # spanish-ish
        (5, "zzz completely different tokens here nothing shared"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = textops.exact_dedup(docs).collect()
    assert len(out) == 1
    assert out[0].n_dups == 2 and out[0].keeper == 0


def test_jaccard_pairs(spark, docs):
    pairs = {(r.d1, r.d2): r.jaccard for r in textops.jaccard_pairs(docs, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0            # identical docs
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert all(5 not in p for p in pairs)  # disjoint doc never pairs


def test_minhash_identical_docs_same_signature(spark, docs):
    sigs = {r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
            for r in textops.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[5]


def test_lsh_candidates_cover_near_dups(spark, docs):
    cands = {(r.d1, r.d2) for r in textops.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in cands  # identical docs always collide


def test_simhash_duplicates_equal_and_distinct_differ(spark, docs):
    fp = {r.doc_id: r.simhash for r in textops.simhash(docs).collect()}
    assert fp[0] == fp[1]
    assert 0 <= fp[0] < (1 << textops.SIMHASH_BITS)
    # the compatibility alias defaults to SIMHASH_BITS (same as every
    # historical caller got); an explicit n_bits=16 gives the narrow form
    fp_alias = {r.doc_id: r.simhash for r in textops.simhash16(docs).collect()}
    assert fp_alias == fp
    fp16 = {r.doc_id: r.simhash for r in textops.simhash16(docs, n_bits=16).collect()}
    assert all(0 <= v < (1 << 16) for v in fp16.values())
    # hamming distance of near-dup < distance of unrelated doc
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[0], fp[2]) <= ham(fp[0], fp[5])


def test_minhash_band_params():
    # 64 hashes at target j=0.8 -> 8 bands of 8 rows: threshold (1/8)^(1/8) ~ 0.77
    assert textops.minhash_band_params(64, 0.8) == (8, 8)
    for n, t in ((128, 0.5), (64, 0.9), (16, 0.3)):
        b, r = textops.minhash_band_params(n, t)
        assert b * r == n


def test_minhash_lsh_pairs64(spark, docs):
    cands = {(r.d1, r.d2) for r in textops.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in cands                 # identical docs agree on every band
    assert all(5 not in p for p in cands)  # token-disjoint doc never pairs


def test_language_id_wide_profiles(spark):
    """Every profile (round-3 VERDICT #8: 12, beyond the 3 demo ones) is
    exercised: a doc made of exactly a profile's stopwords scores 1.0 on it
    and strictly less on every other (no list contains another)."""
    rows = [(i, " ".join(words))
            for i, (name, words) in enumerate(sorted(textops.LANG_PROFILES.items()))]
    names = [name for name, _ in sorted(textops.LANG_PROFILES.items())]
    assert len(names) >= 12
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pred = {r.doc_id: (r.lang_pred, r.lang_score)
            for r in textops.language_id(docs).collect()}
    for i, name in enumerate(names):
        assert pred[i] == (name, 1.0), f"{name}: {pred[i]}"


def test_language_id(spark, docs):
    pred = {r.doc_id: r.lang_pred for r in textops.language_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[3] == "code"
    assert pred[4] == "es"


def test_quality_scores(spark, docs):
    q = {r.doc_id: r for r in textops.quality_scores(docs).collect()}
    assert q[0].n_tokens == 9
    assert q[0].stopword_ratio > q[5].stopword_ratio


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_cosine_topk_self_is_rank1(spark, embeddings):
    q = embeddings.filter("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    top = simsearch.cosine_topk(embeddings, q, k=3).collect()
    rank1 = {r.qid: (r.vec_id, r.cos) for r in top if r.rank == 1}
    for qid, (vec_id, cos) in rank1.items():
        assert vec_id == qid and cos == 1.0


def test_lsh_ann_recall(spark, embeddings):
    """LSH candidates must recover most of the exact top-k (recall@5)."""
    q = embeddings.filter("vec_id < 10").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = simsearch.cosine_topk(embeddings, q, k=5).collect()
    approx = simsearch.lsh_cosine_topk(embeddings, q, k=5, n_planes=8, n_bands=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.qid, set()).add(r.vec_id)
    hits = sum(len(exact_sets[q_] & approx_sets.get(q_, set())) for q_ in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.5, f"LSH recall@5 too low: {recall}"
    # approximate scores, where returned, are the EXACT cosine (re-scored)
    exact_scores = {(r.qid, r.vec_id): r.cos for r in exact}
    for r in approx:
        if (r.qid, r.vec_id) in exact_scores:
            assert r.cos == exact_scores[(r.qid, r.vec_id)]


def test_lsh_self_always_found(spark, embeddings):
    q = embeddings.filter("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    top = simsearch.lsh_cosine_topk(embeddings, q, k=3).collect()
    rank1 = {r.qid: r.vec_id for r in top if r.rank == 1}
    for qid, vec_id in rank1.items():
        assert vec_id == qid  # a vector always collides with itself


def test_kmeans_fit_deterministic_and_partitions(spark, embeddings):
    """C3: Lloyd's k-means — deterministic across reruns, centroids move off
    their init, every cluster id in range."""
    import numpy as np

    c1 = simsearch.kmeans_fit(embeddings, n_clusters=8, n_iters=2)
    c2 = simsearch.kmeans_fit(embeddings, n_clusters=8, n_iters=2)
    assert c1.shape == (8, 64)
    assert np.array_equal(c1, c2)
    init = np.round(np.array(
        [r.embedding for r in embeddings.orderBy("vec_id").limit(8).collect()],
        dtype=np.float64), 6)
    assert not np.array_equal(c1, init)  # the update actually ran


def test_ivf_self_found_and_scores_exact(spark, embeddings):
    q = embeddings.filter("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    top = simsearch.ivf_topk(embeddings, q, k=3, n_clusters=8, nprobe=3).collect()
    rank1 = {r.qid: (r.vec_id, r.cos) for r in top if r.rank == 1}
    for qid, (vec_id, cos) in rank1.items():
        # a query's own cluster is always its nearest -> self is probed
        assert vec_id == qid and cos == 1.0
    # IVF scores, where returned, are the EXACT re-scored cosine
    exact = {(r.qid, r.vec_id): r.cos
             for r in simsearch.cosine_topk(embeddings, q, k=3).collect()}
    for r in top:
        if (r.qid, r.vec_id) in exact:
            assert r.cos == exact[(r.qid, r.vec_id)]


def test_ivf_recall_improves_with_nprobe(spark, embeddings):
    q = embeddings.filter("vec_id < 10").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact_sets = {}
    for r in simsearch.cosine_topk(embeddings, q, k=5).collect():
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    cents = simsearch.kmeans_fit(embeddings, n_clusters=8, n_iters=2)

    def recall(nprobe):
        approx = simsearch.ivf_topk(embeddings, q, k=5, nprobe=nprobe,
                                    centroids=cents).collect()
        got = {}
        for r in approx:
            got.setdefault(r.qid, set()).add(r.vec_id)
        hits = sum(len(exact_sets[k_] & got.get(k_, set())) for k_ in exact_sets)
        return hits / sum(len(s) for s in exact_sets.values())

    r1, r8 = recall(1), recall(8)
    assert r8 == 1.0        # probing every cluster IS exact search
    assert r1 <= r8
    assert r1 >= 0.2        # the home cluster alone finds a real share


def test_embedding_near_dup_pairs(spark, embeddings):
    """Near-dup pairs: subset of the true >=threshold pair set, exact
    rounded cosines, a<b canonical order, no duplicates."""
    got = simsearch.embedding_near_dup_pairs(
        embeddings, threshold=0.4, n_planes=32, n_bands=8).collect()
    assert len(got) > 0
    keys = [(r.a, r.b) for r in got]
    assert len(keys) == len(set(keys))
    exact = {}
    e = {r.vec_id: r.embedding for r in embeddings.collect()}
    import numpy as np
    for (a, b) in keys:
        va, vb = np.array(e[a], dtype=np.float64), np.array(e[b], dtype=np.float64)
        exact[(a, b)] = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4)
    for r in got:
        assert r.a < r.b
        assert abs(r.cos - exact[(r.a, r.b)]) < 1e-9
        assert r.cos >= 0.4
