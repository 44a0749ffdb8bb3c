"""S2: .bvecs/.ivecs/.fvecs chunk-planned readers vs a numpy reference parse
(reference read_bvecs_file/read_ivecs_file, experiments/data_loader.py:7-47)."""

import numpy as np
import pytest

from flatnav_spark.vecio import read_vecs, vecs_as_float, write_vecs


def _numpy_parse(path, comp_dtype, comp_bytes):
    raw = np.fromfile(path, dtype=np.uint8)
    d = int(raw[:4].view("<i4")[0])
    rec = 4 + d * comp_bytes
    arr = raw.reshape(-1, rec)
    return arr[:, 4:].copy().view(comp_dtype)


@pytest.mark.parametrize("ext,comp_dtype,comp_bytes", [
    ("bvecs", np.uint8, 1),
    ("ivecs", np.int32, 4),
    ("fvecs", np.float32, 4),
])
def test_roundtrip_matches_numpy(spark, tmp_path, ext, comp_dtype, comp_bytes):
    rng = np.random.default_rng(7)
    if ext == "bvecs":
        mat = rng.integers(0, 256, size=(1000, 24)).astype(np.uint8)
    elif ext == "ivecs":
        mat = rng.integers(-1000, 1000, size=(1000, 24)).astype(np.int32)
    else:
        mat = rng.standard_normal((1000, 24)).astype(np.float32)
    path = str(tmp_path / f"v.{ext}")
    assert write_vecs(mat, path) == 1000

    # chunk_records=256 forces 4 chunks -> multi-task strided reads
    rows = read_vecs(spark, path, chunk_records=256).orderBy("vec_id").collect()
    assert [r.vec_id for r in rows] == list(range(1000))
    got = np.array([r.embedding for r in rows])
    want = _numpy_parse(path, comp_dtype, comp_bytes)
    assert got.shape == want.shape
    assert np.array_equal(got.astype(want.dtype), want)


def test_multi_file_stable_global_ids(spark, tmp_path):
    rng = np.random.default_rng(11)
    a = rng.standard_normal((300, 8)).astype(np.float32)
    b = rng.standard_normal((200, 8)).astype(np.float32)
    write_vecs(a, str(tmp_path / "a.fvecs"))
    write_vecs(b, str(tmp_path / "b.fvecs"))

    df = read_vecs(spark, str(tmp_path), chunk_records=128, pattern="*.fvecs")
    rows = df.orderBy("vec_id").collect()
    assert len(rows) == 500
    # files sorted by path: a.fvecs ids 0..299, b.fvecs ids 300..499 —
    # invariant under chunking (re-read with a different chunk size)
    got = np.array([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, np.vstack([a, b]))
    rows2 = read_vecs(spark, str(tmp_path), chunk_records=97).orderBy("vec_id").collect()
    got2 = np.array([r.embedding for r in rows2], dtype=np.float32)
    assert np.array_equal(got2, got)


def test_vecs_as_float_feeds_simsearch(spark, tmp_path):
    from flatnav_spark.simsearch import cosine_topk

    rng = np.random.default_rng(3)
    mat = rng.integers(0, 256, size=(64, 16)).astype(np.uint8)
    path = str(tmp_path / "v.bvecs")
    write_vecs(mat, path)
    emb = vecs_as_float(read_vecs(spark, path))
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    q = emb.filter("vec_id < 2").selectExpr("vec_id as qid", "embedding as qe")
    top = cosine_topk(emb, q, k=3).collect()
    # a vector's own nearest neighbour is itself (cos = 1.0)
    self_hits = {r.qid: r.vec_id for r in top if r.rank == 1}
    assert self_hits == {0: 0, 1: 1}


def test_corrupt_and_mixed_dim_raise(spark, tmp_path):
    mat = np.arange(48, dtype=np.float32).reshape(4, 12)
    path = str(tmp_path / "v.fvecs")
    write_vecs(mat, path)
    with open(path, "ab") as f:
        f.write(b"\x00\x01\x02")  # truncated trailing record
    with pytest.raises(ValueError, match="not a multiple"):
        read_vecs(spark, path).count()

    # mixed dims whose sizes still divide evenly: the per-record header check fires
    p2 = str(tmp_path / "m.fvecs")
    with open(p2, "wb") as f:
        f.write(np.array([2], dtype="<i4").tobytes() + np.zeros(2, dtype="<f4").tobytes())
        f.write(np.array([3], dtype="<i4").tobytes() + np.zeros(2, dtype="<f4").tobytes())
    with pytest.raises(Exception, match="mixed-dimension|header"):
        read_vecs(spark, p2).count()
