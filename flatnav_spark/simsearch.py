"""Similarity search over an embedding column (array<float>) — the direct
domain cousin of flatnav's ANN queries (Index.h:387-409), kept exact where
the corpus allows and LSH-bucketed as the scale path.

- ``cosine_topk``: brute-force exact cosine top-k, the baseline/oracle
  (flatnav's ground-truth generation role, experiments/README.md:205-211).
  Pure Spark SQL higher-order functions (zip_with + aggregate fold) —
  JVM-side, deterministic summation order (sequential fold), no UDF.
- ``lsh_cosine_topk``: random-hyperplane LSH buckets (signature = sign
  bits of dot products with deterministic seeded planes), candidates =
  bucket collisions (multi-probe over bands), exact cosine re-scoring on
  candidates only. Approximate: recall measured in tests, the
  recall@k-vs-QPS tradeoff axis of the reference's harness.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

_SEED = 42


def _dot(a, b):
    """Exact float64 dot product as a sequential SQL fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qe",
) -> DataFrame:
    """Exact cosine top-k: (qid, rank, vec_id, cos). Ranks on the ROUNDED
    score with vec_id tie-break (cross-engine deterministic). The query
    side is broadcast — the shared-read-only-index pattern of flatnav's
    batched search (bindings.cpp:196-212)."""
    q = F.broadcast(queries.select(F.col(q_id_col).alias("qid"), F.col(q_vec_col).alias("qe")))
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    dots = q.crossJoin(e).select(
        "qid",
        "vec_id",
        F.round(_dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").cast("long").alias("qid"), "rank", F.col("vec_id").cast("long").alias("vec_id"), "cos")
    )


def _planes(dim: int, n_planes: int, seed: int = _SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _signature_col(vec_col, planes: np.ndarray):
    """Bit-signature column: for each hyperplane, 1 if dot(vec, plane) >= 0."""
    bits = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "qe",
    dim: Optional[int] = None,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket join then exact
    re-scoring of candidates. ``n_planes`` bits are split into ``n_bands``
    bands; a candidate matches if ANY band agrees (multi-band OR-probing:
    higher recall, more candidates). Returns (qid, rank, vec_id, cos) like
    cosine_topk — identical schema so recall can be joined/measured.

    Scale path: the bucket join shuffles only band keys; exact scoring
    touches candidates, not the full corpus."""
    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    planes = _planes(dim, n_planes)
    bits_per_band = n_planes // n_bands

    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    q = queries.select(F.col(q_id_col).alias("qid"), F.col(q_vec_col).alias("qe"))

    e = e.withColumn("sig", _signature_col(F.col("emb"), planes))
    q = q.withColumn("sig", _signature_col(F.col("qe"), planes))

    mask = (1 << bits_per_band) - 1
    e_bands, q_bands = None, None
    for b in range(n_bands):
        band_val = F.shiftright(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
        eb = e.select("vec_id", "emb", F.concat(F.lit(f"{b}:"), band_val.cast("string")).alias("band"))
        qb = q.select("qid", "qe", F.concat(F.lit(f"{b}:"), band_val.cast("string")).alias("band"))
        e_bands = eb if e_bands is None else e_bands.unionByName(eb)
        q_bands = qb if q_bands is None else q_bands.unionByName(qb)

    cand = (
        q_bands.join(e_bands, "band")
        .select("qid", "qe", "vec_id", "emb")
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = cand.select(
        "qid",
        "vec_id",
        F.round(_dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").cast("long").alias("qid"), "rank", F.col("vec_id").cast("long").alias("vec_id"), "cos")
    )
