"""Zero-job exact range partitioning for dense integer keys.

``repartitionByRange`` costs a full sampling pass over its CHILD plan —
the range partitioner runs a reservoir-sample job to pick boundaries. On
the query hot path the child is (postings scan -> term filter), so the
sampling job re-reads and re-filters the postings before the real
exchange does: the whole input is scanned twice per query batch. That is
tolerable for one-off builds, and a measurable fixed tax per query pass
(the round-4 qps regression vs round 2 on the documents corpus).

For the query path we know more than the generic range partitioner does:
chunk ids are DENSE integers in [0, n_chunks) (chunk_id = doc_id //
chunk_span, doc ids are dense by construction — build.py B3). So exact,
contiguous, count-balanced ranges need no sampling at all:

    pid = key * P // n_keys            (contiguous ranges, sizes +/- 1)

The only obstacle is that Spark's DataFrame API exposes hash
partitioning, not partition-by-expression-value: ``repartition(P, col)``
routes by ``pmod(murmur3(col), P)``, and hashing the P distinct pid
values collides (~37% of buckets empty, some tasks 2-3x the work —
exactly the imbalance repartitionByRange was brought in to fix).

The trick: route through a TOKEN column instead. Driver-side, find P
long values t_0..t_{P-1} such that ``pmod(murmur3_long(t_i), P) == i``
(coupon-collector search over 0,1,2,...; murmur3 reimplemented below
bit-for-bit against Spark's ``F.hash`` and unit-tested against it). Then
``repartition(P, element_at(tokens, pid+1))`` IS an exact manual range
partitioner: every pid lands alone in its own bucket, zero extra jobs,
deterministic at any parallelism.

At very large n_keys (cluster scale: millions of chunks onto thousands
of tasks) plain hash partitioning on the key is already balanced by the
law of large numbers, so the helper falls back to it — the token array
stays small in every regime where it is used.
"""

from __future__ import annotations

from typing import Dict, List

_MASK32 = 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = ((k1 << 15) | (k1 >> 17)) & _MASK32
    return (k1 * 0x1B873593) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _MASK32
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of a LongType value (seed 42) — the hash
    behind ``F.hash(longCol)`` and DataFrame hash partitioning: the two
    32-bit halves mixed low-then-high, finalized with length 8. Verified
    against ``F.hash`` in tests/test_partitioning.py."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _MASK32, _mix_k1(v & _MASK32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK32))
    h1 = _fmix(h1, 8)
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


_TOKEN_CACHE: Dict[int, List[int]] = {}

# above this ratio of keys to partitions, plain hash partitioning is
# balanced by the law of large numbers (expected max/mean load -> 1) and
# the token array is not worth materializing in the plan
HASH_FALLBACK_KEYS_PER_PART = 64


def bucket_tokens(p: int) -> List[int]:
    """tokens[i] = smallest non-negative long whose Spark hash lands in
    partition i of p. Coupon-collector search, ~p*ln(p) murmur3 calls,
    cached per p (sub-second up to p ~ 10^4; larger p uses hash
    fallback)."""
    if p not in _TOKEN_CACHE:
        found: Dict[int, int] = {}
        v = 0
        while len(found) < p:
            b = murmur3_long(v) % p  # pmod: murmur3 may be negative
            if b not in found:
                found[b] = v
            v += 1
        _TOKEN_CACHE[p] = [found[i] for i in range(p)]
    return _TOKEN_CACHE[p]


def repartition_dense_range(df, col: str, n_keys: int, num_partitions: int):
    """Exact contiguous-range repartition of ``df`` on a dense integer
    key column in [0, n_keys): task t receives keys [t*n_keys/P,
    (t+1)*n_keys/P) — the same layout repartitionByRange(P, col) would
    produce, with ZERO extra jobs and deterministic boundaries at any
    parallelism. Keys >= n_keys (a stale upper bound) clamp into the last
    range rather than erroring."""
    from pyspark.sql import functions as F

    p = max(1, min(num_partitions, n_keys))
    if p == 1:
        return df.coalesce(1) if df.rdd.getNumPartitions() > 1 else df
    if n_keys >= HASH_FALLBACK_KEYS_PER_PART * p:
        # many keys per task: hash is balanced, no token table needed
        return df.repartition(p, col)
    toks = bucket_tokens(p)
    pid = F.least(
        F.expr(f"CAST(({col} * {p}) DIV {n_keys} AS INT)"), F.lit(p - 1)
    )
    tok = F.element_at(
        F.array(*[F.lit(t).cast("long") for t in toks]), pid + F.lit(1)
    )
    return df.withColumn("_range_tok", tok).repartition(p, "_range_tok").drop(
        "_range_tok"
    )
