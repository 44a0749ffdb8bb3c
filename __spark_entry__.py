"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build a real inverted index over the sf0.001
documents corpus (temp dir) and answer the fixture BM25 query set top-k.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2.6 plus the training-pipeline ops (dedup, minhash, similarity
search, text quality); oracles are DuckDB-runnable ANSI SQL over the same
parquet tables. See flatnav_spark/checklist.py for conventions that keep
the cross-engine value-hash deterministic (rounding, casts, tie-breaks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flatnav_spark.checklist import _BM25_QUERIES, _engine_index_for
    from flatnav_spark.query import batch_query

    sf_dir = "/root/testdata/sf0.001"
    idx = _engine_index_for(spark, sf_dir)
    qrows = [(qid, " ".join(terms)) for qid, terms in _BM25_QUERIES]
    qdf = spark.createDataFrame(qrows, "query_id long, query_text string")
    return batch_query(spark, idx, qdf, k=10, prune=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flatnav_spark.checklist import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each key in ``queries()``."""
    from flatnav_spark.checklist import build_oracles

    return build_oracles()
