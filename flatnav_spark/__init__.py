"""flatnav_spark — a PySpark-native inverted-index + BM25 top-k engine.

Role-graft of BlaiseMuhirwa/flatnav (C++ ANN graph index; see
/root/reference/include/flatnav/index/Index.h) re-expressed in the
full-text-retrieval domain native to Spark's shuffle/aggregate model:

- ``build_index``  — the ``Index::addBatch`` analog (Index.h:300-329):
  tokenize → posting construction → term-keyed merge → block-max segments.
- ``batch_query``  — the batched ``search`` analog (bindings.cpp:161-228):
  rank-identical BM25 top-k with deterministic tie-breaking.
- ``save/load``    — the cereal serialization analog (Index.h:442-490):
  parquet tables + JSON manifest with a bit-identical-results contract.

Everything is DataFrame + Arrow-vectorized pandas UDFs; no per-row Python
UDFs, no RDDs.
"""

from flatnav_spark.build import build_index
from flatnav_spark.index_io import IndexManifest, load_index
from flatnav_spark.query import batch_query
from flatnav_spark.scorer import BM25Params

__all__ = [
    "build_index",
    "batch_query",
    "load_index",
    "IndexManifest",
    "BM25Params",
]

__version__ = "0.1.0"
