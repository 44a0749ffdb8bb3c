"""SIFT/TEXMEX dense-vector file sources: ``.bvecs`` / ``.ivecs`` / ``.fvecs``.

Closes SURVEY §2 S2 (reference ``read_bvecs_file`` / ``read_ivecs_file``,
experiments/data_loader.py:7-47): the reference np.memmap's a local file and
slices records with a header-aware stride. The Spark-native shape replaces
memmap with a *chunk plan*: the driver touches only file metadata (size + the
4-byte dim header), builds a small DataFrame of (file, first_record, n_records,
id_base) chunk rows, and ``mapInPandas`` workers each seek+read their own byte
range — parallel strided reads, no driver I/O, no single-node bottleneck. At
100 TB the same plan fans a multi-file dataset across every executor; the
chunk size bounds per-task memory exactly like parquet's maxPartitionBytes.

File format (public TEXMEX spec): every record is a little-endian int32
dimension ``d`` followed by ``d`` components —
  .bvecs  uint8 components   (record 4 + d bytes)
  .ivecs  int32 components   (record 4 + 4d bytes)
  .fvecs  float32 components (record 4 + 4d bytes)
``d`` must be constant within a file; each chunk re-checks every record's
header and raises on corruption (the reference's implicit stride assumption,
made explicit).

vec_ids are globally stable: files sorted by path, id = cumulative record
count before this file + record index — invariant under chunking and
parallelism, so re-scans are reproducible (the sha-invariant discipline of
the corpus scan applied to dense inputs).
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

_FMT = {
    # ext -> (numpy component dtype, bytes per component, spark component type)
    "bvecs": (np.uint8, 1, "smallint"),
    "ivecs": (np.int32, 4, "int"),
    "fvecs": (np.float32, 4, "float"),
}

DEFAULT_CHUNK_RECORDS = 65536


def _file_meta(path: str) -> Tuple[int, int, int]:
    """(dim, record_bytes, n_records) from file size + the first header only."""
    ext = path.rsplit(".", 1)[-1]
    if ext not in _FMT:
        raise ValueError(f"unsupported vector file extension: {path}")
    _, comp_bytes, _ = _FMT[ext]
    size = os.path.getsize(path)
    if size == 0:
        return 0, 0, 0
    with open(path, "rb") as f:
        (dim,) = struct.unpack("<i", f.read(4))
    if dim <= 0:
        raise ValueError(f"{path}: bad leading dimension header {dim}")
    record_bytes = 4 + dim * comp_bytes
    if size % record_bytes:
        raise ValueError(
            f"{path}: size {size} not a multiple of record size {record_bytes} "
            f"(dim {dim}) — truncated or mixed-dimension file"
        )
    return dim, record_bytes, size // record_bytes


def _resolve_files(path: str, pattern: str) -> List[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, pattern)))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no vector files match {path!r} ({pattern!r})")
    return files


def read_vecs(
    spark,
    path: str,
    chunk_records: int = DEFAULT_CHUNK_RECORDS,
    pattern: str = "*.?vecs",
    expect_dim: Optional[int] = None,
):
    """Read .bvecs/.ivecs/.fvecs file(s) into (vec_id long, embedding array).

    ``path`` may be a file, a glob, or a directory (``pattern`` selects files).
    All files must share extension and dimension. ``chunk_records`` bounds
    per-task memory (65536 × (4+128) B ≈ 8.6 MB for SIFT1B .bvecs records).
    """
    from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)
    from pyspark.sql import types as T

    files = _resolve_files(path, pattern)
    ext = files[0].rsplit(".", 1)[-1]
    if any(f.rsplit(".", 1)[-1] != ext for f in files):
        raise ValueError(f"mixed vector extensions under {path!r}")
    comp_dtype, comp_bytes, comp_spark = _FMT[ext]

    # Driver-side: metadata only (getsize + one 4-byte read per file).
    chunks = []  # (file, dim, first_record, n_records, id_base)
    id_base = 0
    dim0 = expect_dim
    for f in files:
        dim, _rec, n_rec = _file_meta(f)
        if n_rec == 0:
            continue
        if dim0 is None:
            dim0 = dim
        elif dim != dim0:
            raise ValueError(f"{f}: dim {dim} != expected {dim0}")
        for first in range(0, n_rec, chunk_records):
            n = min(chunk_records, n_rec - first)
            chunks.append((f, dim, first, n, id_base + first))
        id_base += n_rec
    if not chunks:
        raise ValueError(f"no vector records under {path!r}")

    plan_schema = T.StructType([
        T.StructField("file", T.StringType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("first_record", T.LongType(), False),
        T.StructField("n_records", T.IntegerType(), False),
        T.StructField("id_base", T.LongType(), False),
    ])
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(getattr(T, {
            "smallint": "ShortType", "int": "IntegerType", "float": "FloatType",
        }[comp_spark])(), False), False),
    ])
    # one chunk per task: each worker seeks to its own byte range
    plan = spark.createDataFrame(chunks, schema=plan_schema).repartition(len(chunks))

    def read_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                dim = int(row.dim)
                rec_bytes = 4 + dim * comp_bytes
                with open(row.file, "rb") as fh:
                    fh.seek(int(row.first_record) * rec_bytes)
                    raw = fh.read(int(row.n_records) * rec_bytes)
                if len(raw) != int(row.n_records) * rec_bytes:
                    raise IOError(f"{row.file}: short read at record {row.first_record}")
                arr = np.frombuffer(raw, dtype=np.uint8).reshape(int(row.n_records), rec_bytes)
                dims = arr[:, :4].copy().view("<i4").ravel()
                if not (dims == dim).all():
                    bad = int(np.argmin(dims == dim))
                    raise ValueError(
                        f"{row.file}: record {int(row.first_record) + bad} header "
                        f"{int(dims[bad])} != dim {dim} — mixed-dimension file"
                    )
                comps = arr[:, 4:].copy().view(comp_dtype)
                ids = np.arange(int(row.id_base), int(row.id_base) + int(row.n_records), dtype=np.int64)
                yield pd.DataFrame({"vec_id": ids, "embedding": list(comps)})

    return plan.mapInPandas(read_chunks, schema=out_schema)


def vecs_as_float(df):
    """Cast any vecio output to (vec_id, embedding array<float>) — the schema
    simsearch.cosine_topk / lsh_cosine_topk / ivf_topk consume."""
    from pyspark.sql import functions as F

    return df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("float")).alias("embedding")
    )


def write_vecs(ids_and_vecs: np.ndarray, path: str) -> int:
    """Write a (n, d) numpy matrix in the TEXMEX format implied by the file
    extension. Test-fixture helper (driver-side, small data by design);
    returns number of records written."""
    ext = path.rsplit(".", 1)[-1]
    comp_dtype, _, _ = _FMT[ext]
    mat = np.asarray(ids_and_vecs)
    n, d = mat.shape
    with open(path, "wb") as f:
        header = np.full(1, d, dtype="<i4")
        for row in mat:
            f.write(header.tobytes())
            f.write(np.ascontiguousarray(row, dtype=comp_dtype).tobytes())
    return n
