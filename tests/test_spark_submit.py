"""The north-rule deployment surface: spark-submit --py-files.

Runs a REAL ``spark-submit --py-files flatnav_spark.zip`` build and query
in child JVMs (no repo on the child's sys.path — only the zip), then
checks the submitted query results are rank- and score-identical to the
in-process engine on the same index. Also pins the packaging guarantee:
the --py-files zip is deterministic (byte-identical on repeated builds).

Reference analog: the wheel-per-node deployment in the reference's
python-bindings (``python-bindings/README.md``); here the deployable is
one zip because the engine is pure python.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "flatnav_spark")

_QUERIES = ["mergeIndex token", "def import", "zzqqabsent"]
_K = 5


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.fixture(scope="module")
def submit_env(tmp_path_factory):
    """zip + driver script + tiny corpus + a spark-submit'ed build."""
    exe = _spark_submit()
    if exe is None:
        pytest.skip("spark-submit not available")
    from flatnav_spark.corpus import write_corpus_parquet
    from flatnav_spark.packaging import make_pyfiles_zip, submit_argv

    root = str(tmp_path_factory.mktemp("submit"))
    zp = make_pyfiles_zip(os.path.join(root, "flatnav_spark.zip"))
    driver = os.path.join(root, "driver.py")
    shutil.copyfile(os.path.join(PKG, "__main__.py"), driver)
    corpus = write_corpus_parquet(os.path.join(root, "corpus"), 250)
    idx = os.path.join(root, "idx")

    def run(*cli: str) -> str:
        argv = submit_argv(zp, driver, *cli, master="local[4]")
        argv[0] = exe
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        # the child must resolve flatnav_spark from the ZIP, not the repo
        env.pop("PYTHONPATH", None)
        env.setdefault("SPARK_GRAFT_CPUS", "4")
        proc = subprocess.run(
            argv, cwd=root, env=env, capture_output=True, text=True, timeout=420
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return proc.stdout

    out = run(
        "build", "--corpus", corpus, "--out", idx, "--groups", "2", "--splits", "8"
    )
    info = json.loads(out.strip().splitlines()[-1])
    return {"run": run, "idx": idx, "corpus": corpus, "build_info": info}


def test_submitted_build_info(submit_env):
    info = submit_env["build_info"]
    assert info["n_docs"] == 250
    assert info["n_terms"] > 0 and info["n_postings"] > 0


def test_submitted_query_rank_identical_to_inprocess(submit_env, spark):
    out = submit_env["run"](
        "query", "--index", submit_env["idx"], "--queries", "||".join(_QUERIES),
        "--k", str(_K),
    )
    submitted = [
        json.loads(line) for line in out.strip().splitlines() if line.startswith("{")
    ]
    assert submitted, out

    from flatnav_spark.index_io import load_index
    from flatnav_spark.query import batch_query

    index = load_index(submit_env["idx"])
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(_QUERIES)], "query_id INT, query_text STRING"
    )
    local = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in batch_query(spark, index, qdf, k=_K).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in submitted
    }
    assert got == local  # rank- and score-identical across deployment surfaces


def test_pyfiles_zip_deterministic(tmp_path):
    from flatnav_spark.packaging import make_pyfiles_zip

    a = make_pyfiles_zip(str(tmp_path / "a.zip"))
    b = make_pyfiles_zip(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
