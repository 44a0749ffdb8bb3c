"""spark-submit packaging — build the ``--py-files`` artifact.

The north-rule deployment surface is ``spark-submit --py-files
flatnav_spark.zip`` on a multi-executor cluster (the analog of shipping
the reference's wheel to every node, ``setup.py`` /
``python-bindings/README.md`` in the reference repo).  The engine is a
pure-python package, so the whole deployable is one zip of its ``.py``
files; executors unpack it onto ``sys.path`` and the driver script can be
the package's own ``__main__.py``.

The zip is DETERMINISTIC (sorted entries, fixed timestamp, stored
per-file metadata stripped) so repeated packaging of the same tree is
byte-identical — ship-by-content-hash and cluster-side caching both rely
on that.

Exercised end-to-end by ``tests/test_spark_submit.py``, which runs a real
``spark-submit --py-files`` build + query in child JVMs and checks the
results are rank-identical to the in-process engine.
"""

from __future__ import annotations

import os
import zipfile

# fixed timestamp for deterministic zips (zip format has no "no timestamp")
_EPOCH = (2020, 1, 1, 0, 0, 0)


def make_pyfiles_zip(out_path: str, package_dir: str | None = None) -> str:
    """Write ``flatnav_spark.zip`` suitable for ``spark-submit --py-files``.

    Includes every ``.py`` under the package, keyed relative to the
    package *parent* (so the archive root contains ``flatnav_spark/``),
    sorted, with a fixed timestamp — byte-identical for identical trees.
    Returns ``out_path``.
    """
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(package_dir)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(package_dir):
        dirnames.sort()
        if "__pycache__" in dirnames:
            dirnames.remove("__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                members.append(os.path.join(dirpath, f))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        for path in sorted(members):
            info = zipfile.ZipInfo(
                os.path.relpath(path, parent).replace(os.sep, "/"), date_time=_EPOCH
            )
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


def submit_argv(
    pyfiles_zip: str,
    driver_script: str,
    *cli_args: str,
    master: str | None = None,
) -> list[str]:
    """argv for a ``spark-submit --py-files`` run of the engine CLI.

    ``driver_script`` is typically a copy of the package's
    ``__main__.py`` (spark-submit takes a script path, and submitting a
    file named ``__main__.py`` from inside the zip is not portable).  On
    a real cluster omit ``master`` and let spark-defaults supply it.
    """
    argv = ["spark-submit"]
    if master:
        argv += ["--master", master]
    argv += ["--py-files", pyfiles_zip, driver_script, *cli_args]
    return argv
