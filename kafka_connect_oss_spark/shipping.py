"""Ship this package to executor Python workers.

Pandas-UDF closures reference functions in this package; pickled by
reference, they need ``import kafka_connect_oss_spark`` to succeed on every
executor. On a real cluster that is done with ``spark-submit --py-files``;
``ensure_package_on_executors`` is the programmatic equivalent — zip the
package once per process and ``addPyFile`` it once per SparkContext — so any
caller-provided session (driver harness, bench, tests) works unchanged, in
local mode and on a 1000-executor cluster alike.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SENT_TO: set[str] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str:
    """Zip the installed package (once per process) with the package dir at
    the archive root, the layout ``--py-files`` expects."""
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(tempfile.gettempdir(),
                        f"kafka_connect_oss_spark-{os.getpid()}.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join("kafka_connect_oss_spark",
                                   os.path.relpath(full, pkg_root))
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if sc.applicationId in _SENT_TO:
        return
    sc.addPyFile(_build_zip())
    _SENT_TO.add(sc.applicationId)
