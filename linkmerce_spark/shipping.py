"""Ship the package to executor Python workers.

Driver code can run with ``sys.path`` patched (the harness inserts the
repo dir), but executor Python workers inherit only PYTHONPATH/cwd —
a cloudpickled kernel that references a module global then dies with
ModuleNotFoundError on the worker. ``ensure_shipped`` zips the package
once per SparkContext and ``addPyFile``s it, making every
``linkmerce_spark`` symbol importable in workers regardless of how the
driver found the package. Call it at the top of any operator that runs
Python on executors (pandas UDF / mapInPandas / applyInPandas*).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

__all__ = ["ensure_shipped"]


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if sc._jsc is None or getattr(sc, "_linkmerce_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, path = tempfile.mkstemp(prefix="linkmerce_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith((".py", ".sql")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(path)
    sc._linkmerce_spark_shipped = True
