"""Ship this package to Python workers (the ``--py-files`` pattern).

The driver owns the SparkSession and may have launched the JVM from a
working directory where ``hadoop_trans_spark`` is NOT importable. Driver
-side that is handled by ``sys.path`` inserts — but cloudpickle
serializes module-level functions referenced from worker closures BY
REFERENCE (``module.qualname``), so the *Python workers* must be able to
import the package too or every such closure dies with
ModuleNotFoundError at task time. ``spark-submit --py-files`` is the
canonical production answer; :func:`ship_package` is its runtime
equivalent — zip the package, ``sc.addPyFile`` it, workers prepend it to
``sys.path``.

The zip name is keyed by content hash: re-adding the identical path is a
no-op for Spark, while a changed package yields a fresh name (Spark
refuses to re-add the SAME name with DIFFERENT contents)."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()  # applicationIds already handled


def ship_package(spark: SparkSession) -> None:
    """Zip ``hadoop_trans_spark`` and addPyFile it, once per app."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    sources: list[tuple[str, str]] = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, os.path.dirname(pkg_root))
                sources.append((full, rel))
    sources.sort(key=lambda t: t[1])
    digest = hashlib.md5()
    for full, rel in sources:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"hadoop_trans_spark_{digest.hexdigest()[:12]}.zip",
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full, rel in sources:
                zf.write(full, rel)
        os.replace(tmp, zip_path)  # atomic: concurrent builders converge
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)
