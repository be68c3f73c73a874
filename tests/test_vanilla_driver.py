"""Driver-contract regression: the driver owns the SparkSession and may
launch the JVM from ANY working directory, so Python workers do not
inherit this repo on sys.path. Every worker-side closure that references
a module-level helper (the multimodal encoders, the Python DataSource
class) then dies with ModuleNotFoundError at task time — invisible to
the in-repo test suite, fatal in the driver sweep. ``shipping.py``
addPyFile's the package at session-configure time; this test proves the
whole chain from a subprocess whose cwd is OUTSIDE the repo with a
vanilla session, exactly as the driver runs it."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
import __spark_entry__ as e
q = e.queries()
# The worker-closure surface: module-referencing encoders (q121/q151/
# q152), the Python DataSource planner worker (q90), applyInPandas
# (q154), and a flat-map mapInPandas (q84).
for name in (
    "q121_raw_decode",
    "q151_wav_decode",
    "q152_ppm_decode",
    "q90_python_datasource",
    "q154_pareto_frontier",
    "q84_frame_sample",
):
    n = q[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
    print("OK", name, n)
print("ALL_OK")
"""


def test_worker_closures_survive_external_cwd(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo — workers can't fall back to cwd
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ALL_OK" in proc.stdout, proc.stdout
