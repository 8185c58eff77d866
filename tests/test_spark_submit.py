"""End-to-end `spark-submit --py-files` proof (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

The test zips `information_retrieval_spark/` exactly as a cluster
deploy would, then launches a REAL spark-submit subprocess from a
directory that does NOT contain the package — so the driver's imports
can only be satisfied by the --py-files zip shipped to the
driver/executors. The submitted job builds a fixture index via the
public API and runs a boolean + a BM25 query, printing one JSON line
the test asserts on (golden values from tests/test_queries.py).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "information_retrieval_spark")

_DRIVER = """\
import json, sys
from pyspark.sql import SparkSession
from information_retrieval_spark.build import IndexBuilder, IndexConfig
from information_retrieval_spark.corpus import fixture_docs
from information_retrieval_spark.query import QueryEngine

spark = (SparkSession.builder.appName("irs-submit-smoke")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
idx = IndexBuilder(spark, sys.argv[1], IndexConfig(n_partitions=4)) \\
    .build(fixture_docs(spark), resume=False)
qe = QueryEngine(idx)
out = {
    "boolean": [r["name"] for r in qe.boolean("pen AND pineapple").collect()],
    "bm25": [r["name"] for r in qe.bm25("trigger word", k=3).collect()],
}
print("IRS_RESULT " + json.dumps(out))
spark.stop()
"""


def _spark_submit_bin() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark
    except ImportError:
        return None
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.access(cand, os.X_OK) else None


def test_spark_submit_py_files(tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("spark-submit binary not available")

    zip_path = tmp_path / "irs.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, REPO)
                    zf.write(full, rel)

    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    workdir = tmp_path / "cwd"  # no package here: imports MUST come from the zip
    workdir.mkdir()

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the repo must not leak in via the env either
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", str(zip_path),
         str(driver), str(tmp_path / "idx")],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("IRS_RESULT ")]
    assert lines, proc.stdout[-4000:]
    out = json.loads(lines[-1][len("IRS_RESULT "):])
    # goldens: boolean from TestBooleanRetrieval.java fixtures; bm25 from
    # the pure-Python oracle (test4 outranks test3: same tf/idf, shorter dl)
    assert out["boolean"] == ["test1.txt"]
    assert out["bm25"] == ["test4.txt", "test3.txt"]
