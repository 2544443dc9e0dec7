"""North-rule ship path: the whole pipeline runs via
`spark-submit --py-files dist/sphinx_1_spark.zip` with NO repo on the
path — the zip must be self-contained and the job resumable.

Runs the real spark-submit binary from a temp cwd: package.py builds
the zip, the job script is copied out of the repo, and the driver's
only access to engine code is the --py-files zip.  Asserts the built
segment set is complete and serveable (WAND top-k returns ranked
rows)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_build(tmp_path):
    # fresh zip from the current tree
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        check=True,
        cwd=REPO,
        capture_output=True,
    )
    zip_path = tmp_path / "sphinx_1_spark.zip"
    shutil.copy(os.path.join(REPO, "dist", "sphinx_1_spark.zip"), zip_path)
    job = tmp_path / "build_index_job.py"
    shutil.copy(os.path.join(REPO, "scripts", "build_index_job.py"), job)
    out = tmp_path / "segs"

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing but the zip provides the pkg
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", str(zip_path),
            str(job),
            "--synthetic", "2000",
            "--output", str(out),
            "--shards", "2",
        ],
        cwd=tmp_path,  # NOT the repo: import must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # both shards published complete manifests with lineage + metrics
    shards = sorted(
        d for d in os.listdir(out) if (out / d / "_MANIFEST.json").exists()
    )
    assert len(shards) == 2
    m = json.loads((out / shards[0] / "_MANIFEST.json").read_text())
    assert m.get("metrics") and m.get("lineage")

    # the produced segment set serves ranked queries
    from sphinx_1_spark.plans.segment_index import SegmentSet

    from tests.conftest import SF_DIR  # noqa: F401 (ensures repo path ok)

    def _query(spark):
        seg = SegmentSet(spark, [str(out / s) for s in shards])
        return seg.wand_topk(["the"], 5, "or").collect()

    # reuse the session fixture machinery without a fixture dependency
    from sphinx_1_spark.session import get_spark

    spark = get_spark(cores=4)
    rows = _query(spark)
    assert len(rows) == 5
    assert rows[0]["weight"] >= rows[-1]["weight"]
