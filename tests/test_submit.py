"""Cluster-submission packaging: `spark-submit --py-files <zip>` must
run the build and query entrypoints with the package imported FROM THE
ZIP (north rule: "run via spark-submit --py-files on a multi-executor
cluster"). The driver scripts are copied to a directory that does NOT
contain the package, so any successful import proves the artifact is
self-contained (sources + the stopword fixture the tokenizer loads)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_roundtrip(tmp_path):
    zip_path = str(tmp_path / "search_engine_spark.zip")
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "package.py"),
                    zip_path], check=True, capture_output=True, timeout=120)
    # stage the driver scripts AWAY from the repo so the package can
    # only come from --py-files
    stage = tmp_path / "stage"
    stage.mkdir()
    for script in ("build.py", "query.py"):
        shutil.copy(os.path.join(ROOT, script), stage / script)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    def _submit(script, *args):
        p = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
             str(stage / script), *args],
            cwd=str(stage), env=env, capture_output=True, text=True,
            timeout=420)
        assert p.returncode == 0, p.stderr[-3000:]
        return p.stdout

    _submit("build.py", "--synthetic", "12", "--out", idx, "--cpus", "4")
    assert os.path.exists(os.path.join(idx, "index", "_DONE.json"))
    got = _submit("query.py", "--index", idx, "--cpus", "4",
                  "--query", "a se", "--k", "3")
    rows = [ln.split("\t") for ln in got.strip().splitlines() if "\t" in ln]
    assert 1 <= len(rows) <= 3
    assert [int(r[2]) for r in rows] == list(range(1, len(rows) + 1))
