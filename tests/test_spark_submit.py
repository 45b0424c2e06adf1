"""Cluster-shaped submit-path smoke (VERDICT r2 #10): the north rule
names ``spark-submit --py-files`` as the deployment vehicle — exercise
exactly that: package polar_spark into a zip, submit
``bench_scaling`` as the application, parse its one-line JSON result."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_scaling_job(tmp_path):
    zpath = str(tmp_path / "polar_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "polar_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    app = os.path.join(REPO, "polar_spark", "bench_scaling.py")
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", zpath,
            app,
            "--cpus", "4",
            "--edges", "200000",
            "--vertices", "20000",
            "--iters", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["iterations"] == 2 and res["edges"] > 190000
    assert res["edges_per_sec"] > 0
