"""The north-rule deployment shape: ``spark-submit --py-files
engine.zip driver.py`` must work with the engine imported from the
zip alone (no repo on sys.path) — proves the package is
cluster-shippable as one archive."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit")
def test_spark_submit_pyfiles_zip(tmp_path):
    zpath = tmp_path / "engine.zip"
    pkg = os.path.join(REPO, "pyontutils_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_driver.py"), driver)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zpath), str(driver)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert "PYFILES_SMOKE_OK" in out.stdout, \
        (out.stdout[-1000:], out.stderr[-2000:])
    line = [ln for ln in out.stdout.splitlines()
            if "PYFILES_SMOKE_OK" in ln][0]
    n = int(line.split("triples=")[1].split()[0])
    assert n > 100
    # the engine really came from the shipped zip, not the repo tree
    assert "engine.zip" in line.split("pkg=")[1]
