"""REAL ``spark-submit --py-files`` shipping test (north-rule clause).

Not an in-process ``main()`` call: this zips the package, copies the
job script OUT of the repo, and launches an actual ``spark-submit``
subprocess from a foreign cwd — so the engine import can only be
satisfied by the ``--py-files`` zip, exactly how the job ships to a
cluster. Asserts the backfill output parquet + manifest land and are
readable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit_bin() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(p) if p.exists() else None


def test_py_files_shipping(spark, tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("no spark-submit on PATH")

    # 1. engine zip, as the documented invocation builds it
    zpath = tmp_path / "engine.zip"
    pkg = REPO / "kkbox_churn_prediction_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in pkg.rglob("*.py"):
            z.write(f, f.relative_to(REPO))

    # 2. small transcript parquet input (reuse the session fixture)
    from kkbox_churn_prediction_spark.sources.genbench import (
        generate_transcripts_distributed,
    )

    inp = str(tmp_path / "turns")
    generate_transcripts_distributed(spark, n_convs=60, avg_turns=20).write.parquet(inp)

    # 3. job script copied OUTSIDE the repo: its sys.path hack then
    # points at tmp, so the package import MUST resolve via --py-files
    job = tmp_path / "backfill_job.py"
    shutil.copyfile(REPO / "jobs" / "backfill_job.py", job)

    out = str(tmp_path / "features_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            str(zpath),
            str(job),
            "--input",
            inp,
            "--output",
            out,
            "--horizons",
            "1,3,7",
            "--run-id",
            "submit-smoke",
            "--buckets",
            "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "backfill complete" in proc.stdout

    # 4. output is a readable feature table with the expected grain
    got = spark.read.parquet(out)
    assert got.count() > 0
    cols = set(got.columns)
    assert {"conv_id", "cutoff_ts"} <= cols
    assert any(c.startswith("turn_cnt_") for c in cols)
