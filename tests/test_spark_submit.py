"""The north_rule's exact invocation: `spark-submit --py-files <zip>` runs
the pipeline; a killed run (process really exits mid-pipeline) resumes from
the checkpoint without recomputing committed partitions."""

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = [
    pytest.mark.skipif(
        not Path(SPARK_SUBMIT).exists(), reason="spark-submit not available"
    ),
    pytest.mark.cluster,  # separate driver+executor JVMs, ~90 s per test
]


def _make_zip(tmp_path: Path) -> Path:
    z = tmp_path / "eoreader_spark.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for f in (REPO / "eoreader_spark").rglob("*.py"):
            zf.write(f, f.relative_to(REPO))
    return z


def _submit(zip_path: Path, root: Path, n: int, die_after: str | None = None):
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[8]",
        "--py-files", str(zip_path),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=8g",
        str(REPO / "tools" / "submit_pipeline.py"),
        "--root", str(root),
        "--n-images", str(n),
    ]
    if die_after:
        cmd += ["--die-after", die_after]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=600)


def test_spark_submit_kill_and_resume(tmp_path):
    z = _make_zip(tmp_path)
    root = tmp_path / "ck"

    # run 1: process exits after the tiles stage commits ("kill")
    p1 = _submit(z, root, 20, die_after="tiles")
    assert p1.returncode == 1 and "DIE_AFTER tiles" in p1.stdout, p1.stderr[-2000:]

    # run 2: same command, no kill -> must complete, resuming past
    # images+tiles (skipped = nothing recomputed)
    p2 = _submit(z, root, 20)
    assert p2.returncode == 0, p2.stderr[-2000:]
    line = [ln for ln in p2.stdout.splitlines() if ln.startswith("PIPELINE_RESULT ")][0]
    out = json.loads(line[len("PIPELINE_RESULT "):])
    assert out["images"]["skipped"] is True
    assert out["tiles"]["skipped"] is True
    assert out["assign"]["rows_written"] > 0
    assert out["index"]["rows_written"] == 20 * 2


def test_spark_submit_resume_on_multi_executor_cluster(tmp_path):
    """The north_rule's literal invocation shape: spark-submit --py-files on
    a MULTI-EXECUTOR cluster (local-cluster: 2 separate executor JVMs,
    netty shuffle, --py-files shipped to executor python workers), killed
    mid-pipeline and resumed without recomputing committed stages."""
    z = _make_zip(tmp_path)
    root = tmp_path / "ck_lc"

    def submit_lc(die_after=None):
        cmd = [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--py-files", str(z),
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            "--conf", "spark.executor.memory=1536m",
            str(REPO / "tools" / "submit_pipeline.py"),
            "--root", str(root),
            "--n-images", "12",
            "--shuffle-partitions", "8",
        ]
        if die_after:
            cmd += ["--die-after", die_after]
        return subprocess.run(cmd, capture_output=True, text=True, timeout=600)

    p1 = submit_lc(die_after="tiles")
    assert p1.returncode == 1 and "DIE_AFTER tiles" in p1.stdout, p1.stderr[-2000:]
    p2 = submit_lc()
    assert p2.returncode == 0, p2.stderr[-2000:]
    line = [ln for ln in p2.stdout.splitlines() if ln.startswith("PIPELINE_RESULT ")][0]
    out = json.loads(line[len("PIPELINE_RESULT "):])
    assert out["images"]["skipped"] is True
    assert out["tiles"]["skipped"] is True
    assert out["assign"]["rows_written"] > 0
