"""Deployment surface: the packaged job runs under real spark-submit
with --py-files (north rule: "deployed via spark-submit --py-files"),
not just as an imported library."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_kg_job_via_spark_submit(tmp_path):
    zip_path = str(tmp_path / "kgflow.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "kgflow")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    out = str(tmp_path / "kg_out")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = "/root/.pyenv/shims/python3"
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "kg_job.py"),
            "--synth-turns", "400",
            "--synth-terms", "60",
            "--prov",
            "--run-id", "submit-test",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["mode"] == "prov"
    assert summary["run_id"] == "submit-test"
    assert summary["triples_written"] > 0
    assert summary["nodes_written"] > 0
    # the artifacts are readable parquet with the provenance schema
    import pandas as pd

    t = pd.read_parquet(os.path.join(out, "triples"))
    assert {"subj", "pred", "obj", "family", "n_obs", "n_convs", "first_seen_run"} <= set(
        t.columns
    )
    assert (t["first_seen_run"] == "submit-test").all()


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_doc_stats_job_via_spark_submit(tmp_path, spark):
    """The --doc-stats mode (incremental streaming maintenance) runs
    under real spark-submit too."""
    zip_path = str(tmp_path / "kgflow.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "kgflow")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"text number {i} with tokens", "en", "web", 20) for i in range(50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs_dir)
    out = str(tmp_path / "stats_out")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = "/root/.pyenv/shims/python3"
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "kg_job.py"),
            "--doc-stats",
            "--docs", docs_dir,
            "--out", out,
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["mode"] == "doc_stats"
    assert summary["docs_tracked"] == 50
