"""north_rule packaging: the pipeline ships as a real `spark-submit
--py-files dist/fastdup_spark.zip` job (scripts/run_pipeline.py). This
drives the actual spark-submit binary from a neutral cwd, so the engine
package must come from the zip — the deploy artifact, not the repo tree."""

import json
import os
import subprocess

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_spark_submit_py_files_job(tmp_path, spark, spark_data):
    # fresh artifact + a small pages parquet written by the live session
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")],
                   check=True, capture_output=True)
    pages_path = str(tmp_path / "pages_parquet")
    spark_data[0].limit(200).repartition(4).write.parquet(pages_path)

    work = str(tmp_path / "submit_run")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must supply the package
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", os.path.join(REPO, "dist", "fastdup_spark.zip"),
         os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", pages_path, "--work-dir", work],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["total_pages"] == 200
    assert summary["valid_docs"] > 0
    # the job really wrote the stage store (markers + sharded tables)
    for stage in ("extracted", "signatures", "similarity", "assignments"):
        assert os.path.exists(os.path.join(work, f"{stage}.marker.json")), stage
