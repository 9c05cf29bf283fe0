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


def test_run_pipeline_pre_dedup_flag(tmp_path, spark, spark_data, monkeypatch):
    """--pre-dedup url,exact: cheap cascade tiers run before the pipeline,
    decisions land in the work dir, the pipeline sees only survivors."""
    import importlib.util
    import sys

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "run_pipeline_mod", os.path.join(REPO, "scripts", "run_pipeline.py"))
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    pages = spark_data[0].limit(120).cache()
    # refetch noise: 10 pages re-served under a tracking param 30 days
    # later (url tier keeps the newer fetch, drops the original) and 15
    # byte-identical mirrors under different urls (exact tier)
    revisits = (
        pages.limit(10)
        .withColumn("url", F.concat("url", F.lit("?utm_source=x")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 30 days")))
    mirrors = pages.limit(15).withColumn(
        "url", F.concat(F.lit("https://mirror.example/"), F.md5("url")))
    inp = str(tmp_path / "pages_with_noise")
    pages.unionByName(revisits).unionByName(mirrors) \
        .repartition(4).write.parquet(inp)

    work = str(tmp_path / "pre_dedup_run")
    monkeypatch.setattr(sys, "argv", [
        "run_pipeline.py", "--input", inp, "--work-dir", work,
        "--pre-dedup", "url,exact"])
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rp.main()
    summary = json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1])
    assert summary["pre_dedup_dropped"] == {"url": 10, "exact": 15}
    assert summary["total_pages"] == 120  # pipeline ran on survivors only
    dec = spark.read.parquet(f"{work}/pre_dedup_decisions")
    assert dec.count() == 25
    assert set(r["tier"] for r in dec.select("tier").distinct().collect()) \
        == {"url", "exact"}


def test_clean_corpus_cli(tmp_path, spark, monkeypatch):
    """scripts/clean_corpus.py: c4 -> pii -> blocklist -> sample, in-process
    main() like the pre-dedup flag test. The planted corpus exercises every
    pass: doc 1 survives everything, doc 2 dies at the page-kill, doc 3
    dies at the blocklist, docs carry PII that must be redacted."""
    import importlib.util
    import io
    import sys
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "clean_corpus_mod", os.path.join(REPO, "scripts", "clean_corpus.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    good = ("This is a keeper line with plenty of words here.\n"
            "Another keeper line that certainly has enough words!\n"
            "Contact me at bob@example.org for all the details today.")
    lorem = good + "\nLorem ipsum dolor sit amet filler."
    blocked = good.replace("Contact", "Casino contact")
    rows = [(1, good), (2, lorem), (3, blocked)]
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(inp)

    monkeypatch.setattr(sys, "argv", [
        "clean_corpus.py", "--input", inp, "--output", out,
        "--passes", "c4,pii,blocklist", "--blocklist", "casino"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        cc.main()
    counts = json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1])
    assert counts["input_docs"] == 3
    assert counts["after_c4"] == 2          # lorem page killed
    assert counts["after_blocklist"] == 1   # casino doc dropped
    assert counts["pii_redactions"] >= 2    # both survivors had an email
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].doc_id == 1
    assert "<EMAIL>" in got[0].text and "bob@example.org" not in got[0].text


def test_clean_corpus_cli_dedup_passes(tmp_path, spark, monkeypatch):
    """--passes lines,spans: the cross-doc dedup passes rewrite text and
    kill gutted docs; other columns survive the rejoin."""
    import importlib.util
    import io
    import sys
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "clean_corpus_mod2", os.path.join(REPO, "scripts", "clean_corpus.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    banner = "identical banner line repeated on every page"
    run = " ".join(f"dup{i}" for i in range(10))
    def body(tag):
        return "\n".join(" ".join(f"{tag}w{l}{i}" for i in range(10))
                          for l in range(3))
    rows = [
        (1, f"{banner}\n{body('a')}\n{run}", "a"),
        (2, f"{banner}\n{body('b')}\nx {run} y", "b"),
        # gutted by the lines pass: banner only
        (3, banner, "c"),
    ]
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    spark.createDataFrame(rows, ["doc_id", "text", "tag"]).write.parquet(inp)

    monkeypatch.setattr(sys, "argv", [
        "clean_corpus.py", "--input", inp, "--output", out,
        "--passes", "lines,spans", "--span-k", "10"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        cc.main()
    counts = json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1])
    assert counts["input_docs"] == 3
    assert counts["after_lines"] == 2       # banner-only doc killed
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2}
    for r in got.values():
        assert banner not in r.text         # lines pass removed the banner
        assert "dup0" not in r.text         # spans pass removed the run
        assert r.tag in ("a", "b")          # other columns rejoined
    assert "aw00" in got[1].text
