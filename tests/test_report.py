"""Markdown report galleries (≈ reference HTML galleries) + pagerank/
annotation surface on the pipeline object."""

from fastdup_spark.plans.report import (
    components_report, duplicates_report, full_report, outliers_report,
    stats_report, summary_report,
)


def test_duplicates_report(fd):
    md = duplicates_report(fd, 5)
    assert md.startswith("# Top duplicate pairs")
    assert "| url_from | url_to | jaccard |" in md
    assert md.count("\n|") >= 3  # header + sep + >=1 row


def test_components_report(fd):
    md = components_report(fd, 3)
    assert "## component" in md
    assert "https://" in md


def test_outliers_and_stats_reports(fd):
    assert "| url | best_sim |" in outliers_report(fd, 5)
    assert "| url | n_chars |" in stats_report(fd, 5)


def test_summary_and_full_report(fd):
    s = summary_report(fd)
    assert "**valid_docs**" in s
    full = full_report(fd, 3)
    for heading in ("# Run summary", "# Top duplicate pairs",
                    "# Top duplicate clusters", "# Outliers", "# Extreme docs"):
        assert heading in full


def test_pipeline_pagerank(fd):
    pr = fd.pagerank()
    n_docs = fd.docs().count()
    assert pr.count() == n_docs
    row = pr.first()
    assert row["pagerank"] > 0


def test_annotations_from_csv(fd, tmp_path, spark):
    import csv
    urls = [r["url"] for r in fd.docs().select("url").limit(3).collect()]
    p = tmp_path / "annot.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "label"])
        for u in urls:
            w.writerow([u, "keep"])
    fd.set_annotations(str(p))
    ann = fd.annotations()
    assert ann.filter("status = 'VALID'").count() == 3


def test_html_report_galleries(fd, tmp_path):
    """fd.report(fmt='html') renders all six gallery sections (the
    reference's native HTML deliverable, galleries.py:268-1728)."""
    out = str(tmp_path / "report.html")
    html_doc = fd.report(num_items=5, fmt="html", save_path=out)
    assert html_doc.startswith("<!doctype html>")
    for heading in ["Run summary", "Top duplicate pairs",
                    "Top duplicate clusters", "Outliers (most unique)",
                    "Extreme docs by n_chars", "Nearest neighbors"]:
        assert heading in html_doc, heading
    # tables have data rows and urls are present
    assert html_doc.count("<table>") >= 4
    assert "http" in html_doc
    import os
    assert os.path.getsize(out) > 1000
    # escaping: no raw unescaped angle brackets from data
    assert "<script" not in html_doc


def test_report_bad_fmt(fd):
    import pytest as _pt
    with _pt.raises(ValueError):
        fd.report(fmt="pdf")
