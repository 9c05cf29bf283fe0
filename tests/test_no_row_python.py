"""Vectorized-only gate (BASELINE.json:input_hint "no per-row Python"):
the package must never use row-at-a-time `pyspark.sql.functions.udf` or RDD
transformations — only pandas UDFs / applyInPandas / mapInPandas / built-ins."""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "fastdup_spark")

FORBIDDEN = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"from pyspark\.sql\.functions import .*\budf\b(?!_)"), "udf import"),
    (re.compile(r"\.rdd\b"), "RDD access"),
    (re.compile(r"\bsparkContext\.parallelize\b.*\.map\("), "RDD map"),
    (re.compile(r"@udf\b"), "udf decorator"),
    # per-row Python iteration over a pandas-UDF batch column (e.g.
    # `for url in pdf["url"]`) — vectorized ops only. Keyed to the pdf/pdfs
    # batch-frame naming convention so driver-side post-collect rendering
    # loops (report.py over <=num_items rows) stay allowed.
    (re.compile(r"for\s+\w+\s+in\s+pdfs?\[[\"']"), "per-row pandas column loop"),
]


def _iter_sources():
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                with open(p) as f:
                    yield p, f.read()


def test_no_row_level_python():
    violations = []
    for path, src in _iter_sources():
        for pat, label in FORBIDDEN:
            if pat.search(src):
                violations.append((path, label))
    assert not violations, violations


def test_pandas_udfs_present():
    """Sanity: the vectorized path actually exists."""
    found = any("pandas_udf" in src for _p, src in _iter_sources())
    assert found
