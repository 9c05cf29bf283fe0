"""HTML -> text extraction as a vectorized pandas UDF + quarantine semantics.

Plays the role of the reference's image decode + feature-extraction entry
(the C++ `do_run` contract, /root/reference/fastdup/__init__.py:400-455);
rows that fail extraction land in a quarantine table with an error code,
the analog of `atrain_features.bad.csv` (index, filename, error_code —
/root/reference/fastdup/definitions.py:108,150-153; /root/reference/RUN.md:120-124).

The extractor is exactly inverse to the fixture template
(fixtures/pages.py:render_html): it pulls `<p>...</p>` blocks in document
order, unescapes HTML entities, and joins paragraphs with a blank line. The
per-row invariant (BASELINE.json:input_hint) — byte-identical extracted text
per url — is enforced by tests/test_extract.py against the generator's
ground-truth `text`. A production deployment would swap the regex body for
selectolax/lxml inside the same batch loop; the Spark-side plumbing (schema,
Arrow batching, quarantine split) is identical.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

ERR_DECODE = "ERR_DECODE"      # html bytes are not valid utf-8
ERR_NO_TEXT = "ERR_NO_TEXT"    # no extractable paragraphs (incl. truncated markup)
ERR_EMPTY = "ERR_EMPTY"        # extraction produced < min_text_chars chars
OK = ""

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)

EXTRACT_SCHEMA = StructType([
    StructField("extracted_text", StringType(), True),
    StructField("error_code", StringType(), True),
])


def _extract_batch(html_bytes: pd.Series, min_text_chars: int) -> pd.DataFrame:
    texts: list[str | None] = []
    errors: list[str] = []
    for hb in html_bytes:
        if hb is None or len(hb) == 0:
            texts.append(None)
            errors.append(ERR_NO_TEXT)
            continue
        paras = _P_RE.findall(bytes(hb))
        if not paras:
            texts.append(None)
            errors.append(ERR_NO_TEXT)
            continue
        try:
            text = "\n\n".join(_html.unescape(p.decode("utf-8", errors="strict")) for p in paras)
        except UnicodeDecodeError:
            texts.append(None)
            errors.append(ERR_DECODE)
            continue
        if len(text) < min_text_chars:
            texts.append(None)
            errors.append(ERR_EMPTY)
            continue
        texts.append(text)
        errors.append(OK)
    return pd.DataFrame({"extracted_text": texts, "error_code": errors})


def extract_text_udf(min_text_chars: int = 1):
    """Scalar-iter pandas UDF: BINARY html -> struct(extracted_text, error_code).

    Arrow-batched; the only Python loop is over rows *within* a batch (HTML
    parsing has no numpy form), never a Spark row-at-a-time UDF.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(EXTRACT_SCHEMA)
    def _extract(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in it:
            yield _extract_batch(batch, min_text_chars)

    return _extract


def split_extracted(pages_df, min_text_chars: int = 1):
    """Run extraction; return (ok_df, quarantine_df).

    ok_df: url, warc_ts, lang, text (extracted)
    quarantine_df: url, warc_ts, error_code   (≈ atrain_features.bad.csv)
    """
    udf = extract_text_udf(min_text_chars)
    passthrough = [c for c in pages_df.columns if c not in ("html", "text")]
    ext = pages_df.withColumn("_ex", udf(F.col("html"))).select(
        *passthrough,
        F.col("_ex.extracted_text").alias("text"),
        F.col("_ex.error_code").alias("error_code"),
    )
    ok = ext.filter(F.col("error_code") == "").drop("error_code")
    bad = ext.filter(F.col("error_code") != "").select(*passthrough, "error_code")
    return ok, bad
