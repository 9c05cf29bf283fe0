"""PII detection + redaction for webtext training corpora.

Production LLM-data pipelines (Dolma, RedPajama-v2, BigScience ROOTS)
scrub personally identifiable information — email addresses, phone
numbers, IP addresses — before training. The standard open
implementation is regex-based span replacement; we keep exactly that
semantic but run it as pure built-in JVM expressions (regexp_replace /
regexp_extract_all), so the whole scrub is a map-side projection: no
UDFs, no shuffles, WholeStageCodegen end to end, and it composes with
any scan at 100-TB scale (one pass over the text column, predicate /
column pruning unaffected).

The reference has no PII surface (it operates on images,
/root/reference/fastdup/fastdup_controller.py); this module is part of
the beyond-the-reference LLM-data-pipeline tier (SURVEY §2 addenda).

Cross-engine contract: the patterns below avoid lookarounds and
backreferences, so they mean the same thing in Java regex (Spark) and
RE2 (DuckDB) — the driver oracle replays the scrub verbatim with
DuckDB's regexp_replace(..., 'g'). Counts are measured on the ORIGINAL
text (each class independently); redaction applies in a fixed order
(email -> ipv4 -> phone) with digit-free tokens, so a later pass can
never match inside an earlier pass's replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex AND RE2 compatible: no lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# redaction order matters: emails first (their local parts may embed
# digits), then IPv4 (dotted quads), then phones; all tokens are
# digit-free so passes cannot cascade.
_ORDERED = ((EMAIL_RE, EMAIL_TOKEN), (IPV4_RE, IPV4_TOKEN),
            (PHONE_RE, PHONE_TOKEN))


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def pii_count_exprs(text: Column) -> dict[str, Column]:
    """Per-class match counts over the original text (audit columns)."""
    return {
        "n_emails": _count(text, EMAIL_RE),
        "n_ips": _count(text, IPV4_RE),
        "n_phones": _count(text, PHONE_RE),
    }


def scrub_pii_expr(text: Column) -> Column:
    """The redacted text: email -> ipv4 -> phone replacement, in order."""
    out = text
    for pattern, token in _ORDERED:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Append per-class PII counts and a redacted text column.

    Map-side only: the plan is a single Project over the scan — no
    shuffle, no Python. Counts reflect the original text; ``out_col``
    holds the redacted form.
    """
    t = F.col(text_col)
    counts = pii_count_exprs(t)
    return df.select(
        "*",
        *[v.alias(k) for k, v in counts.items()],
        scrub_pii_expr(t).alias(out_col),
    )
