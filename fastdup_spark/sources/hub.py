"""Dataset-hub text ingestion — the text analog of the reference's
HF-datasets source (/root/reference/fastdup/datasets.py:16-215, which
materializes a hub dataset into fastdup's input layout: snapshot ->
per-item files + annotation CSV). Here a hub-hosted TEXT dataset's parquet
shards become the engine's `documents`/`pages` shape directly — Spark reads
the shards in place, no per-item materialization.

Works OFFLINE against a local snapshot directory (the layout
`huggingface_hub.snapshot_download` produces, or any directory of
`<split>-NNNNN-of-NNNNN.parquet` shards, flat or nested under `data/` /
config subdirs). `resolve_hub_root` optionally fetches a snapshot when the
`huggingface_hub` package is installed — import-try gated, never required.

Column mapping is by-name with common-name inference (text/content/
document/raw_content ...; url/id/title ...), overridable per dataset.
`hub_pages` wraps the text back into the engine's `pages` schema (url,
warc_ts, html, lang) with a minimal synthesized HTML body, so the FULL
run() pipeline — extraction, quarantine, signatures, LSH, CC — exercises
hub data end to end. The wrap entity-escapes the text, so extraction
recovers it exactly up to whitespace collapsing (the extractor's block
normalization; hub texts with single-space word separation round-trip
byte-identically).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# filename shapes: train-00000-of-00002.parquet / test.parquet /
# validation_0000.parquet — the split token is the leading alpha run
_SPLIT_RE = re.compile(r"^([a-zA-Z]+)")

_TEXT_CANDIDATES = ("text", "content", "document", "raw_content", "body")
_ID_CANDIDATES = ("url", "id", "doc_id", "title")
_LANG_CANDIDATES = ("lang", "language")
_TS_CANDIDATES = ("warc_ts", "timestamp", "date", "crawl_ts")


def _discover_shards(root: str, split: str) -> tuple[list[str], set[str]]:
    """Parquet shard paths whose filename's split token matches ``split``,
    plus every split token seen (for the error message)."""
    shards, seen = [], set()
    for r, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            m = _SPLIT_RE.match(fn)
            token = m.group(1).lower() if m else ""
            seen.add(token)
            if token == split.lower():
                shards.append(os.path.join(r, fn))
    return sorted(shards), seen


def read_hub_text(spark: SparkSession, root: str, split: str = "train",
                  text_col: str | None = None, id_col: str | None = None,
                  lang_col: str | None = None, ts_col: str | None = None,
                  ) -> DataFrame:
    """A hub text dataset's ``split`` as a `documents`-shaped DataFrame:
    (url, text, lang, warc_ts). ``root`` is a local snapshot directory;
    shard discovery is recursive, so flat, `data/`-nested, and
    config-subdir layouts all work. Explicit ``*_col`` overrides beat the
    by-name inference; a missing id column synthesizes a stable pseudo-url
    from the dataset name + split + xxhash64(text)."""
    shards, seen = _discover_shards(root, split)
    if not shards:
        raise ValueError(
            f"no parquet shards for split {split!r} under {root!r} "
            f"(found split tokens: {sorted(t for t in seen if t) or 'none'})")
    df = spark.read.parquet(*shards)

    def pick(explicit: str | None, cands: tuple[str, ...]) -> str | None:
        if explicit is not None:
            if explicit not in df.columns:
                raise ValueError(f"column {explicit!r} not in dataset "
                                 f"columns {df.columns}")
            return explicit
        lower = {c.lower(): c for c in df.columns}
        for c in cands:
            if c in lower:
                return lower[c]
        return None

    tcol = pick(text_col, _TEXT_CANDIDATES)
    if tcol is None:
        raise ValueError(f"no text column among {df.columns}; pass text_col=")
    icol = pick(id_col, _ID_CANDIDATES)
    lcol = pick(lang_col, _LANG_CANDIDATES)
    scol = pick(ts_col, _TS_CANDIDATES)

    name = os.path.basename(os.path.normpath(root))
    url = (F.col(icol).cast("string") if icol is not None else
           F.concat(F.lit(f"hub://{name}/{split}#"),
                    F.xxhash64(F.col(tcol)).cast("string")))
    lang = F.col(lcol).cast("string") if lcol is not None else F.lit(None).cast("string")
    ts = (F.col(scol).cast("timestamp") if scol is not None
          else F.lit("1970-01-01 00:00:00").cast("timestamp"))
    return df.select(
        url.alias("url"), F.col(tcol).cast("string").alias("text"),
        lang.alias("lang"), ts.alias("warc_ts"),
    ).filter(F.col("text").isNotNull())


def hub_pages(docs: DataFrame) -> DataFrame:
    """`documents`-shaped hub rows -> the engine's `pages` input schema
    (url, warc_ts, html, lang): text entity-escaped into a minimal HTML
    body so run()'s extraction round-trips it (byte-identical for
    single-space-separated text; otherwise whitespace-collapsed)."""
    body = F.concat(
        F.lit("<html><body><p>"),
        # order matters: escape '&' first, exactly html.escape's behavior
        F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
        F.lit("</p></body></html>"))
    return docs.select(
        "url", "warc_ts", F.encode(body, "UTF-8").alias("html"), "lang")


def resolve_hub_root(repo_id: str, revision: str | None = None,
                     cache_dir: str | None = None) -> str:
    """Snapshot a hub dataset locally and return its root — only when the
    (optional) huggingface_hub package is installed; offline deployments
    point read_hub_text at an existing snapshot directory instead."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub lib absent in sandbox
        raise ImportError(
            "huggingface_hub is not installed; download a snapshot "
            "elsewhere and pass its directory to read_hub_text") from e
    return snapshot_download(repo_id=repo_id, repo_type="dataset",
                             revision=revision, cache_dir=cache_dir,
                             allow_patterns=["*.parquet"])
