"""Write the pages fixture as valid ISO 28500 WARC files — the roundtrip
ground truth for `sources/warc.py` (and a template for what a production
Common-Crawl ingest consumes)."""

from __future__ import annotations

import gzip
import os

import pandas as pd


def _record(url: str, ts, html: bytes) -> bytes:
    iso = pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"\r\n" + html)
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(url)):032x}>\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


def write_warc_files(pages: pd.DataFrame, out_dir: str,
                     records_per_file: int = 200,
                     gzip_members: bool = False) -> list[str]:
    """pages (url, warc_ts, html, ...) -> sharded .warc[.gz] files.

    ``gzip_members=True`` compresses each record as its own gzip member and
    concatenates them — the exact Common Crawl layout. Also writes an
    `warcinfo` record at the head of each file (readers must skip
    non-response records)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    info_body = b"software: fastdup-spark-fixture\r\n"
    info = (
        f"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        f"Content-Length: {len(info_body)}\r\n\r\n"
    ).encode() + info_body + b"\r\n\r\n"
    for shard, start in enumerate(range(0, len(pages), records_per_file)):
        chunk = pages.iloc[start:start + records_per_file]
        recs = [info] + [_record(r.url, r.warc_ts, bytes(r.html))
                         for r in chunk.itertuples()]
        if gzip_members:
            blob = b"".join(gzip.compress(r) for r in recs)
            path = os.path.join(out_dir, f"part-{shard:04d}.warc.gz")
        else:
            blob = b"".join(recs)
            path = os.path.join(out_dir, f"part-{shard:04d}.warc")
        with open(path, "wb") as f:
            f.write(blob)
        paths.append(path)
    return paths
