"""WARC source roundtrip: fixture pages -> ISO 28500 files (plain + gzip
members) -> read_warc_pages -> byte-identical html, then the extraction
invariant holds end-to-end from the archive format."""

import pytest

from fastdup_spark.fixtures.pages import generate_pages
from fastdup_spark.fixtures.warc import write_warc_files
from fastdup_spark.sources.warc import parse_warc_records, read_warc_pages


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(120, seed=21).pages


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(spark, corpus, tmp_path, gz):
    out = str(tmp_path / ("gz" if gz else "plain"))
    paths = write_warc_files(corpus, out, records_per_file=50,
                             gzip_members=gz)
    assert len(paths) == 3  # sharded: file-level read parallelism
    df = read_warc_pages(spark, out).cache()
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == len(corpus)
    for rec in corpus.itertuples():
        got = rows[rec.url]
        assert bytes(got["html"]) == bytes(rec.html), rec.url
        assert got["warc_ts"] == rec.warc_ts
        assert got["warc_file"].endswith(".warc.gz" if gz else ".warc")


def test_extraction_invariant_from_warc(spark, corpus, tmp_path):
    """The per-row invariant (byte-identical extracted text per url) must
    hold when ingest starts from the archive format, not just parquet."""
    from fastdup_spark.functions.extract import split_extracted

    out = str(tmp_path / "w")
    write_warc_files(corpus, out, gzip_members=True)
    pages = read_warc_pages(spark, out)
    ok, _bad = split_extracted(pages, 1)
    got = {r["url"]: r["text"] for r in ok.collect()}
    truth = dict(zip(corpus["url"], corpus["text"]))
    checked = 0
    for url, text in truth.items():
        if text:  # empty-text rows are quarantine rows by design
            assert got[url] == text, url
            checked += 1
    assert checked > 100


def test_parser_skips_malformed_and_non_response():
    good = next(iter(parse_warc_records(
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
        b"garbage bytes here "
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 30\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\n<p>body</p>\r\n\r\n")))
    assert good["url"] == "https://x/"
    assert good["html"] == b"<p>body</p>"


def test_run_input_format_warc(spark, corpus, tmp_path):
    """fd.run(input_path=..., input_format='warc') ingests archives
    directly — no intermediate parquet conversion step."""
    from fastdup_spark import FastdupSpark

    out = str(tmp_path / "warc_in")
    write_warc_files(corpus, out, gzip_members=True)
    fd = FastdupSpark(spark, str(tmp_path / "work"))
    summ = fd.run(input_path=out, input_format="warc")
    n_nonempty = int((corpus["text"] != "").sum())
    assert summ["valid_docs"] == n_nonempty
