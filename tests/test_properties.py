"""Property-based tests (hypothesis) for the pure-Python batch kernels —
the parsers where hand-picked fixtures miss edge shapes: WARC byte scanning
(arbitrary bodies, junk between records, gzip framing), ttl parsing, and the
hashing embedder's contract (unit norms, determinism, text-order
sensitivity)."""

from __future__ import annotations

import gzip
import io

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from fastdup_spark.functions.enrich import hashing_embedder
from fastdup_spark.sources.warc import iter_warc_records, parse_warc_records
from fastdup_spark.streaming.stateful import _ttl_ms

# bodies: arbitrary bytes INCLUDING sequences that look like record magic
# ("WARC/", CRLFCRLF) — the content-length framing must carry the parser
# straight through them
_body = st.binary(min_size=0, max_size=300) | st.sampled_from([
    b"WARC/1.0\r\n\r\nembedded fake record header",
    b"\r\n\r\n\r\n\r\n", b"WARC/", b"",
])
# junk between records must not itself contain the record magic (the scanner
# is DEFINED to realign on "WARC/"; junk containing it is indistinguishable
# from a corrupt record, which is skipped — covered by the fixture test)
_junk = st.binary(min_size=0, max_size=50).filter(lambda b: b"WARC/" not in b)


def _record(i: int, body: bytes, warc_type: bytes = b"response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return (b"WARC/1.0\r\nWARC-Type: " + warc_type + b"\r\n"
            b"WARC-Target-URI: https://h/" + str(i).encode() + b"\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n")


@settings(max_examples=60, deadline=None)
@given(st.lists(_body, min_size=0, max_size=8), _junk,
       st.booleans(), st.booleans())
def test_warc_roundtrip_arbitrary_bodies(bodies, junk, gz, leading_junk):
    blob = junk if leading_junk else b""
    for i, body in enumerate(bodies):
        blob += _record(i, body) + junk
        if i % 3 == 1:  # interleave non-response records: must be skipped
            blob += _record(i, b"meta", warc_type=b"warcinfo")
    if gz:
        blob = gzip.compress(blob)
    got = list(parse_warc_records(blob))
    assert [r["html"] for r in got] == bodies
    assert [r["url"] for r in got] == [f"https://h/{i}"
                                       for i in range(len(bodies))]


@settings(max_examples=30, deadline=None)
@given(st.lists(_body, min_size=1, max_size=6), st.integers(1, 64))
def test_warc_streaming_equals_blob_parse(bodies, chunk):
    """The bounded-buffer stream parser must agree with itself at ANY read
    granularity (records can split across every chunk boundary)."""
    blob = b"".join(_record(i, b) for i, b in enumerate(bodies))

    class Dribble(io.RawIOBase):
        def __init__(self, data, n):
            self.data, self.pos, self.n = data, 0, n

        def read(self, size=-1):
            out = self.data[self.pos:self.pos + self.n]
            self.pos += len(out)
            return out

    got = [r["html"] for r in iter_warc_records(Dribble(blob, chunk))]
    assert got == bodies


def test_ttl_ms_units():
    assert _ttl_ms("1 second") == 1000
    assert _ttl_ms("2.5 minutes") == 150_000
    assert _ttl_ms("3 hours") == 3 * 3_600_000
    assert _ttl_ms(750) == 750
    import pytest
    with pytest.raises(ValueError):
        _ttl_ms("fortnight")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
    min_size=1, max_size=10))
def test_hashing_embedder_contract(texts):
    """Unit-norm (or zero) vectors, bit-deterministic across calls, and
    permuting the ROWS permutes the outputs (no cross-row leakage)."""
    model = hashing_embedder(64)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out1 = model(pdf)
    out2 = model(pdf.copy())
    for v1, v2 in zip(out1["embedding"], out2["embedding"]):
        assert np.array_equal(v1, v2)
        n = np.linalg.norm(v1)
        assert n == 0.0 or abs(n - 1.0) < 1e-5
    rev = model(pdf.iloc[::-1].reset_index(drop=True))
    for a, b in zip(reversed(list(out1["embedding"])), rev["embedding"]):
        assert np.array_equal(a, b)
