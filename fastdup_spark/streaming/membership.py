"""Persisted membership Bloom bitmap for the incremental update path.

The per-batch membership decision ("is this doc_id already committed to
`extracted`?") was the last O(corpus) read on the clean trickle path: a
shard-pruned scan of the extracted id column, re-run for EVERY batch,
and a uniformly-hashed batch touches almost every shard. This module
applies the Dolma dedupe pattern (operators/bloom.py) to our own ingest:
the committed id set compresses ONCE into a bitmap persisted next to
the store tables, and each batch probes it DRIVER-SIDE — zero Spark
jobs, zero table reads — falling back to the exact shard-pruned scan
only for the (tiny) maybe-seen subset.

Correctness model — the bitmap is an ACCELERATOR, never an oracle:

* ``maybe_seen`` rows (every redelivered doc, plus ~fpp false positives)
  are confirmed by the EXACT pruned scan restricted to their shards, so
  a false positive can never wrongly drop a new doc.
* ``definitely_new`` rows skip the scan. That is exact iff the bitmap
  contains every committed id — guarded by a lineage fingerprint: the
  sidecar records the md5 of the extracted table's (file, rows) footer
  lineage at stamp time, and the loader rejects the bitmap unless it
  matches the CURRENT pre-append lineage. Any crash between the
  extracted append and the bitmap stamp, any heal rebuild, and any
  out-of-band rewrite of the work dir (a fresh ``run()``) all change
  the lineage and invalidate the bitmap — the batch falls back to the
  scan and the finalize tail rebuilds. A bits-md5 in the sidecar
  additionally rejects torn bitmap files.
* the bitmap is stamped in ``_finalize_bookkeeping`` AFTER the
  extracted append (either side of the marker refresh is safe: a stale
  bitmap is detected by fingerprint, a stale marker by the existing
  rows-vs-footers tripwire).

Hashing: int64 ids → k positions via splitmix64-finalized double
hashing (Kirsch–Mitzenmacher 2006: pos_j = h1 + j·h2 mod m with m a
power of two and h2 odd). Pure numpy uint64 multiply/shift — no modulo
(sandbox quirk), full avalanche finalizer (sequential xxhash64 ids are
NOT random in their low bits), and the SAME function runs driver-side
(probe/insert) and inside the distributed rebuild's mapInPandas, so
both build paths are bit-identical by construction.

Scale: 10^9 committed ids at 1% fpp ≈ 1.2 GiB on the driver — the same
budget the Dolma tool documents; capacity doubles ahead of growth so
rebuilds are O(log n) over a store's lifetime. Rebuilds are hybrid:
driver-side insert for ≤5M ids (one column collect), distributed
position-explode + block assembly (operators/bloom.assemble_bitmap)
above.
"""

from __future__ import annotations

import hashlib
import json
import logging
import math
import os
from typing import Iterator, Sequence

import numpy as np

_LOG = logging.getLogger("fastdup_spark.membership")

_BIN_NAME = "membership_bloom.bin"
_SIDECAR = "membership_bloom"          # store.write_json / read_json name
_DRIVER_REBUILD_MAX = 5_000_000        # ids collected for a driver rebuild
_MIN_CAPACITY = 1 << 20
_FPP = 0.01

_C_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_C_SALT2 = np.uint64(0xD6E8FEB86659FD93)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain PRNG family): full-avalanche
    mix so sequential/structured ids spread over the whole bit range."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(ids: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) int64 probe positions; ``n_bits`` MUST be a power of two
    (mask instead of modulo). Double hashing: h2 forced odd so the probe
    sequence has full period in a power-of-two table."""
    x = ids.astype(np.int64, copy=False).view(np.uint64)
    h1 = _splitmix(x + _C_GOLDEN)
    h2 = _splitmix(x ^ _C_SALT2) | np.uint64(1)
    j = np.arange(n_hashes, dtype=np.uint64)
    pos = (h1[:, None] + j[None, :] * h2[:, None]) & np.uint64(n_bits - 1)
    return pos.astype(np.int64)


def _sized(capacity: int, fpp: float = _FPP) -> tuple[int, int]:
    """Textbook bloom sizing, m rounded UP to a power of two (mask
    addressing); k re-derived from the actual m."""
    m = max(64, int(math.ceil(-capacity * math.log(fpp)
                              / (math.log(2) ** 2))))
    n_bits = 1 << (m - 1).bit_length()
    n_hashes = min(16, max(1, round(n_bits / capacity * math.log(2))))
    return n_bits, int(n_hashes)


class IdBloom:
    """Mutable int64-id Bloom bitmap (numpy uint8 backing)."""

    __slots__ = ("bits", "n_bits", "n_hashes", "capacity")

    def __init__(self, bits: np.ndarray, n_bits: int, n_hashes: int,
                 capacity: int) -> None:
        self.bits = bits
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.capacity = capacity

    @classmethod
    def empty(cls, capacity: int, fpp: float = _FPP) -> "IdBloom":
        capacity = max(int(capacity), _MIN_CAPACITY)
        n_bits, n_hashes = _sized(capacity, fpp)
        return cls(np.zeros(n_bits >> 3, dtype=np.uint8),
                   n_bits, n_hashes, capacity)

    def insert(self, ids: Sequence[int]) -> None:
        if len(ids) == 0:
            return
        pos = _positions(np.asarray(ids, dtype=np.int64),
                         self.n_bits, self.n_hashes)
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.left_shift(1, (pos & 7)).astype(np.uint8))

    def probe(self, ids: Sequence[int]) -> np.ndarray:
        """Boolean mask: True = maybe seen (confirm exactly), False =
        DEFINITELY not inserted."""
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(np.asarray(ids, dtype=np.int64),
                         self.n_bits, self.n_hashes)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)


def lineage_fingerprint(lineage: list[dict]) -> str:
    """md5 over the sorted (file, rows) footer lineage — changes on any
    append, rewrite, or heal of the extracted table."""
    return hashlib.md5(json.dumps(
        sorted((x["file"], x["rows"]) for x in lineage)).encode()).hexdigest()


def _bin_path(store) -> str:
    return os.path.join(store.work_dir, _BIN_NAME)


def load_membership_bloom(store, expect_fingerprint: str):
    """The persisted bitmap, or None unless BOTH guards pass: the
    sidecar's lineage fingerprint equals the caller's current pre-append
    fingerprint, and the bitmap bytes hash to the sidecar's bits_md5."""
    meta = store.read_json(_SIDECAR)
    if not meta or meta.get("fingerprint") != expect_fingerprint:
        return None
    try:
        with open(_bin_path(store), "rb") as f:
            raw = f.read()
    except OSError:
        return None
    if (len(raw) != meta["n_bits"] >> 3
            or hashlib.md5(raw).hexdigest() != meta.get("bits_md5")):
        _LOG.warning("membership bloom bitmap failed integrity check — "
                     "ignoring (will rebuild)")
        return None
    return IdBloom(np.frombuffer(raw, dtype=np.uint8).copy(),
                   meta["n_bits"], meta["n_hashes"], meta["capacity"])


def save_membership_bloom(store, bloom: IdBloom, fingerprint: str,
                          n_rows: int) -> None:
    raw = bloom.bits.tobytes()
    tmp = _bin_path(store) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, _bin_path(store))
    # sidecar LAST: a crash between the two leaves an old sidecar whose
    # fingerprint cannot match the post-append lineage -> safe rebuild
    store.write_json({
        "n_bits": bloom.n_bits, "n_hashes": bloom.n_hashes,
        "capacity": bloom.capacity, "n_rows": int(n_rows),
        "fingerprint": fingerprint,
        "bits_md5": hashlib.md5(raw).hexdigest(),
    }, _SIDECAR)


def drop_membership_bloom(store) -> None:
    """Invalidate (bulk-backfill path: the batch's ids were never on the
    driver, so the bitmap cannot be maintained incrementally; the next
    trickle batch rebuilds)."""
    for p in (os.path.join(store.work_dir, f"{_SIDECAR}.json"),
              _bin_path(store)):
        try:
            os.remove(p)
        except OSError:
            pass


def rebuild_membership_bloom(fd, n_rows: int) -> IdBloom:
    """Fresh bitmap over every committed id (valid AND quarantined) in
    the post-append extracted table. Driver-side for ≤5M ids (one
    column-pruned collect), else distributed: the SAME _positions kernel
    runs inside mapInPandas and the blocks assemble exactly as
    operators/bloom.build_bloom does — the two paths are bit-identical
    (pinned by test)."""
    bloom = IdBloom.empty(2 * max(int(n_rows), 1))
    ids_df = fd.store.read(fd.spark, "extracted").select("doc_id")
    if n_rows <= _DRIVER_REBUILD_MAX:
        bloom.insert(ids_df.toPandas()["doc_id"].to_numpy(dtype=np.int64))
        return bloom
    from fastdup_spark.operators.bloom import assemble_bitmap
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes

    def _explode(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            pos = _positions(pdf["doc_id"].to_numpy(dtype=np.int64),
                             n_bits, n_hashes)
            yield pd.DataFrame({"p": pos.ravel()})

    bits, _ = assemble_bitmap(ids_df.mapInPandas(_explode, "p long"),
                              n_bits)
    bloom.bits = np.frombuffer(bits, dtype=np.uint8).copy()
    return bloom


def maintain_membership_bloom(fd, mem_bloom, committed_ids,
                              lineage_post: list[dict]) -> str:
    """Finalize-tail bitmap upkeep (call AFTER the extracted append).

    * ``committed_ids`` known (driver-ids batch) + a bitmap that was
      valid at update start + capacity headroom → insert + stamp (pure
      driver work, zero Spark jobs).
    * ``committed_ids`` None (bulk backfill) → invalidate; the next
      trickle rebuilds.
    * otherwise (first update, post-crash, capacity overflow) → rebuild
      from the extracted table and stamp.

    Returns the action taken ('insert' | 'rebuild' | 'drop') for
    observability. Never raises on IO problems: the bitmap is an
    accelerator — on failure the worst case is the next batch taking
    the exact scan path.
    """
    store = fd.store
    n_rows = sum(x["rows"] for x in lineage_post)
    try:
        if committed_ids is None:
            drop_membership_bloom(store)
            return "drop"
        fp = lineage_fingerprint(lineage_post)
        if mem_bloom is not None and n_rows <= mem_bloom.capacity:
            mem_bloom.insert(committed_ids)
            save_membership_bloom(store, mem_bloom, fp, n_rows)
            return "insert"
        bloom = rebuild_membership_bloom(fd, n_rows)
        save_membership_bloom(store, bloom, fp, n_rows)
        return "rebuild"
    except Exception:
        _LOG.warning("membership bloom upkeep failed — dropping the "
                     "bitmap (next batch takes the exact scan path)",
                     exc_info=True)
        drop_membership_bloom(store)
        return "drop"
