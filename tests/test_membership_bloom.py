"""Persisted membership Bloom bitmap (streaming/membership.py).

The bitmap is an accelerator, never an oracle: definitely-new skips the
extracted scan (exact iff the bitmap holds every committed id — lineage
fingerprint guard), maybe-seen confirms via the shard-pruned scan. These
tests pin the unit laws, the build-path bit-identity, the update-path
integration (fast path engaged, results identical to the scan path),
and the crash/bulk invalidation tripwires."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.fixtures.pages import pages_schema
from fastdup_spark.streaming import membership as mem
from fastdup_spark.streaming.incremental import incremental_update


# --------------------------------------------------------------- unit ----

def test_idbloom_laws():
    b = mem.IdBloom.empty(1_000_000)
    assert b.n_bits & (b.n_bits - 1) == 0  # power of two (mask addressing)
    ids = np.arange(-5000, 5000, dtype=np.int64) * 7919
    b.insert(ids)
    # NO false negatives, ever
    assert b.probe(ids).all()
    # false positives bounded near the sized fpp (capacity 1M, n 10k:
    # effectively zero load -> essentially none)
    novel = np.arange(10_000, dtype=np.int64) * 104729 + 13
    novel = novel[~np.isin(novel, ids)]
    assert b.probe(novel).mean() < 0.01
    assert b.probe([]).shape == (0,)


def test_positions_avalanche_on_sequential_ids():
    """Sequential ids (the xxhash64-id worst case is structured input)
    must spread: no probe column may collapse to few distinct values."""
    pos = mem._positions(np.arange(10_000, dtype=np.int64), 1 << 20, 7)
    for j in range(pos.shape[1]):
        assert len(np.unique(pos[:, j])) > 9_900
    assert pos.min() >= 0 and pos.max() < (1 << 20)


def test_persistence_roundtrip_and_guards(tmp_path):
    from fastdup_spark.plans.store import StageStore

    store = StageStore(str(tmp_path / "wd"))
    b = mem.IdBloom.empty(1 << 20)
    b.insert([1, 2, 3])
    mem.save_membership_bloom(store, b, "fp-a", n_rows=3)
    got = mem.load_membership_bloom(store, "fp-a")
    assert got is not None and bytes(got.bits) == bytes(b.bits)
    assert got.probe([1, 2, 3]).all()
    # wrong fingerprint -> rejected
    assert mem.load_membership_bloom(store, "fp-b") is None
    # torn bitmap file -> rejected by bits_md5
    with open(mem._bin_path(store), "r+b") as f:
        f.seek(10)
        f.write(b"\xff")
    assert mem.load_membership_bloom(store, "fp-a") is None
    # drop is idempotent
    mem.drop_membership_bloom(store)
    mem.drop_membership_bloom(store)
    assert store.read_json(mem._SIDECAR) is None


def test_lineage_fingerprint_sensitivity():
    base = [{"file": "a", "rows": 5}, {"file": "b", "rows": 7}]
    assert mem.lineage_fingerprint(base) == \
        mem.lineage_fingerprint(list(reversed(base)))  # order-free
    assert mem.lineage_fingerprint(base) != \
        mem.lineage_fingerprint([{"file": "a", "rows": 5},
                                 {"file": "b", "rows": 8}])


# ------------------------------------------------------ integration ----

def _pages(spark, n, start=0):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(start, start + n):
        text = " ".join(f"mb{i}x{j}" for j in range(60))
        rows.append((f"https://mb{i}.example.com/",
                     base + datetime.timedelta(minutes=i),
                     f"<html><p>{text}</p></html>".encode(),
                     text, "en"))
    return spark.createDataFrame(rows, pages_schema())


def test_update_path_engages_and_matches_scan_path(spark, tmp_path):
    """update #1 (no bitmap yet) takes the scan path and rebuilds; update
    #2 probes the bitmap with ZERO flagged ids (all-new batch — no
    extracted read at all); redelivery flags everything, confirms via the
    pruned scan, and noops. Final tables equal a from-scratch run."""
    fd = FastdupSpark(spark, str(tmp_path / "fast"))
    fd.run(_pages(spark, 20))
    assert fd.store.read_json(mem._SIDECAR) is None  # run() builds none

    d1 = {}
    s1 = incremental_update(fd, _pages(spark, 10, start=100), _debug=d1)
    assert d1["membership"] == "broadcast" and s1["new_docs"] == 10
    meta = fd.store.read_json(mem._SIDECAR)
    assert meta and meta["n_rows"] == 30  # finalize rebuilt + stamped

    d2 = {}
    s2 = incremental_update(fd, _pages(spark, 10, start=200), _debug=d2)
    assert d2["membership"] == "bloom"
    assert d2["bloom_flagged"] == 0
    assert "no scan" in d2["membership_plan"]
    assert s2["new_docs"] == 10 and s2["path"] == "clean"
    assert fd.store.read_json(mem._SIDECAR)["n_rows"] == 40

    # redelivery: every id flagged (no false negatives), exact confirm
    # drops them all -> noop
    d3 = {}
    s3 = incremental_update(fd, _pages(spark, 10, start=200), _debug=d3)
    assert d3["membership"] == "bloom" and d3["bloom_flagged"] == 10
    assert "parquet" in d3["membership_plan"].lower() or \
        "Relation" in d3["membership_plan"]  # the confirm scan ran
    assert s3["new_docs"] == 0 and s3["path"] == "noop"

    # bit-identity vs a from-scratch run over everything
    fd_full = FastdupSpark(spark, str(tmp_path / "full"))
    fd_full.run(_pages(spark, 20).unionByName(_pages(spark, 10, start=100))
                .unionByName(_pages(spark, 10, start=200)))
    for stage, cols in (("extracted", ("doc_id",)),
                        ("signatures", ("doc_id",)),
                        ("assignments", ("doc_id", "component_id")),
                        ("component_info", ("component_id", "count"))):
        a = {tuple(r[c] for c in cols)
             for r in fd.store.read(spark, stage).collect()}
        b = {tuple(r[c] for c in cols)
             for r in fd_full.store.read(spark, stage).collect()}
        assert a == b, stage


def test_crash_before_stamp_invalidates_then_heals(spark, tmp_path):
    """A crash AFTER the extracted append but BEFORE the bitmap stamp
    leaves a bitmap missing committed ids. The fingerprint guard must
    reject it (fallback to the exact scan — no duplicate rows ever), and
    the healing update re-stamps so the NEXT batch is fast again."""
    import fastdup_spark.streaming.incremental as inc

    fd = FastdupSpark(spark, str(tmp_path / "crash"))
    fd.run(_pages(spark, 12))
    incremental_update(fd, _pages(spark, 6, start=50))  # builds bitmap

    real = inc._finalize_bookkeeping

    def boom(*a, **k):
        raise RuntimeError("crash before bloom stamp")

    inc._finalize_bookkeeping = boom
    try:
        with pytest.raises(RuntimeError):
            incremental_update(fd, _pages(spark, 6, start=60))
    finally:
        inc._finalize_bookkeeping = real

    # extracted grew without a bitmap stamp -> loader must reject
    d = {}
    st = incremental_update(fd, _pages(spark, 6, start=60), _debug=d)
    assert d["membership"] == "broadcast"  # bloom invalid: exact scan
    assert st["new_docs"] == 0  # redelivered batch DID commit pre-crash
    assert st["path"] in ("heal_rebuild", "full_rebuild")
    # healed + re-stamped: next batch rides the bitmap again
    d2 = {}
    st2 = incremental_update(fd, _pages(spark, 6, start=70), _debug=d2)
    assert d2["membership"] == "bloom" and st2["new_docs"] == 6
    # no duplicate doc rows anywhere
    ext = fd.store.read(spark, "extracted")
    assert ext.count() == ext.select("doc_id").distinct().count() == 30


def test_bulk_batch_drops_bitmap_then_trickle_rebuilds(
        spark, tmp_path, monkeypatch):
    import fastdup_spark.streaming.incremental as inc

    fd = FastdupSpark(spark, str(tmp_path / "bulk"))
    fd.run(_pages(spark, 10))
    incremental_update(fd, _pages(spark, 5, start=40))  # builds bitmap
    assert fd.store.read_json(mem._SIDECAR) is not None

    # bulk path (ids never on the driver): bitmap cannot be maintained
    monkeypatch.setattr(inc, "_DRIVER_IDS_MAX", 1)
    d = {}
    st = incremental_update(fd, _pages(spark, 5, start=60), _debug=d)
    assert d["membership"] == "broadcast" and st["new_docs"] == 5
    assert fd.store.read_json(mem._SIDECAR) is None  # invalidated
    monkeypatch.undo()

    d2 = {}
    st2 = incremental_update(fd, _pages(spark, 5, start=80), _debug=d2)
    assert st2["new_docs"] == 5
    assert fd.store.read_json(mem._SIDECAR)["n_rows"] == 25  # rebuilt
    d3 = {}
    incremental_update(fd, _pages(spark, 5, start=90), _debug=d3)
    assert d3["membership"] == "bloom"


def test_distributed_rebuild_bit_identical_to_driver(
        spark, tmp_path, monkeypatch):
    """The mapInPandas rebuild (big-corpus path) must produce the exact
    bitmap the driver-side insert produces — same _positions kernel."""
    fd = FastdupSpark(spark, str(tmp_path / "dist"))
    fd.run(_pages(spark, 25))
    lineage = fd.store._parquet_lineage(fd.store.table_path("extracted"))
    n = sum(x["rows"] for x in lineage)

    b_driver = mem.rebuild_membership_bloom(fd, n)
    monkeypatch.setattr(mem, "_DRIVER_REBUILD_MAX", 0)
    b_dist = mem.rebuild_membership_bloom(fd, n)
    assert bytes(b_driver.bits) == bytes(b_dist.bits)
    assert (b_driver.n_bits, b_driver.n_hashes) == \
        (b_dist.n_bits, b_dist.n_hashes)
    ids = [r["doc_id"] for r in
           fd.store.read(spark, "extracted").select("doc_id").collect()]
    assert b_dist.probe(ids).all()
