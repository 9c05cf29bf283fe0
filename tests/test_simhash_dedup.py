"""SimHash banding dedup: pigeonhole completeness + e2e on the corpus."""

from pyspark.sql import functions as F

from fastdup_spark.operators.simhash_dedup import simhash_blocks, simhash_near_dup


def test_pigeonhole_completeness(spark):
    """Every pair within hamming 3 MUST be found (exact guarantee, not LSH
    probability): exhaustive check on crafted fingerprints."""
    base = 0x0123456789ABCDEF
    rows = [(0, base)]
    # flip 1..3 bits -> within distance 3 of base
    rows.append((1, base ^ 0x1))
    rows.append((2, base ^ (1 << 20) ^ (1 << 40)))
    rows.append((3, base ^ (1 << 5) ^ (1 << 25) ^ (1 << 63)))
    # far away (distance >> 3)
    rows.append((9, base ^ 0xFFFF0000FFFF))
    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v
    df = spark.createDataFrame([(i, to_i64(v)) for i, v in rows], "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=3, bands=4)
    edges = {(r["src"], r["dst"]) for r in res["edges"].collect()}
    for other in (1, 2, 3):
        assert (0, other) in edges, f"missed pair (0,{other})"
    assert not any(9 in e for e in edges)


def test_identical_fp_megagroup_stays_linear(spark):
    """Round-2 verdict item #2: 10k docs with ONE identical simhash must not
    produce ~10k^2/2 candidates. Pre-grouping collapses them to a single
    representative: zero rep-level candidates, 9999 linear star edges, and
    one 10k-component in assignments."""
    n = 10_000
    rows = [(i, 0x0123456789ABCDEF - (1 << 63)) for i in range(n)]
    rows.append((n, 0x7FFFFFFF00000000))  # one far-away doc
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=3, bands=4)
    assert res["candidates"].count() <= 1  # reps only: at most the far pair
    assert res["star_edges"].count() == n - 1
    sizes = sorted(r["c"] for r in res["assignments"]
                   .groupBy("component_id").agg(F.count("*").alias("c"))
                   .collect())
    assert sizes == [1, n]


def test_combination_keys_pigeonhole(spark):
    """Manku-style wide keys (n_blocks=6, key_blocks=3, so 20 tables of
    ~32-bit keys) must still find every pair within max_hamming=3."""
    base = 0x0123456789ABCDEF

    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(0, base),
            (1, base ^ 0x1),
            (2, base ^ (1 << 20) ^ (1 << 40)),
            (3, base ^ (1 << 5) ^ (1 << 25) ^ (1 << 63)),
            (9, base ^ 0xFFFF0000FFFF)]
    df = spark.createDataFrame([(i, to_i64(v)) for i, v in rows],
                               "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=3, bands=6, key_blocks=3)
    edges = {(r["src"], r["dst"]) for r in res["edges"].collect()}
    for other in (1, 2, 3):
        assert (0, other) in edges, f"missed pair (0,{other})"
    assert not any(9 in e for e in edges)


def test_blocks_shape(spark):
    df = spark.createDataFrame([(1, 12345)], "doc_id long, simhash long")
    b = simhash_blocks(df, bands=4).collect()
    assert len(b) == 4
    assert {r["band_id"] for r in b} == {0, 1, 2, 3}
    assert all(0 <= r["block"] < (1 << 16) for r in b)


def test_simhash_dedup_finds_exact_dups(fd, url_of, data):
    """Exact duplicates have identical fingerprints -> hamming 0 -> clustered."""
    sigs = fd.store.read(fd.spark, "signatures").select("doc_id", "simhash")
    res = simhash_near_dup(sigs, max_hamming=3, bands=4)
    asg = {r["doc_id"]: r["component_id"] for r in res["assignments"].collect()}
    _, url2id = url_of
    tp = data.truth_pairs
    exact = tp[tp.kind == "exact"]
    hit = sum(asg[url2id[r.src_url]] == asg[url2id[r.dst_url]] for _, r in exact.iterrows())
    assert hit / len(exact) >= 0.99


def test_residual_block_salting_bounds_candidates(spark):
    """Distinct fingerprints that share one 16-bit block form a residual
    mega-block; with a small max_block_size the salting cap must bound the
    candidate count far below the ~n^2/2 all-pairs blowup. (Salting trades
    the pigeonhole guarantee inside oversized blocks — the documented fix
    at scale is key_blocks, this is the backstop.)"""
    n = 400
    # low 16 bits constant (block 0 collides for all); high bits distinct
    # and far apart in hamming, so no true near-pairs exist
    rows = [(i, (i * 0x9E3779B97F4A7C15) & ~0xFFFF | 0xABCD) for i in range(n)]

    def to_i64(v):
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame([(i, to_i64(v)) for i, v in rows],
                               "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=3, bands=4, key_blocks=1,
                           max_block_size=20, salt_target=10)
    n_cand = res["candidates"].count()
    assert n_cand < n * 30, f"candidates {n_cand} not bounded by salting"
    assert res["edges"].count() == 0  # none of these are true near-dups


def _skewed_corpus(spark, n=400, with_close_pair=True):
    """Distinct fps all sharing the low 16-bit block (a planted mega-block
    for the (4,1) scheme) + one planted hamming-3 pair in the high bits."""
    def to_i64(v):
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(i, to_i64((i * 0x9E3779B97F4A7C15) & ~0xFFFF | 0xABCD))
            for i in range(n)]
    if with_close_pair:
        base = rows[7][1]
        rows.append((n, to_i64(base ^ (1 << 30) ^ (1 << 45) ^ (1 << 60))))
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_auto_key_blocks_escalates_on_skew(spark):
    """key_blocks=None (round-3 verdict item #3): a mega-block that the
    (bands=4, kb=1) scheme would have to SALT (trading the pigeonhole
    guarantee) instead escalates to a Manku wide-key scheme with ZERO
    salted blocks — and still finds the planted hamming-3 pair that
    salting could have separated."""
    df = _skewed_corpus(spark)
    res = simhash_near_dup(df, max_hamming=3, bands=4,
                           max_block_size=20, salt_target=10)
    p = res["params"]
    assert p["key_blocks"] >= 2
    assert p["bands"] - p["max_hamming"] >= p["key_blocks"]  # guarantee holds
    mx = res["block_stats"].agg(F.max("bucket_size")).first()[0] or 0
    assert mx <= 20, f"auto scheme still has salted blocks (max {mx})"
    edges = {frozenset((r["src"], r["dst"])) for r in res["edges"].collect()}
    assert frozenset((7, 400)) in edges, "planted hamming-3 pair missed"


def test_auto_key_blocks_stays_at_one_when_unskewed(spark):
    """On a well-spread corpus the auto scheme keeps the cheap (4,1)
    tables — no extra join tables for data that doesn't need them."""
    rows = [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=3, bands=4)
    assert res["params"] == {"bands": 4, "key_blocks": 1, "max_hamming": 3,
                             "max_block_size": 5000}


def test_auto_kb_guards_guaranteeless_first_probe(spark):
    """Round-4 ADVICE (low): key_blocks=None with bands <= max_hamming
    (e.g. max_hamming=4, bands=4) gave the kb=1 probe no pigeonhole
    guarantee — pairs within distance 4 were silently missed unless a
    block happened to trip salting. The auto path must substitute the
    Manku scheme and find every such pair."""
    base = 0x0123456789ABCDEF

    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    # distance exactly 4 from base: with bands=4 each of the 4 16-bit
    # blocks differs -> NO shared kb=1 key; only a valid scheme finds it
    rows = [(0, base),
            (1, base ^ (1 << 3) ^ (1 << 19) ^ (1 << 35) ^ (1 << 51)),
            (9, base ^ 0xFFFF0000FFFF)]
    df = spark.createDataFrame([(i, to_i64(v)) for i, v in rows],
                               "doc_id long, simhash long")
    res = simhash_near_dup(df, max_hamming=4, bands=4, key_blocks=None)
    edges = {(r["src"], r["dst"]) for r in res["edges"].collect()}
    assert (0, 1) in edges, "distance-4 pair missed by the auto scheme"
    params = res["params"]
    assert params["bands"] - params["max_hamming"] >= params["key_blocks"]
