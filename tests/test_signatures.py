"""Shingle/MinHash/SimHash determinism and oracle equality (FIXTURES.md §C)."""

import numpy as np
from pyspark.sql import functions as F

from fastdup_spark.config import PipelineConfig
from fastdup_spark.functions.signatures import (
    make_minhash_udf, make_simhash_udf, minhash_numpy, minhash_params,
    normalize_tokens_expr, shingles_expr, simhash_numpy,
)

CFG = PipelineConfig()


def _sig_df(spark, texts, repartition=None):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    if repartition:
        df = df.repartition(repartition)
    mh = make_minhash_udf(CFG.n_perm, CFG.minhash_seed)
    sh = make_simhash_udf()
    return (
        df.withColumn("tokens", normalize_tokens_expr(F.col("text")))
        .withColumn("shingles", shingles_expr(F.col("tokens"), CFG.shingle_k))
        .withColumn("minhash", mh("shingles"))
        .withColumn("simhash", sh("shingles"))
    )


def test_shingles_match_python_oracle(spark):
    """Spark k-gram construction == pure-python windowing (hashes computed by
    the same xxhash64 on the oracle's shingle strings)."""
    text = "a b c d e f g h i j k l m n o p"
    toks = text.split(" ")
    k = CFG.shingle_k
    oracle_strings = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    oracle_hashes = {
        r["h"] for r in spark.createDataFrame([(s,) for s in oracle_strings], "s string")
        .select(F.xxhash64("s").alias("h")).collect()
    }
    got = set(_sig_df(spark, [text]).select("shingles").first()[0])
    assert got == oracle_hashes


def test_short_doc_single_shingle(spark):
    row = _sig_df(spark, ["only three words"]).select("shingles").first()
    assert len(row[0]) == 1


def test_empty_text(spark):
    row = _sig_df(spark, [""]).select("shingles", "minhash", "simhash").first()
    assert row["shingles"] == []
    assert row["simhash"] == 0
    from fastdup_spark.functions.signatures import EMPTY_SENTINEL
    assert all(v == EMPTY_SENTINEL for v in row["minhash"])


def test_minhash_partitioning_invariance(spark, data):
    texts = [t for t in data.pages["text"].head(60) if t]
    a = {r["doc_id"]: r["minhash"] for r in _sig_df(spark, texts, 1).select("doc_id", "minhash").collect()}
    b = {r["doc_id"]: r["minhash"] for r in _sig_df(spark, texts, 8).select("doc_id", "minhash").collect()}
    assert a == b


def test_minhash_udf_matches_driver_numpy(spark, data):
    texts = [t for t in data.pages["text"].head(10) if t]
    rows = _sig_df(spark, texts).select("shingles", "minhash").collect()
    a, b = minhash_params(CFG.n_perm, CFG.minhash_seed)
    for r in rows:
        expect = minhash_numpy(np.asarray(r["shingles"], dtype=np.int64), a, b)
        assert list(expect) == list(r["minhash"])


def test_minhash_estimates_jaccard(spark, data):
    """Signature agreement ≈ true Jaccard for planted near-dup pairs."""
    tp = data.truth_pairs
    near = tp[tp.kind == "near"].head(20)
    texts = dict(zip(data.pages["url"], data.pages["text"]))
    urls = sorted(set(near["src_url"]) | set(near["dst_url"]))
    df = _sig_df(spark, [texts[u] for u in urls])
    sigs = {urls[r["doc_id"]]: np.asarray(r["minhash"]) for r in df.select("doc_id", "minhash").collect()}
    for _, row in near.iterrows():
        est = float((sigs[row.src_url] == sigs[row.dst_url]).mean())
        assert abs(est - row.true_jaccard) < 0.15, (est, row.true_jaccard)


def test_simhash_hamming_bound_for_near_dups(spark, data):
    tp = data.truth_pairs
    near = tp[(tp.kind == "near") & (tp.true_jaccard < 1.0)].head(15)
    texts = dict(zip(data.pages["url"], data.pages["text"]))
    urls = sorted(set(near["src_url"]) | set(near["dst_url"]))
    df = _sig_df(spark, [texts[u] for u in urls])
    fps = {urls[r["doc_id"]]: r["simhash"] for r in df.select("doc_id", "simhash").collect()}
    for _, row in near.iterrows():
        ham = bin((fps[row.src_url] ^ fps[row.dst_url]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16, f"near-dup hamming {ham} too large"


def test_simhash_numpy_deterministic():
    sh = np.array([1, 2, 3, -5, 1 << 40], dtype=np.int64)
    assert simhash_numpy(sh) == simhash_numpy(sh.copy())
    assert simhash_numpy(np.array([], dtype=np.int64)) == 0


# ---------------------------------------------------------------- fast path

def _fast_df(spark, texts, repartition=None):
    from fastdup_spark.functions.signatures import with_signatures
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    if repartition:
        df = df.repartition(repartition)
    return with_signatures(df, CFG)


def test_fast_path_partitioning_invariance(spark, data):
    texts = [t for t in data.pages["text"].head(50) if t]
    a = {r["doc_id"]: (r["minhash"], r["simhash"], sorted(r["shingles"]))
         for r in _fast_df(spark, texts, 1).select("doc_id", "minhash", "simhash", "shingles").collect()}
    b = {r["doc_id"]: (r["minhash"], r["simhash"], sorted(r["shingles"]))
         for r in _fast_df(spark, texts, 8).select("doc_id", "minhash", "simhash", "shingles").collect()}
    assert a == b


def test_fast_shingles_match_driver_numpy(spark, data):
    """Spark fast-path shingles == driver-side rolling combine over the same
    JVM token hashes."""
    from fastdup_spark.functions.signatures import (
        combine_shingles_numpy, normalize_tokens_expr, shingle_combine_params,
        token_hashes_expr,
    )
    texts = [t for t in data.pages["text"].head(10) if t]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    th_rows = {r["doc_id"]: r["th"] for r in df.select(
        "doc_id", token_hashes_expr(normalize_tokens_expr(F.col("text"))).alias("th")).collect()}
    c = shingle_combine_params(CFG.shingle_k, CFG.minhash_seed)
    got = {r["doc_id"]: sorted(r["shingles"]) for r in
           _fast_df(spark, texts).select("doc_id", "shingles").collect()}
    for i, th in th_rows.items():
        expect = sorted(combine_shingles_numpy(np.asarray(th, dtype=np.int64), c).tolist())
        assert got[i] == expect


def test_fast_path_jaccard_vs_truth(spark, data):
    """Fast-path shingle Jaccard tracks the generator's true token-tuple
    Jaccard for planted near-dups (hash collisions negligible)."""
    tp = data.truth_pairs
    near = tp[tp.kind == "near"].head(10)
    texts = dict(zip(data.pages["url"], data.pages["text"]))
    urls = sorted(set(near["src_url"]) | set(near["dst_url"]))
    sh = {urls[r["doc_id"]]: set(r["shingles"]) for r in
          _fast_df(spark, [texts[u] for u in urls]).select("doc_id", "shingles").collect()}
    for _, row in near.iterrows():
        a, b = sh[row.src_url], sh[row.dst_url]
        j = len(a & b) / len(a | b)
        assert abs(j - row.true_jaccard) < 0.02, (j, row.true_jaccard)
