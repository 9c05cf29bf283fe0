"""Query-surface contracts: similarity()/outliers()/components()/
components_grouped()/doc_stats()/summary()/duplicates()/search()
mirror SURVEY §2 semantics (A1, A8, F3, T3, W1, W4, J1, J11)."""

import pytest
from pyspark.sql import functions as F


def test_similarity_report_columns_and_order(fd):
    sim = fd.similarity()
    cols = set(sim.columns)
    assert {"src", "dst", "jaccard", "url_from", "url_to"} <= cols
    vals = [r["jaccard"] for r in sim.limit(50).collect()]
    assert vals == sorted(vals, reverse=True)  # T1: sorted desc


def test_similarity_limit_plans_top_n(fd):
    """similarity(limit=N) must plan TakeOrderedAndProject (per-partition
    top-N + merge), NOT a global range-sort shuffle — the scale-safe head
    path (round-5 verdict #7). The default (unbounded) path keeps the
    sorted-export contract and therefore a global Sort."""
    limited = fd.similarity(limit=5)
    plan = limited._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    rows = limited.collect()
    assert len(rows) <= 5
    vals = [r["jaccard"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # limited head == head of the full sorted export (same ordering keys)
    full_head = [(r["src"], r["dst"]) for r in fd.similarity().limit(5).collect()]
    assert [(r["src"], r["dst"]) for r in rows] == full_head
    # sort=False: no ordering operators at all
    plan_ns = fd.similarity(sort=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan_ns
    assert "Sort " not in plan_ns


def test_outliers_report(fd):
    out = fd.outliers()
    n_docs = fd.docs().count()
    n = out.count()
    assert n == int(n_docs * fd.config.outlier_pct)
    assert {"doc_id", "best_sim", "best_nn", "url"} <= set(out.columns)
    # outliers are the docs with the weakest best-neighbor similarity
    mx = out.agg(F.max("best_sim")).first()[0]
    assert mx <= fd.config.threshold


def test_components_drop_singletons(fd):
    comps = fd.components()
    assert comps.filter("count < 2").count() == 0
    with_single = fd.components(include_singletons=True)
    assert with_single.count() > comps.count()


def test_components_grouped_contract(fd):
    g = fd.components_grouped(min_size=2, limit=10)
    rows = g.collect()
    assert len(rows) <= 10
    sizes = [r["count"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)  # T3 sort by size desc
    for r in rows:
        assert len(r["urls"]) == r["count"]
        assert len(r["doc_ids"]) == r["count"]
        assert r["urls"] == sorted(r["urls"])


def test_components_grouped_member_cap(spark, tmp_path):
    """Round-2 verdict item #6: a planted 10k-member clique must yield a
    capped member array (first max_members in sorted order) while `count`
    stays the true size — one mega-component must not OOM a row."""
    from fastdup_spark import FastdupSpark

    fd_ = FastdupSpark(spark, str(tmp_path / "w"))
    ch = fd_.config.config_hash()
    n = 10_000
    ext = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.format_string("https://h/%05d", "id").alias("url"),
        F.lit("2024-01-01 00:00:00").alias("warc_ts"),
        F.lit("en").alias("lang"), F.lit("t").alias("text"),
        F.lit("").alias("error_code"), F.lit(True).alias("is_valid"))
    fd_.store.write(ext, "extracted", ch)
    asg = spark.range(n).select(F.col("id").alias("doc_id"),
                                F.lit(0).alias("component_id"))
    fd_.store.write(asg, "assignments", ch)
    fd_.store.write(
        spark.createDataFrame([(0, n)], "component_id long, count long"),
        "component_info", ch)

    row = fd_.components_grouped(max_members=100).collect()[0]
    assert row["count"] == n
    assert len(row["urls"]) == 100 and len(row["doc_ids"]) == 100
    assert row["urls"] == sorted(row["urls"])
    assert row["urls"][0] == "https://h/00000"
    assert row["doc_ids"] == list(range(100))


def test_duplicates_decision_table(fd):
    dups = fd.duplicates()
    asg = fd.store.read(fd.spark, "assignments")
    sizes = asg.groupBy("component_id").count().filter("count >= 2")
    expected = sizes.agg(F.sum(F.col("count") - 1)).first()[0]
    assert dups.count() == expected
    # survivors (min doc_id per component) never appear
    mins = {r["m"] for r in asg.join(sizes, "component_id")
            .groupBy("component_id").agg(F.min("doc_id").alias("m")).collect()}
    listed = {r["doc_id"] for r in dups.collect()}
    assert mins.isdisjoint(listed)


def test_doc_stats_columns(fd):
    st = fd.doc_stats()
    need = {"doc_id", "n_chars", "n_tokens", "n_lines", "distinct_token_ratio",
            "repeated_line_ratio", "digit_ratio", "punct_ratio", "avg_token_len"}
    assert need <= set(st.columns)
    assert st.filter("n_chars <= 0").count() == 0


def test_component_pairs_hierarchical(fd):
    cp = fd.component_pairs()
    assert {"comp_a", "comp_b", "max_jaccard", "n_edges"} <= set(cp.columns)
    assert cp.filter("comp_a >= comp_b").count() == 0


def test_search_finds_duplicates(fd, data):
    """Probing the index with a planted exact-dup text returns its copies."""
    tp = data.truth_pairs
    exact = tp[tp.kind == "exact"].iloc[0]
    texts = dict(zip(data.pages["url"], data.pages["text"]))
    res = fd.search(texts[exact.src_url], k=5).collect()
    urls = {r["url"] for r in res}
    assert exact.src_url in urls and exact.dst_url in urls
    top = res[0]
    assert top["jaccard"] == 1.0


def test_quarantine_table(fd, data):
    q = fd.quarantine()
    n_bad = (data.pages["text"] == "").sum()
    assert q.count() == n_bad
    assert {"url", "warc_ts", "error_code"} <= set(q.columns)


def test_export_csv(fd, tmp_path):
    out = str(tmp_path / "sim_csv")
    fd.export("similarity", out, fmt="csv")
    import glob
    files = glob.glob(out + "/*.csv")
    assert files
    header = open(files[0]).readline().strip().split(",")
    assert {"src", "dst", "jaccard"} <= set(header)


def test_cosine_topk_bruteforce(spark):
    from fastdup_spark.operators.knn import cosine_topk_bruteforce
    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    top = cosine_topk_bruteforce(e, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert top[0]["cosine"] == 1.0


def test_knn_truncation_contract(fd):
    """W2: the knn stage keeps <= nearest_neighbors_k rows per doc (reference
    similarity.csv contract, /root/reference/fastdup/__init__.py:486,574)."""
    kn = fd.knn()
    assert {"doc_id", "nn", "sim", "rank", "url", "url_nn"} <= set(kn.columns)
    per_doc = kn.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= fd.config.knn_k
    ranks = kn.select("rank").distinct().collect()
    assert all(1 <= r["rank"] <= fd.config.knn_k for r in ranks)


def test_search_many_matches_per_query_search(fd, data):
    """Round-2 verdict item #3: the batched set-vs-corpus probe must return
    exactly what per-query fd.search() returns, query by query — same
    candidates (same band join), same exact-Jaccard verify, same top-k."""
    texts = dict(zip(data.pages["url"], data.pages["text"]))
    tp = data.truth_pairs
    qurls = list(tp[tp.kind == "exact"].src_url[:3]) + \
        list(tp[tp.kind == "near"].src_url[:2])
    queries = fd.spark.createDataFrame(
        [(i, texts[u]) for i, u in enumerate(qurls)],
        "query_id long, text string")
    batched = fd.search_many(queries, k=5).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["jaccard"]))
    for qid, url in enumerate(qurls):
        single = fd.search(texts[url], k=5).collect()
        want = [(i + 1, r["doc_id"], round(r["jaccard"], 6))
                for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        got = [(rk, d, round(j, 6)) for rk, d, j in got]
        assert got == want, f"query {qid} ({url})"


def test_search_long_query_doc(fd):
    """A ~20k-token query must not blow up the plan (query shingles ride as
    a broadcast 1-row relation, not a literal expression tree)."""
    import random
    rng = random.Random(12)
    long_query = " ".join(f"q{rng.randrange(10**7)}" for _ in range(20_000))
    res = fd.search(long_query, k=3).collect()
    assert isinstance(res, list)  # no matches expected; must run cleanly


def test_write_deduped_corpus(fd, tmp_path):
    """write_deduped materializes the cleaned corpus: exactly the W4
    non-survivors are gone, survivors keep one doc per component."""
    out = str(tmp_path / "clean")
    stats = fd.write_deduped(out)
    clean = fd.spark.read.parquet(out)
    assert clean.count() == stats["kept"]
    assert stats["kept"] + stats["dropped"] == fd.docs().count()
    # no component of size >= 2 retains more than one member
    asg = fd.store.read(fd.spark, "assignments")
    per_comp = (clean.select("doc_id").join(asg, "doc_id")
                .groupBy("component_id").count()
                .agg(F.max("count")).first()[0])
    assert per_comp == 1
    # and the kept member is the min doc_id of its component
    kept_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    mins = asg.groupBy("component_id").agg(F.min("doc_id").alias("m")).collect()
    assert all(r["m"] in kept_ids for r in mins)


def test_decontaminate_api(fd, spark):
    """fd.decontaminate: a doc quoting an eval sentence is flagged; an
    unrelated eval text flags nothing extra."""
    doc = fd.docs().select("doc_id", "text").first()
    words = doc["text"].split()[:13]
    assert len(words) == 13, "fixture doc long enough for a 13-gram"
    ev = spark.createDataFrame(
        [(" ".join(words),), ("totally unrelated eval sentence here",)],
        ["text"])
    out = fd.decontaminate(ev, n=13).collect()
    ids = {r.doc_id for r in out}
    assert doc["doc_id"] in ids
    assert all(r.n_matched_ngrams >= 1 for r in out)
    assert {"doc_id", "url", "n_matched_ngrams"} <= {c for c in
                                                     out[0].asDict()}


def test_scrub_pii_api(fd):
    out = fd.scrub_pii()
    assert {"doc_id", "url", "n_emails", "n_ips", "n_phones", "clean_text"} \
        <= set(out.columns)
    # the fixture corpus is synthetic word salad: no PII anywhere
    assert out.filter("n_emails + n_ips + n_phones > 0").count() == 0
    assert out.count() == fd.docs().count()


def test_blocklist_api(fd):
    vocab_word = fd.docs().first()["text"].split()[0]
    out = fd.blocklist([vocab_word, "zzz-never-present"])
    assert out.filter("blocked").count() > 0
    assert out.filter("matched like '%zzz%'").count() == 0


def test_semdedup_api(fd):
    """fd.semdedup over the default doc_stats metric vectors: one decision
    row per doc, exactly one survivor per component, kmeans reused."""
    res = fd.semdedup(threshold=0.999, k=4, n_iter=2)
    dec = res["decisions"]
    assert set(dec.columns) == {"doc_id", "cluster", "component_id",
                                "distance", "is_survivor"}
    n_docs = fd.docs().count()
    assert dec.count() == n_docs
    bad = (dec.groupBy("component_id")
           .agg(F.sum(F.col("is_survivor").cast("int")).alias("s"))
           .filter("s != 1").count())
    assert bad == 0
    # edges live within clusters only
    asg = {r["doc_id"]: r["cluster"] for r in res["assignments"].collect()}
    for r in res["edges"].limit(50).collect():
        assert asg[r["src"]] == asg[r["dst"]]


def test_remove_spans_api(fd):
    """fd.remove_spans: one row per valid doc; fixture dup clusters share
    long verbatim runs, so spans ARE found and erased symmetrically."""
    n_docs = fd.docs().count()
    out = fd.remove_spans(k=10)
    assert out.count() == n_docs
    assert set(out.columns) == {"doc_id", "url", "clean_text", "n_tokens",
                                "n_dropped", "n_spans", "kept"}
    hit = out.filter("n_dropped > 0")
    assert hit.count() > 0
    assert out.filter("n_spans > 0").count() == hit.count()


def test_remove_lines_api(fd):
    n_docs = fd.docs().count()
    out = fd.remove_lines()
    assert out.count() == n_docs
    assert "chars_dropped" in out.columns


def test_pack_api(fd):
    n_docs = fd.docs().count()
    out = fd.pack(capacity=512, n_shards=4).collect()
    assert len(out) == n_docs
    # every non-oversize bin fits
    fills = {}
    for r in out:
        fills.setdefault((r["shard"], r["bin"]), [0, False])
        fills[(r["shard"], r["bin"])][0] += r["n_tokens"]
        fills[(r["shard"], r["bin"])][1] |= r["oversize"]
    assert all(f <= 512 or over for f, over in fills.values())


def test_learn_bpe_api(fd):
    from fastdup_spark.operators.bpe import segment_expr
    merges, words = fd.learn_bpe(5)
    assert 0 < len(merges) <= 5
    assert merges[0].pair_count >= merges[-1].pair_count
    # learned table re-applies cleanly to the training words
    seg = words.select(
        "symbols",
        F.array_join(segment_expr(F.col("word"), merges), " ").alias("re"))
    assert seg.filter("re != symbols").count() == 0


def test_dsir_api(fd, spark):
    # target = a slice of the corpus itself: its docs must rank on top
    target = fd.docs().filter("doc_id % 11 = 0").select("text")
    out = fd.dsir(target, n=20)
    rows = out.collect()
    assert len(rows) == 20
    assert {"doc_id", "url", "score_micro", "rank"} <= {c for c in out.columns}
    # resampling mode returns gumbel keys instead of ranks
    rs = fd.dsir(target, n=10, resample_salt="s1")
    assert rs.count() == 10 and "gumbel_key" in rs.columns


def test_keep_longest_policy(fd, spark):
    from fastdup_spark.operators.dedup import keep_best_policy
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 9), (3, 10, 9), (4, 20, 1)],
        "doc_id bigint, component_id bigint, score int")
    kept = {r["doc_id"] for r in keep_best_policy(df, "score")
            .filter("keep").collect()}
    assert kept == {2, 4}  # max score wins, tie -> min doc_id

    # engine path: keep="longest" keeps the longest member per cluster
    drops = fd.duplicates(keep="longest")
    asg = fd.components()
    lens = {r["doc_id"]: r["n"] for r in
            fd.docs().select("doc_id", F.length("text").alias("n")).collect()}
    comp = {}
    for r in asg.collect():
        comp.setdefault(r["component_id"], []).append(r["doc_id"])
    dropped = {r["doc_id"] for r in drops.collect()}
    for cid, members in comp.items():
        if len(members) < 2:
            continue
        survivor = [d for d in members if d not in dropped]
        assert len(survivor) == 1
        best = max(members, key=lambda d: (lens.get(d, -1), -d))
        assert survivor[0] == best, cid
    with pytest.raises(ValueError):
        fd.duplicates(keep="nope")
