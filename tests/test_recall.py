"""The headline metric: dup-pair recall >= 0.99 vs truth_pairs at reference
config; boilerplate-heavy false-positive bound; cluster parity (BASELINE.md)."""

from pyspark.sql import functions as F


def _found_pairs(fd):
    return {(r["src"], r["dst"]) for r in
            fd.store.read(fd.spark, "similarity").select("src", "dst").collect()}


def _truth_id_pairs(data, url2id, kinds):
    tp = data.truth_pairs
    out = set()
    for _, row in tp[tp.kind.isin(kinds)].iterrows():
        a, b = url2id[row.src_url], url2id[row.dst_url]
        out.add((min(a, b), max(a, b)))
    return out


def test_dup_pair_recall(fd, url_of, data):
    _, url2id = url_of
    truth = _truth_id_pairs(data, url2id, ["exact", "near"])
    found = _found_pairs(fd)
    recall = len(truth & found) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99"


def test_boilerplate_false_positive_bound(fd, url_of, data):
    """Shared-template pages with distinct bodies must NOT be reported dups."""
    _, url2id = url_of
    boiler = _truth_id_pairs(data, url2id, ["boilerplate"])
    found = _found_pairs(fd)
    fp = len(boiler & found)
    assert fp == 0, f"{fp} boilerplate pairs wrongly clustered"


def test_precision_against_truth(fd, url_of, data):
    """Every emitted similarity edge must be a planted dup pair (synthetic
    singletons share no 9-gram runs, so precision should be 1.0 here)."""
    _, url2id = url_of
    truth = _truth_id_pairs(data, url2id, ["exact", "near", "containment"])
    found = _found_pairs(fd)
    extra = found - truth
    assert len(extra) / max(len(found), 1) <= 0.01, f"{len(extra)} unexpected edges"


def test_cluster_parity(fd, url_of, data):
    """Cluster-assignment parity: each planted exact/near cluster lands in ONE
    component; boilerplate groups never merge (≈ reference assignment match)."""
    _, url2id = url_of
    asg = {r["doc_id"]: r["component_id"] for r in
           fd.store.read(fd.spark, "assignments").collect()}
    tc = data.truth_clusters.merge(
        data.pages[["url"]], on="url")
    tc = tc[tc.url.str.contains("/exact/|/near/")]
    for cid, grp in tc.groupby("cluster_id"):
        comps = {asg[url2id[u]] for u in grp.url}
        assert len(comps) == 1, f"truth cluster {cid} split across {comps}"
    # boilerplate: no two members of a group share a component
    boiler = data.truth_pairs[data.truth_pairs.kind == "boilerplate"]
    for _, row in boiler.iterrows():
        assert asg[url2id[row.src_url]] != asg[url2id[row.dst_url]]


def test_summary_sanity(fd, data):
    s = fd.summary()
    assert s["total_pages"] == len(data.pages)
    assert s["valid_docs"] + s["quarantined"] == s["total_pages"]
    assert s["components_ge2"] > 0
    assert 0 < s["pct_outliers"] <= 100 * fd.config.outlier_pct + 1
