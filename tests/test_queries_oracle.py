"""Mimics the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01, compare row count + schema + values
(order-insensitive)."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLE = entrymod.oracle_sql()
CHECKED = sorted(ORACLE)
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLE))


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(ddb.sql(ORACLE[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            bad = (~((a - b).abs() <= 1e-6)) & ~(a.isna() & b.isna())
        else:
            try:
                bad = a.astype(str) != b.astype(str)
            except (TypeError, ValueError):
                bad = a != b
        assert not bad.any(), (
            f"{name}.{c}: {int(bad.sum())} mismatches, e.g. "
            f"{a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n >= 0
    assert set(df.columns) == {"component_id", "count", "min_doc_id"}


def test_doc_counts_match_registry():
    """Stop the coverage-count drift (round-2 verdict item #9): the 'NN
    queries, MM oracle-checked' claims in SURVEY §8 and COVERAGE.md must
    equal the live registry."""
    import re

    n_q, n_o = len(entrymod.queries()), len(entrymod.oracle_sql())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc in ("SURVEY.md", "COVERAGE.md"):
        text = open(os.path.join(root, doc), encoding="utf-8").read()
        claims = re.findall(r"(\d+)\s+queries,\s*\**(\d+)\** oracle-checked",
                            text)
        assert claims, f"{doc} lost its 'N queries, M oracle-checked' line"
        for q, o in claims:
            assert (int(q), int(o)) == (n_q, n_o), (
                f"{doc} claims {q}/{o}, registry has {n_q}/{n_o}")


def test_ann_results_subset_of_bruteforce_ranking(spark):
    """Round-3 verdict item #5 (kept after the round-6 oracle flip as an
    independent recall pin): every ann_cosine_lsh hit must appear in the
    ORACLE-GREEN brute-force ranking (cosine_to_query) with the same
    cosine, and the retrieved set must be the top of that ranking up to
    LSH recall (candidates are a subset; rerank is exact)."""
    qs = entrymod.queries()
    ann = qs["ann_cosine_lsh"](spark, SF_DIR).toPandas()
    full = qs["cosine_to_query"](spark, SF_DIR).toPandas()
    full_map = dict(zip(full["vec_id"], full["cosine"]))
    assert len(ann) == 10
    for r in ann.itertuples():
        assert r.vec_id in full_map, f"ANN returned unknown vec {r.vec_id}"
        # cosine_to_query is rounded to 3 decimals in both engines
        assert abs(round(r.cosine, 3) - full_map[r.vec_id]) <= 1e-3, (
            f"ANN cosine for {r.vec_id} disagrees with the checked baseline")
    # retrieved set ⊆ true top-(k/recall): with recall >= 0.9 at k=10 every
    # hit must sit inside the true top-20 of the full ranking
    top20 = set(full.sort_values(["cosine", "vec_id"],
                                 ascending=[False, True]).head(20)["vec_id"])
    hits = sum(v in top20 for v in ann["vec_id"])
    assert hits >= 9, f"only {hits}/10 ANN results inside the true top-20"
