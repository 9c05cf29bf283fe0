"""Hub text-dataset source (round-5 verdict #9): a local HF-style snapshot
layout -> documents shape -> pages wrap -> the FULL run() pipeline."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.sources.hub import hub_pages, read_hub_text


@pytest.fixture(scope="module")
def hub_layout(tmp_path_factory):
    """data/-nested multi-shard train split + a flat test split, with the
    common hub column names (id-less: text/meta only)."""
    root = tmp_path_factory.mktemp("hubds") / "tiny-webtext"
    data = root / "data"
    data.mkdir(parents=True)
    body = ("Spark first design keeps the plan declarative and lets the "
            "optimizer choose the physical strategy for document number %d.")
    rows = [{"text": body % i, "language": "en",
             "id": f"doc-{i:04d}"} for i in range(40)]
    # a planted exact-dup pair across shards
    rows.append({"text": rows[3]["text"], "language": "en", "id": "dup-of-3"})
    pd.DataFrame(rows[:20]).to_parquet(data / "train-00000-of-00002.parquet")
    pd.DataFrame(rows[20:]).to_parquet(data / "train-00001-of-00002.parquet")
    pd.DataFrame(rows[:5]).to_parquet(root / "test-00000-of-00001.parquet")
    return str(root)


def test_read_hub_text_columns_and_splits(spark, hub_layout):
    train = read_hub_text(spark, hub_layout, "train")
    assert set(train.columns) == {"url", "text", "lang", "warc_ts"}
    assert train.count() == 41
    assert train.filter(F.col("lang") == "en").count() == 41
    assert read_hub_text(spark, hub_layout, "test").count() == 5
    # id column inferred ('id' -> url)
    assert train.filter(F.col("url") == "doc-0003").count() == 1


def test_missing_split_lists_available(spark, hub_layout):
    with pytest.raises(ValueError, match="validation.*train"):
        read_hub_text(spark, hub_layout, "validation")


def test_explicit_and_synthesized_columns(spark, hub_layout):
    t = read_hub_text(spark, hub_layout, "train", text_col="text",
                      id_col=None)
    assert t.count() == 41
    with pytest.raises(ValueError, match="not in dataset"):
        read_hub_text(spark, hub_layout, "train", text_col="nope")


def test_hub_source_through_full_run(spark, hub_layout, tmp_path):
    """The e2e contract: hub shards -> pages -> run(); extraction
    round-trips the text byte-identically and the planted dup pair lands
    in a 2-doc component."""
    docs = read_hub_text(spark, hub_layout, "train")
    pages = hub_pages(docs)
    assert dict(pages.dtypes)["html"] == "binary"

    fd = FastdupSpark(spark, str(tmp_path / "hubrun"))
    summ = fd.run(pages)
    assert summ["valid_docs"] == 41 and summ["quarantined"] == 0
    # byte identity through the wrap + extractor
    got = {r["url"]: r["text"] for r in fd.docs().collect()}
    want = {r["url"]: r["text"] for r in docs.collect()}
    assert got == want
    comps = fd.components_grouped().collect()
    assert len(comps) == 1 and comps[0]["count"] == 2
    urls = set(comps[0]["urls"])
    assert urls == {"doc-0003", "dup-of-3"}
