"""ExactSubstr-style duplicated-span removal (operators/exactsubstr.py):
cross-doc duplicated >=k-token runs erased at ANY offset (Lee et al. 2022
semantics, drop-everywhere form)."""

import random
import re

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.exactsubstr import (
    kgram_windows, remove_duplicated_spans,
)


def _ws_tokens(text):
    """Python twin of the shared ws_tokens_expr contract."""
    t = re.sub(r"\s+", " ", text).strip()
    return [w for w in t.split(" ") if w != ""]


def _reference(rows, k, min_docs=2, max_drop_frac=0.3):
    """Brute-force pure-Python reference for remove_duplicated_spans."""
    from fractions import Fraction

    toks = {i: _ws_tokens(t) for i, t in rows}
    gram_docs = {}
    for i, w in toks.items():
        for s in range(len(w) - k + 1):
            gram_docs.setdefault(tuple(w[s:s + k]), set()).add(i)
    frac = Fraction(max_drop_frac).limit_denominator(10**6)
    out = {}
    for i, w in toks.items():
        covered = set()
        starts = []
        for s in range(len(w) - k + 1):
            if len(gram_docs[tuple(w[s:s + k])]) >= min_docs:
                starts.append(s)
                covered.update(range(s, s + k))
        n_spans, prev_end = 0, -2
        for s in starts:
            if s > prev_end:
                n_spans += 1
            prev_end = s + k - 1
        clean = " ".join(t for j, t in enumerate(w) if j not in covered)
        kept = (len(covered) * frac.denominator
                <= frac.numerator * len(w))
        out[i] = (clean, len(w), len(covered), n_spans, kept)
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in remove_duplicated_spans(df, **kw).collect()}


def test_kgram_windows_overlap_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "  ")],
        "doc_id bigint, text string")
    got = {(r["doc_id"], r["start"]): r["gram"]
           for r in kgram_windows(df, k=3).collect()}
    assert got == {(1, 1): "a b c", (1, 2): "b c d", (1, 3): "c d e"}


def test_shifted_copy_erased_at_any_offset(spark):
    # the run "a b c d e f g h" appears at offset 1 in doc 1 and offset 3
    # in doc 2 — fixed 4-token chunking would hash misaligned chunks and
    # miss it; the overlapping-window form erases all 8 tokens from BOTH
    rows = [(1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h z")]
    out = _run(spark, rows, k=4)
    assert out[1]["clean_text"] == "i j"
    assert out[2]["clean_text"] == "x y z"
    assert out[1]["n_dropped"] == 8 and out[2]["n_dropped"] == 8
    assert out[1]["n_spans"] == 1 and out[2]["n_spans"] == 1
    # and the aligned-chunk miss really happens (documents the contrast)
    from fastdup_spark.operators.passages import remove_repeated_passages
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ch = {r["doc_id"]: r
          for r in remove_repeated_passages(df, chunk_words=4).collect()}
    assert ch[2]["n_dropped"] == 0  # shifted copy invisible to the grid


def test_runs_shorter_than_k_untouched(spark):
    rows = [(1, "p q r s one two three"), (2, "p q r s four five six")]
    out = _run(spark, rows, k=5)  # shared run is only 4 tokens
    assert out[1]["n_dropped"] == 0 and out[2]["n_dropped"] == 0
    assert out[1]["clean_text"] == "p q r s one two three"


def test_two_disjoint_spans_counted(spark):
    shared1, shared2 = "a b c d", "w x y z"
    rows = [(1, f"{shared1} mid1 mid2 mid3 {shared2} tail"),
            (2, f"{shared1} other words here {shared2}")]
    out = _run(spark, rows, k=4)
    assert out[1]["n_spans"] == 2 and out[1]["n_dropped"] == 8
    assert out[1]["clean_text"] == "mid1 mid2 mid3 tail"


def test_within_doc_repeats_not_cross_doc(spark):
    rows = [(1, "r r r r r r r r unique tail"), (2, "totally different words")]
    out = _run(spark, rows, k=4)
    assert out[1]["n_dropped"] == 0


def test_every_doc_one_row_and_empty_doc(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, " \t ")]
    out = _run(spark, rows, k=4)
    assert set(out) == {1, 2, 3}
    assert out[3]["clean_text"] == "" and out[3]["kept"]
    assert out[3]["n_tokens"] == 0 and out[3]["n_spans"] == 0
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 5


def test_kept_threshold_is_integer_exact(spark):
    # 3 of 10 tokens dropped == exactly 0.3 -> kept (<=, not <)
    rows = [(1, "d1 d2 d3 u1 u2 u3 u4 u5 u6 u7"), (2, "zz d1 d2 d3 yy")]
    out = _run(spark, rows, k=3)
    assert out[1]["n_dropped"] == 3 and out[1]["n_tokens"] == 10
    assert out[1]["kept"]
    # 4 of 10 tips it over
    rows = [(1, "d1 d2 d3 d4 u1 u2 u3 u4 u5 u6"), (2, "zz d1 d2 d3 d4 yy")]
    out = _run(spark, rows, k=3)
    assert out[1]["n_dropped"] == 4 and not out[1]["kept"]


def test_min_docs_generic_path(spark):
    rows = [(1, "s1 s2 s3 s4 a1 a2"), (2, "s1 s2 s3 s4 b1 b2"),
            (3, "c1 c2 s1 s2 s3 s4")]
    # in 3 docs -> dropped under min_docs=3
    out = _run(spark, rows, k=4, min_docs=3)
    assert out[1]["n_dropped"] == 4 and out[3]["clean_text"] == "c1 c2"
    # a pair-only run would NOT be
    rows.append((4, "t1 t2 t3 t4 a1 a2"))
    rows[0] = (1, "t1 t2 t3 t4 s1 s2 s3 s4")
    out = _run(spark, rows, k=4, min_docs=3)
    assert out[3]["n_dropped"] == 4          # s-run still in 3 docs
    assert out[3]["clean_text"] == "c1 c2"
    assert out[1]["n_dropped"] == 4          # t-run only in 2 docs
    assert out[1]["clean_text"] == "t1 t2 t3 t4"


def test_matches_pure_python_reference_fuzz(spark):
    rng = random.Random(61)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> real collisions
    for trial in range(3):
        rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 25))))
                for i in range(1, 15)]
        want = _reference(rows, k=4)
        out = _run(spark, rows, k=4)
        for i, (clean, n_tok, n_drop, n_spans, kept) in want.items():
            r = out[i]
            assert (r["clean_text"], r["n_tokens"], r["n_dropped"],
                    r["n_spans"], r["kept"]) == \
                (clean, n_tok, n_drop, n_spans, kept), f"doc {i} trial {trial}"


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(9)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(18)))
            for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, remove_duplicated_spans(df, k=4).collect()))
    b = sorted(map(tuple,
                   remove_duplicated_spans(df.repartition(13), k=4).collect()))
    assert a == b


def test_oracle_mode_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b c d e")],
                               "doc_id bigint, text string")
    plan = remove_duplicated_spans(df, k=4, hash_mode="oracle") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_fast_mode_plan_shape(spark):
    df = spark.createDataFrame([(1, "a b c d e")],
                               "doc_id bigint, text string")
    plan = remove_duplicated_spans(df, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan   # never row-at-a-time Python
    assert "ArrowEvalPython" not in plan   # no scalar UDF (double-eval trap)
    # the agg+semi flag pass references the fused hash mapper on BOTH
    # join sides — a deliberate recompute (cheap numpy pass) that buys
    # dropping the sort-based window over the full stream (1M A/B in BENCH)
    assert plan.count("MapInPandas") == 2


def test_fast_oracle_parity(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(10)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fast = sorted(map(tuple, remove_duplicated_spans(df, k=4).collect()))
    orc = sorted(map(tuple,
                     remove_duplicated_spans(df, k=4,
                                             hash_mode="oracle").collect()))
    assert fast == orc


def test_hash_mode_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        remove_duplicated_spans(df, k=2, hash_mode="nope").collect()


def test_merged_spans_helper(spark):
    from fastdup_spark.operators.exactsubstr import merged_spans
    starts = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 9), (2, 5)], "doc_id bigint, start int")
    out = {r["doc_id"]: r for r in merged_spans(starts, k=4).collect()}
    # doc 1: windows at 1,2 merge into [1,5]; 9 starts [9,12]
    assert [(s["s"], s["e"]) for s in out[1]["spans"]] == [(1, 5), (9, 12)]
    assert out[1]["n_spans"] == 2 and out[1]["n_dropped"] == 9
    assert [(s["s"], s["e"]) for s in out[2]["spans"]] == [(5, 8)]


def test_fast_mode_rejects_string_ids(spark):
    # '0012' and '12' would silently merge under a long cast; the fast
    # path must refuse non-integer ids up front (oracle mode handles them)
    df = spark.createDataFrame(
        [("0012", "a b c d e f"), ("12", "a b c d e f")],
        "doc_id string, text string")
    with pytest.raises(ValueError, match="integer id"):
        remove_duplicated_spans(df, k=4)
    out = {r["doc_id"]: r["n_dropped"]
           for r in remove_duplicated_spans(df, k=4,
                                            hash_mode="oracle").collect()}
    assert out == {"0012": 6, "12": 6}  # distinct docs, dup run erased


def test_null_text_kept_with_empty_text(spark):
    # ADVICE r06: NULL text crashed the fast-path Arrow kernel
    # (np.asarray(None)) and 3VL-poisoned kept in oracle mode; the
    # contract is "a doc with no tokens is kept with empty text"
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, None), (3, "a b c d e f g h")],
        "doc_id bigint, text string")
    for mode in ("fast", "oracle"):
        out = {r["doc_id"]: r
               for r in remove_duplicated_spans(
                   df, k=4, hash_mode=mode).collect()}
        assert set(out) == {1, 2, 3}, mode
        assert out[2]["kept"] is True, mode
        assert out[2]["clean_text"] == "" and out[2]["n_tokens"] == 0, mode
        assert out[2]["n_dropped"] == 0 and out[2]["n_spans"] == 0, mode
        # the duplicated run in 1/3 is still erased
        assert out[1]["n_dropped"] == 8 and not out[1]["kept"], mode
