"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Not in the reference (whose analogs are image stats, definitions.py:28-30);
first-class here because a 100 TB webtext dedup engine is used inside a
training-data pipeline. Everything is pure built-in SQL expressions —
JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fastdup_spark.fixtures.pages import STOPWORDS

_LATIN_LANGS = ["en", "de", "fr", "es"]


def _tokens(text_col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"[\.,!\?;:]", "")), r"\s+")


def lang_id_expr(text_col: Column) -> Column:
    """n-gram/stopword heuristic language ID over {en,de,fr,es,zh}.

    CJK-charset test first (zh), then argmax of per-language stopword hit
    counts with a fixed precedence tie-break. Returns 'und' when nothing hits.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(t)
    cjk_chars = n_chars - F.length(F.regexp_replace(t, r"[一-鿿]", ""))
    toks = _tokens(t)

    def _votes(sw: list[str]):
        return F.size(F.filter(toks, lambda x: x.isin(*sw)))

    scores = {lang: _votes(STOPWORDS[lang]) for lang in _LATIN_LANGS}
    best = F.greatest(*scores.values())
    latin_pick = F.lit("und")
    for lang in reversed(_LATIN_LANGS):  # earlier langs win ties (en first)
        latin_pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(latin_pick)
    return (
        F.when(n_chars == 0, F.lit("und"))
        .when(cjk_chars * 5 > n_chars, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .otherwise(latin_pick)
    )


def token_count_ws_expr(text_col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(F.regexp_replace(text_col, r"\s+", " "))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def token_count_bpe_expr(text_col: Column) -> Column:
    """BPE-ish token count: word pieces + standalone punctuation (a cheap,
    deterministic proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(r"[0-9A-Za-zÀ-ɏ一-鿿]+|[^\sA-Za-z0-9]"), 0))


def quality_score_expr(text_col: Column) -> Column:
    """Heuristic quality in [0,1]: length band, token diversity, digit/punct
    load (Gopher-rule-style filters folded into one score)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(t)
    toks = _tokens(t)
    n_tok = F.size(toks)
    distinct_ratio = F.when(n_tok == 0, 0.0).otherwise(F.size(F.array_distinct(toks)) / n_tok)
    digit_ratio = F.when(n_chars == 0, 0.0).otherwise(
        (n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))) / n_chars)
    punct_ratio = F.when(n_chars == 0, 0.0).otherwise(
        (n_chars - F.length(F.regexp_replace(t, r"[\.,!\?;:]", ""))) / n_chars)
    len_score = (
        F.when(n_chars < 64, n_chars / 64.0)
        .when(n_chars > 100000, F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    raw = (
        0.4 * len_score
        + 0.3 * F.least(distinct_ratio * 2, F.lit(1.0))
        + 0.15 * (1 - F.least(digit_ratio * 4, F.lit(1.0)))
        + 0.15 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    return F.round(F.greatest(F.lit(0.0), F.least(raw, F.lit(1.0))), 6)


def content_fingerprint_expr(text_col: Column) -> Column:
    """Whitespace/punct-insensitive 64-bit content fingerprint (exact-dup key)."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(text_col), r"[\.,!\?;:]", ""), r"\s+", " "))
    return F.xxhash64(norm)


def winnow_fingerprints_expr(shingles_col: Column, window: int = 4) -> Column:
    """Winnowing (Schleimer et al. '03) lite: distinct min-hash per sliding
    window over the shingle hash sequence — a compact robust fingerprint set."""
    s = shingles_col
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(s) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(s, i + F.lit(1), F.lit(window))),
    )
    return F.array_distinct(F.when(F.size(s) == 0, s).otherwise(mins))
