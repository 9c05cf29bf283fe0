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


def ws_tokens_expr(text_col: Column) -> Column:
    """The canonical whitespace tokenizer: trim, collapse runs of
    whitespace to single spaces, split on ' '. This exact boundary is a
    cross-engine contract — every DuckDB driver oracle replays it as
    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') —
    so all surface-word consumers (gopher signals, repetition, doc
    stats, passage chunking) must share THIS expression, not a copy."""
    return F.split(F.trim(F.regexp_replace(text_col, r"\s+", " ")), " ")


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


# GPT-2-style pre-tokenizer (Radford et al. 2019, public gpt2 regex),
# simplified to stay lookahead-free so Java regex (Spark) and RE2
# (DuckDB oracle) split identically: contractions, optional-space letter
# runs, optional-space digit runs, optional-space punct runs, whitespace
# runs. The real BPE merge table is model-specific; this boundary is the
# standard corpus-accounting proxy (token counts within ~10% of gpt2).
GPT2_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def gpt2_pretokens_expr(text_col: Column) -> Column:
    """All GPT-2-style pre-tokens (including whitespace runs) as an
    array<string> — map-side regexp_extract_all, no Python."""
    return F.regexp_extract_all(text_col, F.lit(GPT2_PRETOKEN_RE), F.lit(0))


def token_count_gpt2_expr(text_col: Column) -> Column:
    """GPT-2-style pre-token count EXCLUDING pure-whitespace runs (the
    number a subword tokenizer would see before merges). The whitespace
    test is regex-based, not trim(): trim strips only spaces, and webtext
    is full of tab/newline runs."""
    toks = gpt2_pretokens_expr(text_col)
    return F.size(F.filter(
        toks, lambda x: F.regexp_replace(x, r"\s+", "") != ""))


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


GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_expr(text_col: Column) -> Column:
    """Gopher quality-filter signals (Rae et al. 2021, published Table A1
    thresholds): word-count and mean-word-length bounds, symbol/bullet/
    ellipsis ratios, alpha-word and stopword floors. Raw whitespace words
    (no punctuation strip — the published rules operate on surface words).
    Pure JVM expressions; returns a struct of the per-doc signals plus the
    conjunctive `passes` verdict."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    words = ws_tokens_expr(t)
    lines = F.split(t, "\n")
    n_words = F.size(words)
    nd = n_words.cast("double")
    mean_wl = F.aggregate(words, F.lit(0).cast("long"),
                          lambda acc, x: acc + F.length(x)).cast("double") / nd
    n_sym = F.size(F.filter(words, lambda w: w.contains("#")
                            | w.contains("...") | w.contains("…")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter(
        lines, lambda l: F.ltrim(l).startswith("-")
        | F.ltrim(l).startswith("*") | F.ltrim(l).startswith("•")))
    n_ellip = F.size(F.filter(
        lines, lambda l: F.rtrim(l).endswith("...")
        | F.rtrim(l).endswith("…")))
    lowered = F.transform(words, F.lower)
    n_stop = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOP]),
        lambda s: F.array_contains(lowered, s)))
    frac_sym = F.round(n_sym.cast("double") / nd, 4)
    frac_alpha = F.round(n_alpha.cast("double") / nd, 4)
    frac_bullet = F.round(n_bullet.cast("double") / F.size(lines).cast("double"), 4)
    frac_ellip = F.round(n_ellip.cast("double") / F.size(lines).cast("double"), 4)
    mean_wl_r = F.round(mean_wl, 4)
    passes = (
        n_words.between(50, 100_000) & mean_wl.between(3.0, 10.0)
        & (n_sym.cast("double") / nd <= 0.1)
        & (n_bullet.cast("double") / F.size(lines).cast("double") <= 0.9)
        & (n_ellip.cast("double") / F.size(lines).cast("double") <= 0.3)
        & (n_alpha.cast("double") / nd >= 0.8)
        & (n_stop >= 2)
    )
    return F.struct(
        n_words.alias("n_words"), mean_wl_r.alias("mean_word_len"),
        frac_sym.alias("frac_symbol_words"), frac_alpha.alias("frac_alpha_words"),
        frac_bullet.alias("frac_bullet_lines"),
        frac_ellip.alias("frac_ellipsis_lines"),
        n_stop.alias("n_stopwords_present"), passes.alias("passes"),
    )


def dup_ngram_fraction_expr(text_col: Column, n: int = 3) -> Column:
    """Within-document repetition (Rae et al. 2021 repetition filters):
    fraction of n-gram OCCURRENCES that are repeats of an earlier n-gram —
    1 - distinct/total over the sliding n-gram list. 0.0 for docs shorter
    than n words. Whole-stage-codegen expressions, no shuffle."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    words = ws_tokens_expr(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    total = F.size(words) - (n - 1)
    dup = F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") \
        / total.cast("double")
    return F.struct(
        F.greatest(total, F.lit(0)).alias("total_ngrams"),
        F.when(total > 0, F.size(F.array_distinct(grams)))
         .otherwise(F.lit(0)).alias("distinct_ngrams"),
        F.when(total > 0, F.round(dup, 6)).otherwise(F.lit(0.0)).alias("dup_frac"),
    )
