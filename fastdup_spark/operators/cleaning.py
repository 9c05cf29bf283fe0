"""C4-style line-level cleaning + word-blocklist filtering.

The C4 corpus rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning...", §2.2 — public knowledge) are the canonical
webtext cleaning pass: keep only lines that end in terminal
punctuation and have at least five words, drop lines mentioning
javascript, and drop whole pages that contain "lorem ipsum" or a curly
brace (code), plus pages that hit a word blocklist. RefinedWeb/Dolma
run close variants.

Everything here is pure built-in expressions over a split-lines array
(higher-order filter; NOTE pyspark lambda quirk: two-arg lambdas get
(element, index) — keep them one-arg). The whole pass is a map-side
projection: no shuffle, no Python, WholeStageCodegen — at 100 TB it
fuses into the scan like the PII scrub (operators/pii.py).

Cross-engine contract: line word counts use THE whitespace tokenizer
(operators/textql.py:ws_tokens_expr — trim + collapse runs + split on
' '), and the line predicate is replayed verbatim by the driver oracle
in DuckDB (list_filter over string_split on chr(10))."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# line is kept iff (after whitespace normalization) it has >= min_words
# words, ends in one of these, and does not mention javascript.
TERMINAL_PUNCT = ".!?\""
MIN_WORDS = 5
MIN_KEPT_LINES = 3

# doc-level kill phrases (substring match on the raw text)
DOC_KILL_LOWER = "lorem ipsum"
DOC_KILL_BRACE = "{"


def c4_keep_line_expr(line: Column, min_words: int = MIN_WORDS) -> Column:
    """Boolean: C4 keeps this line. Word counting goes through THE
    whitespace tokenizer contract (operators/textql.py:ws_tokens_expr);
    the normalized form is reused for the suffix / substring tests."""
    from fastdup_spark.operators.textql import ws_tokens_expr

    t = F.trim(F.regexp_replace(line, r"\s+", " "))
    n_words = F.size(ws_tokens_expr(line))
    return (
        (n_words >= min_words)
        & t.rlike('[.!?"]$')
        & ~F.contains(F.lower(t), F.lit("javascript"))
    )


def c4_clean(df: DataFrame, text_col: str = "text",
             min_words: int = MIN_WORDS,
             min_kept_lines: int = MIN_KEPT_LINES,
             id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Apply the C4 line + page rules.

    Returns one row per input doc with:
      clean_text  — kept lines re-joined with newlines
      n_lines     — input line count
      n_kept      — kept line count
      keep_doc    — page survives (enough kept lines, no kill phrase)

    Map-side only (one Project); callers filter on ``keep_doc`` and the
    filter pushes to the same stage.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(lines, lambda l: c4_keep_line_expr(l, min_words))
    n_kept = F.size(kept)
    keep_doc = (
        (n_kept >= min_kept_lines)
        & ~F.contains(F.lower(t), F.lit(DOC_KILL_LOWER))
        & ~F.contains(t, F.lit(DOC_KILL_BRACE))
    )
    return df.select(
        *id_cols,
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        keep_doc.alias("keep_doc"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def blocklist_flags(df: DataFrame, words: list[str],
                    text_col: str = "text",
                    id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Word-blocklist audit (RefinedWeb/C4 'bad words' pass, list supplied
    by the caller): exact whitespace-token membership, not substring —
    'class' never trips a blocklist containing 'ass'.

    Returns id cols + n_hits + matched (sorted, comma-joined) + blocked.
    Map-side only; the blocklist rides along as a literal array (at real
    scale a large list becomes a broadcast join on the exploded token —
    same semantics, documented here rather than auto-switched).
    """
    from fastdup_spark.operators.textql import ws_tokens_expr

    toks = ws_tokens_expr(F.lower(F.col(text_col)))
    lits = F.array(*[F.lit(w.lower()) for w in sorted(set(words))])
    hits = F.array_sort(F.array_intersect(F.array_distinct(toks), lits))
    return df.select(
        *id_cols,
        F.size(hits).alias("n_hits"),
        F.array_join(hits, ",").alias("matched"),
        (F.size(hits) > 0).alias("blocked"),
    )
