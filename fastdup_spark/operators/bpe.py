"""Distributed BPE merge learning — tokenizer training as a Spark job.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") learn a byte-pair-encoding vocabulary by repeatedly
merging the most frequent adjacent symbol pair. Reference trainers
(subword-nmt, Hugging Face tokenizers) are single-machine: they hold
the word-count dictionary in RAM. At 100 TB the CORPUS pass is the
expensive part, and it is one distributed aggregation — after that the
learning loop touches only the distinct-word table (1e7-1e8 rows for
webtext), which is exactly the shape Spark iterates on comfortably.

Pipeline shape:
  * ONE corpus pass: GPT-2-style pre-tokens (operators/textql.py, the
    shared lookahead-free regex) -> (word, count) via groupBy. Leading
    spaces map to the GPT-2 'Ġ' convention so the space-separated
    symbol representation below stays unambiguous; pure-whitespace
    runs are excluded.
  * per merge step (driver loop, n_merges iterations over the SMALL
    word table): adjacent-pair explode + groupBy sum(count) + a
    deterministic argmax (count desc, then lexicographic pair — ties
    never depend on partitioning), then the merge applies MAP-SIDE as
    one regexp_replace over the space-joined symbol string — the same
    left-to-right non-overlapping semantics as Sennrich's reference
    implementation ('a a a' under merge (a,a) -> 'aa a'). Lineage is
    cut with localCheckpoint every few steps (CLAUDE.md quirk #9:
    iterative loops otherwise recompute the whole chain).
  * applying a learned table to NEW text is map-side only:
    `segment_expr` chains the merges as nested regexp_replace calls —
    pure JVM expressions, no Python in the hot path.

Determinism: argmax tie-break is total (count, left, right); symbol
strings are quoted with the Pattern.quote \\Q..\\E convention (symbols
are arbitrary webtext bytes — '.', '$', even '\\E' itself) and
replacements escape '\\' and '$'. The learning loop never samples.

The reference repo has no tokenizer surface (image engine); this is
part of the beyond-the-reference LLM-data tier (SURVEY §2 addenda).
Non-SQL-expressible by contract (iterative argmax; like kmeans/CC it
is pytest-verified against a pure-Python reference, not a DuckDB
oracle — the COVERAGE.md row is a T row).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textql import gpt2_pretokens_expr

_EOW = "</w>"  # end-of-word marker (Sennrich): merges can't cross words
_SPACE_MARK = "Ġ"  # 'Ġ', the GPT-2 leading-space convention


def _quote_re(s: str) -> str:
    """java.util.regex.Pattern.quote: literal-match any symbol text."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _quote_repl(s: str) -> str:
    """Escape regexp_replace replacement metacharacters ('\\' and '$')."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def merge_pattern(left: str, right: str) -> str:
    """Pattern matching 'left right' as WHOLE space-separated symbols."""
    return (r"(?<=^|\s)" + _quote_re(left) + " " + _quote_re(right)
            + r"(?=$|\s)")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count): GPT-2-style pre-tokens over the corpus, leading
    space -> 'Ġ', whitespace runs excluded. The ONE corpus-scale pass."""
    toks = gpt2_pretokens_expr(F.col(text_col))
    nonspace = F.filter(
        toks, lambda x: F.regexp_replace(x, r"\s+", "") != "")
    marked = F.transform(
        nonspace, lambda x: F.regexp_replace(x, r"^ ", _SPACE_MARK))
    return (
        docs.select(F.explode(marked).alias("word"))
        .groupBy("word").agg(F.count("*").cast("long").alias("count"))
    )


def _initial_symbols(word_col) -> "F.Column":
    """word -> space-joined character symbols + the end-of-word marker.
    (split keeps a trailing '' under limit=-1 — filter it.)"""
    chars = F.filter(F.split(word_col, "(?!^)"), lambda c: c != "")
    return F.concat_ws(" ", F.array_join(chars, " "), F.lit(_EOW))


@dataclass(frozen=True)
class BpeMerge:
    rank: int
    left: str
    right: str
    pair_count: int


def learn_bpe(docs: DataFrame, n_merges: int, min_count: int = 2,
              text_col: str = "text",
              checkpoint_every: int = 8,
              ) -> tuple[list[BpeMerge], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, words) where merges is the ranked merge table
    (rank, left, right, pair_count at selection time) and words the
    final (word, count, symbols) DataFrame (symbols = the word segmented
    under all learned merges, space-joined, '</w>'-terminated). Stops
    early when the best remaining pair occurs < ``min_count`` times.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = word_counts(docs, text_col).select(
        "word", "count", _initial_symbols(F.col("word")).alias("symbols"))
    words = words.localCheckpoint(eager=True)

    merges: list[BpeMerge] = []
    for rank in range(n_merges):
        syms = F.split(F.col("symbols"), " ")
        # guard: sequence(1, 0) DESCENDS in Spark — fully-merged
        # single-symbol words contribute no pairs
        no_pairs = F.array().cast(
            "array<struct<left:string,right:string>>")
        adj = F.when(F.size(syms) < 2, no_pairs).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("left"),
                    F.element_at(syms, i + 1).alias("right"))))
        pairs = words.select("count", F.explode(adj).alias("p"))
        best = (
            pairs.groupBy(F.col("p.left").alias("left"),
                          F.col("p.right").alias("right"))
            .agg(F.sum("count").alias("n"))
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1).collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        left, right, n = best[0]["left"], best[0]["right"], int(best[0]["n"])
        merges.append(BpeMerge(rank, left, right, n))
        words = words.withColumn(
            "symbols",
            F.regexp_replace("symbols", merge_pattern(left, right),
                             _quote_repl(left + right)))
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges, words.localCheckpoint(eager=True)


def segment_expr(word_col, merges: list[BpeMerge]) -> "F.Column":
    """Segment a (already 'Ġ'-marked) word column under a learned merge
    table: array<string> of subword symbols ('</w>'-terminated). Pure
    chained JVM regexp_replace — no Python, applies map-side to any new
    corpus."""
    expr = _initial_symbols(word_col)
    for m in sorted(merges, key=lambda m: m.rank):
        expr = F.regexp_replace(expr, merge_pattern(m.left, m.right),
                                _quote_repl(m.left + m.right))
    return F.split(expr, " ")


def vocab(merges: list[BpeMerge], words: DataFrame) -> DataFrame:
    """(symbol, count): the subword vocabulary realized by the final
    segmentation — per-symbol corpus frequencies (one explode +
    groupBy over the word table)."""
    syms = F.split(F.col("symbols"), " ")
    return (
        words.select("count", F.explode(syms).alias("symbol"))
        .groupBy("symbol").agg(F.sum("count").cast("long").alias("count"))
    )
