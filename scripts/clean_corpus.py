#!/usr/bin/env python
"""spark-submit entry point: clean a text corpus (C4 rules, PII scrub,
word blocklist, deterministic sampling) — the standalone cleaning job a
training-data pipeline runs before/after dedup (Dolma/RefinedWeb shape).

    spark-submit --py-files dist/fastdup_spark.zip scripts/clean_corpus.py \
        --input /path/documents_parquet --output /path/cleaned \
        [--passes c4,pii,blocklist] [--id-col doc_id] [--text-col text] \
        [--min-words 5] [--min-kept-lines 3] \
        [--blocklist-file words.txt | --blocklist w1,w2] \
        [--sample-rate 0.25] [--sample-salt s1]

Passes apply in the order given. c4/pii/blocklist are pure built-in
JVM map-side expressions (scan -> project/filter -> write, no shuffle);
the cross-doc dedup passes `lines` (RefinedWeb line dedup,
operators/lines.py) and `spans` (ExactSubstr arbitrary-offset run
removal, operators/exactsubstr.py) each add the documented one-shuffle
flag pass plus a per-doc reassembly. A JSON line with per-pass
row/redaction counts prints on completion.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-format", default="parquet")
    ap.add_argument("--passes", default="c4,pii",
                    help="comma list, applied in order: c4 (line rules + "
                         "page kills), pii (email/IPv4/phone redaction), "
                         "blocklist (drop docs with a blocklisted token), "
                         "lines (cross-doc duplicated-line removal), "
                         "spans (ExactSubstr duplicated-run removal)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--min-kept-lines", type=int, default=3)
    ap.add_argument("--blocklist", default=None, help="comma list of words")
    ap.add_argument("--blocklist-file", default=None,
                    help="one word per line; overrides --blocklist")
    ap.add_argument("--span-k", type=int, default=50,
                    help="spans pass: minimum duplicated run length "
                         "(tokens; Lee et al. use 50)")
    ap.add_argument("--max-drop-frac", type=float, default=0.3,
                    help="lines/spans passes: kill docs losing more than "
                         "this fraction (chars / tokens)")
    ap.add_argument("--sample-rate", type=float, default=None,
                    help="keep ~rate of surviving docs, deterministically "
                         "(hash_rate_sample; applied last)")
    ap.add_argument("--sample-salt", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fastdup_spark.operators.cleaning import blocklist_flags, c4_clean
    from fastdup_spark.operators.pii import pii_count_exprs, scrub_pii_expr
    from fastdup_spark.operators.sampling import hash_rate_sample

    passes = [p.strip() for p in args.passes.split(",") if p.strip()]
    bad = set(passes) - {"c4", "pii", "blocklist", "lines", "spans"}
    if bad:
        raise SystemExit(f"--passes: unknown {sorted(bad)} "
                         "(choose from c4, pii, blocklist, lines, spans)")
    words: list[str] = []
    if "blocklist" in passes:
        if args.blocklist_file:
            with open(args.blocklist_file) as f:
                words = [w.strip() for w in f if w.strip()]
        elif args.blocklist:
            words = [w.strip() for w in args.blocklist.split(",") if w.strip()]
        if not words:
            raise SystemExit("blocklist pass needs --blocklist or "
                             "--blocklist-file")

    spark = SparkSession.builder.appName("fastdup-clean-corpus").getOrCreate()
    df = (spark.read.format(args.input_format).load(args.input)
          if args.input_format != "parquet"
          else spark.read.parquet(args.input))
    idc, txt = args.id_col, args.text_col
    other_cols = [c for c in df.columns if c not in (idc, txt)]
    counts: dict[str, int] = {"input_docs": df.count()}

    for p in passes:
        if p == "c4":
            cleaned = c4_clean(df, text_col=txt, min_words=args.min_words,
                               min_kept_lines=args.min_kept_lines,
                               id_cols=(idc,))
            keep = cleaned.filter(F.col("keep_doc")) \
                .select(idc, F.col("clean_text").alias(txt))
            df = keep.join(df.select(idc, *other_cols), idc) if other_cols \
                else keep
        elif p == "pii":
            t = F.col(txt)
            n_pii = sum(pii_count_exprs(t).values())
            df = df.select(
                *[c for c in df.columns if c != txt],
                scrub_pii_expr(t).alias(txt),
                n_pii.alias("__pii"))
            counts["pii_redactions"] = int(
                df.agg(F.sum("__pii")).collect()[0][0] or 0)
            df = df.drop("__pii")
        elif p == "blocklist":
            flagged = blocklist_flags(df, words, text_col=txt,
                                      id_cols=(idc,)) \
                .filter(F.col("blocked")).select(idc)
            df = df.join(flagged, idc, "left_anti")
        elif p == "lines":
            from fastdup_spark.operators.lines import (
                remove_duplicated_lines)
            keep = remove_duplicated_lines(
                df, max_drop_frac=args.max_drop_frac,
                id_col=idc, text_col=txt) \
                .filter(F.col("kept")) \
                .select(F.col("doc_id").alias(idc),
                        F.col("clean_text").alias(txt))
            df = keep.join(df.select(idc, *other_cols), idc) if other_cols \
                else keep
        elif p == "spans":
            from fastdup_spark.operators.exactsubstr import (
                remove_duplicated_spans)
            keep = remove_duplicated_spans(
                df, k=args.span_k, max_drop_frac=args.max_drop_frac,
                id_col=idc, text_col=txt) \
                .filter(F.col("kept")) \
                .select(F.col("doc_id").alias(idc),
                        F.col("clean_text").alias(txt))
            df = keep.join(df.select(idc, *other_cols), idc) if other_cols \
                else keep
        counts[f"after_{p}"] = df.count()

    if args.sample_rate is not None:
        df = hash_rate_sample(df, args.sample_rate, id_col=idc,
                              salt=args.sample_salt)
        counts["after_sample"] = df.count()

    df.write.mode("overwrite").parquet(args.output)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
