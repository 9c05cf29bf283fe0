"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §B).

Pure function of ``(seed, n_docs)`` — numpy PCG64, no wall clock, no external
data. Emits the exact input shape from BASELINE.json:input_hint::

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

plus ground-truth tables ``truth_pairs(src_url, dst_url, true_jaccard, kind)``
and ``truth_clusters(url, cluster_id)`` — the oracles for the dup-pair
recall >= 0.99 metric and cluster-assignment parity.

Planted structure (fractions per FIXTURES.md):
  ~70% singletons, ~10% exact duplicates (clusters of 2-5, identical text,
  different url/warc_ts), ~12% near duplicates (clusters of 2-8; bounded
  mutations keeping k=9 word-shingle Jaccard >= 0.86, validated at generation
  time and regenerated on undershoot), ~5% boilerplate-heavy (shared template
  block, distinct bodies, true Jaccard < 0.5 — false-positive control and
  LSH-bucket-skew stressor), ~3% containment pairs (doc B embeds doc A
  verbatim plus extra text — exercises the LCS confirm stage), plus a small
  fixed set of quarantine rows (malformed html -> extractor error path,
  analog of atrain_features.bad.csv, /root/reference/RUN.md:120-124).

The html wrapper is a fixed template (title + nav + <p> per paragraph +
footer) so extraction is non-trivial but exactly invertible: the ground-truth
``text`` column is what a correct extractor must reproduce byte-for-byte
(the per-row invariant in BASELINE.json:input_hint).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pandas as pd

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
TS_STEP_US = 17_000_000  # 17s per doc_seq

LANGS = ["en", "de", "fr", "es", "zh"]
LANG_WEIGHTS = np.array([0.60, 0.12, 0.10, 0.10, 0.08])

# High-frequency function words per language — give the corpus a real
# lang-ID signal for the language-detection heuristic (operators/textql).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "und", "die", "das", "von", "ist", "mit", "nicht"],
    "fr": ["le", "et", "les", "des", "est", "dans", "pour", "que"],
    "es": ["el", "y", "los", "las", "es", "con", "para", "una"],
    "zh": ["的", "是", "了", "在", "和", "有", "我们", "这个"],
}

SHINGLE_K = 9  # generation-time Jaccard validation uses the pipeline default
NEAR_DUP_MIN_J = 0.86  # margin above the 0.85 verify threshold

_LATIN_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "ca", "ce", "ci", "co", "cu", "da", "de",
    "di", "do", "du", "fa", "fe", "fi", "fo", "fu", "ga", "ge", "gi", "go",
    "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo", "mu", "na", "ne",
    "ni", "no", "nu", "pa", "pe", "pi", "po", "pu", "ra", "re", "ri", "ro",
    "ru", "sa", "se", "si", "so", "su", "ta", "te", "ti", "to", "tu", "va",
    "ve", "vi", "vo", "vu", "za", "ze", "zi", "zo", "zu", "ka", "ke", "ki",
]
_CJK_BASE = 0x4E00


def _make_vocab(rng: np.random.Generator, lang: str, size: int = 600) -> list[str]:
    """Deterministic per-language vocabulary with disjoint-looking words."""
    words: list[str] = []
    seen: set[str] = set()
    if lang == "zh":
        while len(words) < size:
            n = int(rng.integers(1, 4))
            w = "".join(chr(_CJK_BASE + int(c)) for c in rng.integers(0, 2000, size=n))
            if w not in seen:
                seen.add(w)
                words.append(w)
        return words
    prefix = {"en": "", "de": "ge", "fr": "é", "es": "ñ"}[lang]
    while len(words) < size:
        n = int(rng.integers(2, 5))
        w = prefix + "".join(_LATIN_SYLLABLES[int(c)] for c in rng.integers(0, len(_LATIN_SYLLABLES), size=n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    # a few entity-escaping stressors so html.escape round-trip is exercised
    words[0] = "r&d"
    words[1] = "a<b"
    words[2] = "x>y"
    return words


def _sentence(rng: np.random.Generator, vocab: list[str], stop: list[str]) -> list[str]:
    n = int(rng.integers(6, 15))
    idx = rng.integers(0, len(vocab), size=n)
    toks = [vocab[int(i)] for i in idx]
    # inject stopwords (~30% of positions) and occasional numbers/dates
    for j in range(n):
        r = rng.random()
        if r < 0.30:
            toks[j] = stop[int(rng.integers(0, len(stop)))]
        elif r < 0.34:
            toks[j] = str(int(rng.integers(0, 100000)))
    return toks


def _make_doc(rng: np.random.Generator, vocab: list[str], stop: list[str],
              min_words: int, max_words: int) -> list[list[list[str]]]:
    """A doc = list of paragraphs; paragraph = list of sentences; sentence = tokens."""
    target = int(np.clip(np.exp(rng.normal(5.0, 0.8)), min_words, max_words))
    paras: list[list[list[str]]] = []
    count = 0
    while count < target:
        n_sent = int(rng.integers(3, 7))
        para = []
        for _ in range(n_sent):
            s = _sentence(rng, vocab, stop)
            para.append(s)
            count += len(s)
            if count >= target:
                break
        paras.append(para)
    return paras


def _doc_text(paras: list[list[list[str]]]) -> str:
    return "\n\n".join(
        " ".join(" ".join(s) + "." for s in para) for para in paras
    )


def _doc_tokens(paras) -> list[str]:
    toks: list[str] = []
    for para in paras:
        for s in para:
            toks.extend(s)
    return toks


def _shingle_set(tokens: list[str], k: int = SHINGLE_K) -> set[tuple[str, ...]]:
    if len(tokens) < k:
        return {tuple(tokens)} if tokens else set()
    return {tuple(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _mutate(rng: np.random.Generator, paras, vocab, strength: int):
    """Bounded near-dup mutation. strength 2 = normal, 1 = gentle fallback."""
    out = [[list(s) for s in para] for para in paras]
    ops = ["swap", "number", "drop_sentence", "add_sentence"] if strength >= 2 else ["swap"]
    n_ops = int(rng.integers(1, strength + 1))
    for _ in range(n_ops):
        op = ops[int(rng.integers(0, len(ops)))]
        pi = int(rng.integers(0, len(out)))
        para = out[pi]
        si = int(rng.integers(0, len(para)))
        if op == "swap":
            sent = para[si]
            wi = int(rng.integers(0, len(sent)))
            sent[wi] = vocab[int(rng.integers(0, len(vocab)))]
        elif op == "number":
            sent = para[si]
            wi = int(rng.integers(0, len(sent)))
            sent[wi] = str(int(rng.integers(0, 100000)))
        elif op == "drop_sentence" and len(para) > 2:
            para.pop(si)
        elif op == "add_sentence":
            para.insert(si, _sentence(rng, vocab, vocab[:8]))
    return out


_NAV = '<nav><a href="/">home</a> <a href="/about">about</a> <a href="/archive">archive</a></nav>'


def render_html(title: str, text: str, host: str) -> bytes:
    """Fixed template wrap; extraction must invert it byte-for-byte."""
    paras = text.split("\n\n")
    body = "\n".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paras)
    doc = (
        f'<html><head><meta charset="utf-8"><title>{_html.escape(title, quote=False)}</title></head>\n'
        f"<body>\n{_NAV}\n<div class=\"content\">\n{body}\n</div>\n"
        f"<footer>© 2024 {host} — all rights reserved</footer>\n</body></html>"
    )
    return doc.encode("utf-8")


@dataclass
class PagesData:
    pages: pd.DataFrame          # url, warc_ts, html, text, lang
    truth_pairs: pd.DataFrame    # src_url, dst_url, true_jaccard, kind
    truth_clusters: pd.DataFrame # url, cluster_id


def generate_pages(n_docs: int = 1000, seed: int = 42) -> PagesData:
    rng = np.random.Generator(np.random.PCG64(seed))
    vocabs = {lang: _make_vocab(rng, lang) for lang in LANGS}

    n_quarantine = max(4, n_docs // 250)
    n_body = n_docs - n_quarantine
    budget = {
        "exact": int(round(0.10 * n_body)),
        "near": int(round(0.12 * n_body)),
        "boiler": int(round(0.05 * n_body)),
        "contain": int(round(0.03 * n_body)) // 2 * 2,
    }
    budget["single"] = n_body - sum(budget.values())

    rows: list[tuple] = []           # (url, seq, text, lang, kind, cluster_id)
    pairs: list[tuple] = []          # (src_url, dst_url, true_jaccard, kind)
    seq = 0
    cluster_seq = 0

    def next_url(kind: str, lang: str) -> str:
        nonlocal seq
        host = int(rng.integers(0, 50))
        slug = int(rng.integers(0, 1_000_000))
        u = f"https://host-{host:03d}.example/{kind}/{seq:08d}-{slug:06x}.html"
        seq += 1
        return u

    def pick_lang() -> str:
        return LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]

    def emit(text: str, lang: str, kind: str, cluster_id: int) -> str:
        u = next_url(kind, lang)
        rows.append((u, seq - 1, text, lang, kind, cluster_id))
        return u

    # --- singletons ---
    for _ in range(budget["single"]):
        lang = pick_lang()
        paras = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 30, 1200)
        emit(_doc_text(paras), lang, "single", cluster_seq)
        cluster_seq += 1

    # --- exact duplicate clusters ---
    used = 0
    while used < budget["exact"]:
        size = int(rng.integers(2, 6))
        size = min(size, budget["exact"] - used) if budget["exact"] - used >= 2 else budget["exact"] - used
        if size < 2:
            size = 2
        lang = pick_lang()
        paras = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 60, 1200)
        text = _doc_text(paras)
        urls = [emit(text, lang, "exact", cluster_seq) for _ in range(size)]
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                pairs.append((urls[i], urls[j], 1.0, "exact"))
        cluster_seq += 1
        used += size

    # --- near duplicate clusters (validated Jaccard, regenerate on undershoot) ---
    used = 0
    while used < budget["near"]:
        size = int(rng.integers(2, 9))
        size = min(size, max(2, budget["near"] - used))
        lang = pick_lang()
        base = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 250, 900)
        base_tokens = _doc_tokens(base)
        base_sh = _shingle_set(base_tokens)
        members = [(base, _doc_text(base), base_sh)]
        for _ in range(size - 1):
            # validate PAIRWISE against every existing member (recall is
            # measured over all intra-cluster pairs, not just member-vs-base)
            accepted = None
            for strength in (2, 2, 1, 1):  # retry gentler until bound holds
                cand = _mutate(rng, base, vocabs[lang], strength)
                cand_sh = _shingle_set(_doc_tokens(cand))
                if all(_jaccard(m_sh, cand_sh) >= NEAR_DUP_MIN_J for (_, _, m_sh) in members):
                    accepted = (cand, _doc_text(cand), cand_sh)
                    break
            if accepted is None:
                accepted = (base, _doc_text(base), base_sh)  # exact-copy fallback, never undershoots
            members.append(accepted)
        urls = [emit(t, lang, "near", cluster_seq) for (_, t, _) in members]
        for i in range(len(urls)):
            for jx in range(i + 1, len(urls)):
                tj = _jaccard(members[i][2], members[jx][2])
                pairs.append((urls[i], urls[jx], tj, "near"))
        cluster_seq += 1
        used += size

    # --- boilerplate-heavy groups (must NOT cluster; bucket-skew stressor) ---
    used = 0
    while used < budget["boiler"]:
        size = int(rng.integers(3, 7))
        size = min(size, max(3, budget["boiler"] - used))
        lang = pick_lang()
        template = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 150, 250)
        tmpl_text = _doc_text(template)
        grp = []
        for _ in range(size):
            body = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 250, 600)
            text = tmpl_text + "\n\n" + _doc_text(body)
            toks = _doc_tokens(template) + _doc_tokens(body)
            grp.append((emit(text, lang, "boiler", cluster_seq), _shingle_set(toks)))
            cluster_seq += 1
        for i in range(len(grp)):
            for jx in range(i + 1, len(grp)):
                tj = _jaccard(grp[i][1], grp[jx][1])
                pairs.append((grp[i][0], grp[jx][0], tj, "boilerplate"))
        used += size

    # --- containment pairs (B = A + extra; LCS confirm stage) ---
    for _ in range(budget["contain"] // 2):
        lang = pick_lang()
        a = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 150, 400)
        extra = _make_doc(rng, vocabs[lang], STOPWORDS[lang], 100, 400)
        a_text = _doc_text(a)
        b_text = a_text + "\n\n" + _doc_text(extra)
        tj = _jaccard(_shingle_set(_doc_tokens(a)), _shingle_set(_doc_tokens(a) + _doc_tokens(extra)))
        ua = emit(a_text, lang, "contain", cluster_seq)
        cluster_seq += 1
        ub = emit(b_text, lang, "contain", cluster_seq)
        cluster_seq += 1
        pairs.append((ua, ub, tj, "containment"))

    # --- build page rows (html render) ---
    out = []
    for url, s, text, lang, kind, cid in rows:
        host = url.split("/")[2]
        title_words = text.split(" ", 6)[:6]
        html_bytes = render_html(" ".join(title_words), text, host)
        out.append((url, s, html_bytes, text, lang, kind, cid))

    # --- quarantine rows (malformed html -> extractor error path) ---
    q_kinds = ["invalid-utf8", "no-paragraphs", "truncated", "empty"]
    for qi in range(n_quarantine):
        lang = "en"
        qk = q_kinds[qi % len(q_kinds)]
        u = next_url("bad", lang)
        if qk == "invalid-utf8":
            hb = b"<html><body><p>ok " + bytes([0xFF, 0xFE, 0xC0]) + b"</p></body></html>"
        elif qk == "no-paragraphs":
            hb = b"<html><body><div>no paragraph tags here at all</div></body></html>"
        elif qk == "truncated":
            hb = b"<html><body><p>this paragraph never clo"
        else:
            hb = b""
        out.append((u, seq - 1, hb, "", lang, "bad", cluster_seq))
        cluster_seq += 1

    pages = pd.DataFrame(out, columns=["url", "seq", "html", "text", "lang", "kind", "cluster_id"])
    pages["warc_ts"] = EPOCH_2024 + (pages["seq"].to_numpy() * TS_STEP_US).astype("timedelta64[us]")
    truth_clusters = pages[["url", "cluster_id"]].copy()
    pages = pages[["url", "warc_ts", "html", "text", "lang"]]
    truth_pairs = pd.DataFrame(pairs, columns=["src_url", "dst_url", "true_jaccard", "kind"])
    return PagesData(pages=pages, truth_pairs=truth_pairs, truth_clusters=truth_clusters)


def pages_schema():
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )
    return StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ])


def pages_to_spark(spark, data: PagesData):
    """Explicit-schema DataFrames (never inference — SURVEY §1.2)."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )
    pages = spark.createDataFrame(data.pages, schema=pages_schema())
    tp_schema = StructType([
        StructField("src_url", StringType(), False),
        StructField("dst_url", StringType(), False),
        StructField("true_jaccard", DoubleType(), False),
        StructField("kind", StringType(), False),
    ])
    tc_schema = StructType([
        StructField("url", StringType(), False),
        StructField("cluster_id", LongType(), False),
    ])
    truth_pairs = spark.createDataFrame(data.truth_pairs, schema=tp_schema)
    truth_clusters = spark.createDataFrame(data.truth_clusters, schema=tc_schema)
    return pages, truth_pairs, truth_clusters


def write_pages_parquet(data: PagesData, out_dir: str,
                        rows_per_file: int = 4000) -> None:
    """Write pages as a MULTI-FILE parquet dataset (like any real WARC-derived
    table): Spark's parallelism on read comes from file splits, so a
    single-file fixture would serialize the whole extract stage."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages.parquet")
    os.makedirs(pages_dir, exist_ok=True)
    pages = data.pages
    n = len(pages)
    for shard, lo in enumerate(range(0, n, rows_per_file)):
        chunk = pages.iloc[lo:lo + rows_per_file]
        tbl = pa.Table.from_arrays(
            [
                pa.array(chunk["url"], type=pa.string()),
                pa.array(chunk["warc_ts"].astype("datetime64[us]"), type=pa.timestamp("us")),
                pa.array(chunk["html"], type=pa.binary()),
                pa.array(chunk["text"], type=pa.string()),
                pa.array(chunk["lang"], type=pa.string()),
            ],
            names=["url", "warc_ts", "html", "text", "lang"],
        )
        pq.write_table(tbl, os.path.join(pages_dir, f"part-{shard:05d}.parquet"))
    pq.write_table(pa.Table.from_pandas(data.truth_pairs, preserve_index=False),
                   os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(pa.Table.from_pandas(data.truth_clusters, preserve_index=False),
                   os.path.join(out_dir, "truth_clusters.parquet"))
