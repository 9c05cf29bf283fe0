"""HTML gallery report — the webtext analog of the reference's primary UX.

The reference renders five HTML galleries after a run (duplicates, outliers,
components, stats, similarity — /root/reference/fastdup/galleries.py:268,524,
1312,1579,1728 via html_writer.py). Images become thumbnails there; for
webtext the "thumbnail" is a url + text snippet. The queries are identical
to plans/report.py (each gallery renders the already-limited top-N head of a
stage table — the reference's galleries also collect the top-N to render);
only the renderer differs, so the markdown and HTML paths can never drift.
"""

from __future__ import annotations

import html

from pyspark.sql import functions as F

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 2rem auto; max-width: 72rem; color: #1c1e21; }
h1 { border-bottom: 2px solid #e4e6eb; padding-bottom: .3rem; }
h2 { margin-top: 2rem; }
table { border-collapse: collapse; width: 100%; margin: .8rem 0; }
th, td { border: 1px solid #d0d3d8; padding: .35rem .6rem; text-align: left;
         font-size: .9rem; }
th { background: #f0f2f5; }
tr:nth-child(even) { background: #fafbfc; }
.badge { display: inline-block; background: #e7f3ff; color: #1877f2;
         border-radius: 4px; padding: 0 .45rem; margin-left: .4rem;
         font-size: .8rem; }
.snippet { color: #606770; font-size: .85rem; }
ul.members { margin: .2rem 0 .8rem 1.2rem; }
.pair { display: grid; grid-template-columns: 1fr 1fr; gap: .8rem;
        margin: .8rem 0 1.6rem; }
.pair .doc { border: 1px solid #d0d3d8; border-radius: 6px;
             padding: .6rem .8rem; font-size: .85rem; overflow-wrap: anywhere; }
.pair .doc h3 { margin: 0 0 .4rem; font-size: .85rem; color: #606770; }
.pair mark { background: #d3f0d3; padding: 0; }
"""


def _esc(v) -> str:
    return html.escape(str(v))


def _table(rows: list[dict], cols: list[str]) -> str:
    if not rows:
        return "<p><em>none</em></p>"
    head = "".join(f"<th>{_esc(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(r[c])}</td>" for c in cols) + "</tr>"
        for r in rows)
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def summary_section(fd) -> str:
    s = fd.summary()
    rows = [{"stat": k, "value": v} for k, v in s.items()]
    return "<h1>Run summary</h1>" + _table(rows, ["stat", "value"])


def duplicates_section(fd, num_items: int = 20) -> str:
    """≈ create_duplicates_gallery (galleries.py:268)."""
    rows = [r.asDict() for r in fd.similarity().limit(num_items).collect()]
    for r in rows:
        r["jaccard"] = round(r["jaccard"], 4)
    return ("<h1>Top duplicate pairs</h1>"
            + _table(rows, ["url_from", "url_to", "jaccard"]))


def components_section(fd, num_items: int = 20, members_per: int = 10) -> str:
    """≈ create_components_gallery / find_top_components (galleries.py:1312,1081)."""
    rows = [r.asDict() for r in fd.components_grouped(limit=num_items).collect()]
    if not rows:
        return "<h1>Top duplicate clusters</h1><p><em>none</em></p>"
    parts = ["<h1>Top duplicate clusters</h1>"]
    for r in rows:
        parts.append(
            f"<h2>component {_esc(r['component_id'])}"
            f"<span class='badge'>{_esc(r['count'])} docs</span></h2>")
        lis = "".join(f"<li>{_esc(u)}</li>" for u in r["urls"][:members_per])
        more = (f"<li>… {r['count'] - members_per} more</li>"
                if r["count"] > members_per else "")
        parts.append(f"<ul class='members'>{lis}{more}</ul>")
    return "".join(parts)


def outliers_section(fd, num_items: int = 20) -> str:
    """≈ create_outliers_gallery (galleries.py:524)."""
    rows = [r.asDict() for r in fd.outliers().limit(num_items).collect()]
    for r in rows:
        r["best_sim"] = round(r["best_sim"], 4)
    return "<h1>Outliers (most unique)</h1>" + _table(rows, ["url", "best_sim"])


def stats_section(fd, num_items: int = 20, metric: str = "n_chars",
                  ascending: bool = False) -> str:
    """≈ create_stats_gallery (galleries.py:1579)."""
    order = F.asc(metric) if ascending else F.desc(metric)
    df = (
        fd.doc_stats().join(fd.docs().select("doc_id", "url"), "doc_id")
        .orderBy(order, "doc_id").limit(num_items)
        .select("url", metric)
    )
    rows = [r.asDict() for r in df.collect()]
    return f"<h1>Extreme docs by {_esc(metric)}</h1>" + _table(rows, ["url", metric])


def similarity_section(fd, num_items: int = 20) -> str:
    """≈ create_similarity_gallery (galleries.py:1728): per-doc top neighbors
    from the knn stage (nearest_neighbors_k contract)."""
    rows = [r.asDict() for r in
            fd.knn().orderBy(F.desc("sim"), "doc_id", "rank")
              .limit(num_items).collect()]
    for r in rows:
        r["sim"] = round(r["sim"], 4)
    return ("<h1>Nearest neighbors (top-k per doc)</h1>"
            + _table(rows, ["url", "url_nn", "sim", "rank"]))


def _shared_spans(ta: str, tb: str, min_words: int = 8
                  ) -> list[tuple[int, int, int, int]]:
    """Character spans of the word-level passages the two texts SHARE —
    difflib matching blocks over the token streams (autojunk off: long
    prose defeats difflib's popular-element heuristic), kept when at least
    ``min_words`` long. Returns [(a_start, a_end, b_start, b_end), ...]
    in document order."""
    import difflib
    import re

    toks_a = [(m.group(0), m.start(), m.end()) for m in re.finditer(r"\S+", ta)]
    toks_b = [(m.group(0), m.start(), m.end()) for m in re.finditer(r"\S+", tb)]
    sm = difflib.SequenceMatcher(None, [t[0] for t in toks_a],
                                 [t[0] for t in toks_b], autojunk=False)
    spans = []
    for blk in sm.get_matching_blocks():
        if blk.size >= min_words:
            spans.append((toks_a[blk.a][1], toks_a[blk.a + blk.size - 1][2],
                          toks_b[blk.b][1], toks_b[blk.b + blk.size - 1][2]))
    return spans


def _highlight(text: str, spans: list[tuple[int, int]],
               max_chars: int) -> str:
    """Escaped text with the shared ``spans`` wrapped in <mark>, truncated
    to ``max_chars`` (ellipsis appended when cut)."""
    parts, pos = [], 0
    for s, e in spans:
        if s >= max_chars:
            break
        parts.append(_esc(text[pos:s]))
        parts.append(f"<mark>{_esc(text[s:min(e, max_chars)])}</mark>")
        pos = e
    parts.append(_esc(text[pos:max_chars]))
    tail = "…" if len(text) > max_chars else ""
    return "".join(parts) + tail


def pair_diff_section(fd, num_pairs: int = 10, min_words: int = 8,
                      max_chars: int = 1500) -> str:
    """Side-by-side duplicate-pair gallery with the SHARED passages
    highlighted — the text analog of the reference's paired duplicate
    thumbnails (create_duplicates_gallery,
    /root/reference/fastdup/galleries.py:268-520: two images per row; here
    two text columns with <mark>ed overlap). Pairs come from the top-N
    similarity edges; overlap spans are word-level matching blocks
    (_shared_spans) and the longest shared passage length comes from the
    same suffix-automaton used by the containment stage (functions/lcs.py).
    All rendering is driver-side over the already-limited top-N collect —
    the same shape as every other gallery."""
    from fastdup_spark.functions.lcs import lcs_length

    pairs = [r.asDict() for r in fd.similarity(limit=num_pairs).collect()]
    if not pairs:
        return "<h1>Duplicate pairs, side by side</h1><p><em>none</em></p>"
    ids = sorted({r["src"] for r in pairs} | {r["dst"] for r in pairs})
    texts = {r["doc_id"]: r["text"] for r in
             fd.docs().select("doc_id", "text")
             .filter(F.col("doc_id").isin(ids)).collect()}
    parts = ["<h1>Duplicate pairs, side by side</h1>"]
    for r in pairs:
        ta, tb = texts.get(r["src"], ""), texts.get(r["dst"], "")
        spans = _shared_spans(ta, tb, min_words)
        lcs = lcs_length(ta, tb)
        parts.append(
            f"<h2>J = {round(r['jaccard'], 4)}"
            f"<span class='badge'>longest shared passage {lcs} chars</span>"
            f"<span class='badge'>{len(spans)} shared span(s)</span></h2>")
        parts.append(
            "<div class='pair'>"
            f"<div class='doc'><h3>{_esc(r['url_from'])}</h3>"
            f"{_highlight(ta, [(s[0], s[1]) for s in spans], max_chars)}</div>"
            f"<div class='doc'><h3>{_esc(r['url_to'])}</h3>"
            f"{_highlight(tb, [(s[2], s[3]) for s in spans], max_chars)}</div>"
            "</div>")
    return "".join(parts)


def full_html_report(fd, num_items: int = 20, title: str = "fastdup-spark report") -> str:
    """One standalone HTML document with every gallery."""
    sections = "\n".join([
        summary_section(fd),
        duplicates_section(fd, num_items),
        pair_diff_section(fd, min(num_items, 10)),
        components_section(fd, num_items),
        outliers_section(fd, num_items),
        stats_section(fd, num_items),
        similarity_section(fd, num_items),
    ])
    return (f"<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{_esc(title)}</title><style>{_CSS}</style></head>"
            f"<body>{sections}</body></html>")
