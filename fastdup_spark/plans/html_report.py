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


def full_html_report(fd, num_items: int = 20, title: str = "fastdup-spark report") -> str:
    """One standalone HTML document with every gallery."""
    sections = "\n".join([
        summary_section(fd),
        duplicates_section(fd, num_items),
        components_section(fd, num_items),
        outliers_section(fd, num_items),
        stats_section(fd, num_items),
        similarity_section(fd, num_items),
    ])
    return (f"<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{_esc(title)}</title><style>{_CSS}</style></head>"
            f"<body>{sections}</body></html>")
