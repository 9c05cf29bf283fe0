"""Report generation — the text analog of the reference's HTML galleries.

The reference renders duplicates/outliers/components/stats galleries to HTML
with thumbnails (create_duplicates_gallery etc., /root/reference/fastdup/
galleries.py:570-700,1081-1308, html_writer.py). For webtext the equivalent
deliverable is a markdown report over the same query plans: top duplicate
pairs, top components with member urls, most-extreme outliers, stats
summaries. Each builder takes the small, already-limited head of a stage
query (driver-side rendering of <= ``num_items`` rows — same shape as the
reference's galleries, which also collect the top-N to render).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _md_table(rows: list[dict], cols: list[str]) -> str:
    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out)


def duplicates_report(fd, num_items: int = 20) -> str:
    """≈ create_duplicates_gallery: top similarity pairs, url-resolved."""
    rows = [r.asDict() for r in fd.similarity().limit(num_items).collect()]
    for r in rows:
        r["jaccard"] = round(r["jaccard"], 4)
    body = _md_table(rows, ["url_from", "url_to", "jaccard"]) if rows else "_none_"
    return f"# Top duplicate pairs\n\n{body}\n"


def components_report(fd, num_items: int = 20) -> str:
    """≈ create_components_gallery / find_top_components."""
    rows = [r.asDict() for r in fd.components_grouped(limit=num_items).collect()]
    lines = ["# Top duplicate clusters", ""]
    for r in rows:
        lines.append(f"## component {r['component_id']} — {r['count']} docs")
        lines.extend(f"- {u}" for u in r["urls"][:10])
        if r["count"] > 10:
            lines.append(f"- … {r['count'] - 10} more")
        lines.append("")
    return "\n".join(lines) if rows else "# Top duplicate clusters\n\n_none_\n"


def outliers_report(fd, num_items: int = 20) -> str:
    """≈ create_outliers_gallery: most-unique docs."""
    rows = [r.asDict() for r in fd.outliers().limit(num_items).collect()]
    for r in rows:
        r["best_sim"] = round(r["best_sim"], 4)
    body = _md_table(rows, ["url", "best_sim"]) if rows else "_none_"
    return f"# Outliers (most unique)\n\n{body}\n"


def stats_report(fd, num_items: int = 20, metric: str = "n_chars",
                 ascending: bool = False) -> str:
    """≈ create_stats_gallery: extreme docs by a chosen metric."""
    order = F.asc(metric) if ascending else F.desc(metric)
    df = (
        fd.doc_stats().join(fd.docs().select("doc_id", "url"), "doc_id")
        .orderBy(order, "doc_id").limit(num_items)
        .select("url", metric)
    )
    rows = [r.asDict() for r in df.collect()]
    body = _md_table(rows, ["url", metric]) if rows else "_none_"
    return f"# Extreme docs by {metric}\n\n{body}\n"


def summary_report(fd) -> str:
    s = fd.summary()
    lines = ["# Run summary", ""]
    lines.extend(f"- **{k}**: {v}" for k, v in s.items())
    return "\n".join(lines) + "\n"


def full_report(fd, num_items: int = 20) -> str:
    """One markdown document with every gallery (≈ the examples-ci flow that
    renders all five galleries after fd.run())."""
    return "\n\n".join([
        summary_report(fd),
        duplicates_report(fd, num_items),
        components_report(fd, num_items),
        outliers_report(fd, num_items),
        stats_report(fd, num_items),
    ])
