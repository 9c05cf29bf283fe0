"""Longest-common-substring confirm stage (suffix automaton, O(n+m) per pair).

Not present in the reference (its verify is the C++ cosine threshold); required
by BASELINE.json:north_rule as the containment-confirm stage: candidate pairs
whose Jaccard is below the dup threshold may still be containment duplicates
(one doc embeds the other verbatim). A pair is "containment-confirmed" when
the longest common substring is at least ``min_len`` characters.

Cost discipline (SURVEY §7 hard part 4): texts are capped at ``cap_chars``
and the stage only runs on pairs that already passed the cheap LSH + sig-
Jaccard prefilter, keeping it off the critical path. Executed via
``applyInPandas`` — Arrow-batched; the per-pair Python is the algorithm body,
never a Spark row UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def lcs_length(s: str, t: str) -> int:
    """Longest common substring length via a suffix automaton of ``s``.

    Standard construction (Blumer et al. 1985): build SAM of s in O(|s|),
    then stream t through it tracking current match length.
    """
    if not s or not t:
        return 0
    # SAM arrays: link, length, transitions (list of dicts)
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict[str, int]] = [{}]
    last = 0
    for ch in s:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        p = last
        while p != -1 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                while p != -1 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    # stream t
    v, length, best = 0, 0, 0
    for ch in t:
        while v and ch not in sa_next[v]:
            v = sa_link[v]
            length = sa_len[v]
        if ch in sa_next[v]:
            v = sa_next[v][ch]
            length += 1
            if length > best:
                best = length
    return best


LCS_SCHEMA = StructType([
    StructField("src", LongType(), False),
    StructField("dst", LongType(), False),
    StructField("lcs_len", LongType(), False),
    StructField("containment", DoubleType(), False),  # lcs_len / min(len_a, len_b)
])


def lcs_confirm(pairs_with_text: DataFrame, cap_chars: int = 20000,
                num_partitions: int | None = None) -> DataFrame:
    """Input: (src, dst, text_a, text_b). Output: (src, dst, lcs_len, containment).

    Distributed by pair: repartition on (src, dst) then mapInPandas — each
    Arrow batch computes its pairs independently (no grouping needed; a pair
    is a self-contained unit of work).
    """
    def _run(it):
        for pdf in it:
            out = []
            for src, dst, ta, tb in zip(pdf["src"], pdf["dst"], pdf["text_a"], pdf["text_b"]):
                ta = (ta or "")[:cap_chars]
                tb = (tb or "")[:cap_chars]
                if len(ta) > len(tb):   # SAM over the shorter string is cheaper
                    ta, tb = tb, ta
                l = lcs_length(ta, tb)
                m = min(len(ta), len(tb))
                out.append((src, dst, l, (l / m) if m else 0.0))
            yield pd.DataFrame(out, columns=["src", "dst", "lcs_len", "containment"])

    df = pairs_with_text.select(
        "src", "dst",
        F.substring("text_a", 1, cap_chars).alias("text_a"),
        F.substring("text_b", 1, cap_chars).alias("text_b"),
    )
    if num_partitions:
        df = df.repartition(num_partitions, "src", "dst")
    return df.mapInPandas(_run, LCS_SCHEMA)
