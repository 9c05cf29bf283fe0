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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

# --- fingerprint alignment for texts beyond the SAM cap --------------------
# Rolling k-gram hashes, threshold-sampled (keep h < 2^64/32 — the "0 mod p"
# winnowing variant from Schleimer et al. '03 §2, multiply-shift instead of
# modulo per the sandbox numpy quirk). Identical substrings in two texts
# select identical fingerprints, so the dominant (pos_b - pos_a) diagonal
# locates the shared region and the exact SAM runs on a cap-sized window
# around it instead of blindly truncating at the prefix.

_FP_K = 20
_FP_THRESH = np.uint64(1) << np.uint64(59)          # keeps ~1/32 of positions
_FP_MULT = np.uint64(0x9E3779B97F4A7C15)


def _fingerprints(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, char positions) of threshold-sampled rolling k-gram hashes.

    utf-32-le gives exactly one array element per CHARACTER, so positions
    index the Python string directly (utf-8 byte offsets would mislocate
    the window for any non-ASCII text)."""
    b = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(b) - _FP_K + 1
    if n <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = np.zeros(n, dtype=np.uint64)
    for i in range(_FP_K):
        h *= _FP_MULT
        h += b[i:i + n]
    sel = np.nonzero(h < _FP_THRESH)[0]
    return h[sel], sel.astype(np.int64)


def _align_windows(ta: str, tb: str, cap: int) -> tuple[str, str]:
    """cap-sized windows of (ta, tb) centered on their dominant shared-
    fingerprint diagonal; prefix truncation when nothing matches."""
    ha, pa = _fingerprints(ta)
    hb, pb = _fingerprints(tb)
    if len(ha) == 0 or len(hb) == 0:
        return ta[:cap], tb[:cap]
    m = pd.DataFrame({"h": ha, "pa": pa}).merge(
        pd.DataFrame({"h": hb, "pb": pb}), on="h")
    if m.empty:
        return ta[:cap], tb[:cap]
    if len(m) > 100_000:                       # bound skew from repetitive text
        m = m.sample(100_000, random_state=0)
    step = max(cap // 4, 1)
    bucket = ((m["pb"] - m["pa"]) // step).to_numpy()
    vals, counts = np.unique(bucket, return_counts=True)
    dom = m[bucket == vals[np.argmax(counts)]].sort_values("pa")
    mid = dom.iloc[len(dom) // 2]
    a0 = max(0, int(mid["pa"]) - cap // 2)
    b0 = max(0, int(mid["pb"]) - cap // 2)
    return ta[a0:a0 + cap], tb[b0:b0 + cap]


def lcs_length(s: str, t: str) -> int:
    """Longest common substring length via a suffix automaton of ``s``.

    Dispatches to the compiled kernel when available (functions/
    lcs_native.py — compiled once per worker host, bit-identical results,
    fuzz-pinned by tests/test_lcs_native.py); the pure-Python construction
    below (Blumer et al. 1985) is the reference implementation and the
    automatic fallback when no C toolchain is present.
    """
    if not s or not t:
        return 0
    lib = _native_lib()
    if lib is not None:
        a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        r = int(lib.lcs_len_u32(a.ctypes.data, len(a), b.ctypes.data, len(b)))
        if r >= 0:
            return r
        # r < 0: allocation failure inside the kernel — fall through
    return _lcs_length_py(s, t)


def _native_lib():
    from fastdup_spark.functions.lcs_native import native_lib
    return native_lib()


def _lcs_length_py(s: str, t: str) -> int:
    """Pure-Python SAM (reference implementation for the native kernel)."""
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
                num_partitions: int | None = None,
                long_cap_chars: int = 200_000) -> DataFrame:
    """Input: (src, dst, text_a, text_b). Output: (src, dst, lcs_len, containment).

    Distributed by pair: repartition on (src, dst) then mapInPandas — each
    Arrow batch computes its pairs independently (no grouping needed; a pair
    is a self-contained unit of work).

    Texts within ``cap_chars`` get the exact SAM directly. Longer texts (up
    to the ``long_cap_chars`` safety bound) are fingerprint-aligned first:
    the SAM then runs on a cap-sized window around the shared region, so a
    containment hiding at offset >cap is detected at the same O(cap) cost
    per pair (round-1 gap: prefix truncation missed it).
    """
    def _run(it):
        for pdf in it:
            out = []
            for src, dst, ta, tb in zip(pdf["src"], pdf["dst"], pdf["text_a"], pdf["text_b"]):
                ta = ta or ""
                tb = tb or ""
                if len(ta) > len(tb):   # SAM over the shorter string is cheaper
                    ta, tb = tb, ta
                # denominator capped like the numerator (lcs_len <= cap), so
                # identical long docs still report containment 1.0
                m = min(len(ta), len(tb), cap_chars)
                if len(tb) > cap_chars:
                    ta_w, tb_w = _align_windows(ta, tb, cap_chars)
                else:
                    ta_w, tb_w = ta, tb
                l = lcs_length(ta_w, tb_w)
                out.append((src, dst, l, (l / m) if m else 0.0))
            yield pd.DataFrame(out, columns=["src", "dst", "lcs_len", "containment"])

    df = pairs_with_text.select(
        "src", "dst",
        F.substring("text_a", 1, long_cap_chars).alias("text_a"),
        F.substring("text_b", 1, long_cap_chars).alias("text_b"),
    )
    if num_partitions:
        df = df.repartition(num_partitions, "src", "dst")
    return df.mapInPandas(_run, LCS_SCHEMA)
