"""Corpus mixing: temperature- and UniMax-style per-group token budgets.

Multilingual / multi-source training corpora are not sampled uniformly:
low-resource groups are up-weighted so the model sees them at all, and
high-resource groups are capped so they don't drown everything else.
Two public allocation schemes, both reduced to per-group sampling rates:

* **Temperature sampling** (exponent-smoothed, mBERT/XLM-R style):
  group g gets budget share ∝ n_g^alpha. alpha=1 reproduces natural
  proportions; alpha→0 approaches uniform-over-groups.
* **UniMax** (Chung et al. 2023): distribute the total budget as
  uniformly as possible across groups, subject to a per-group epoch cap
  (a group can supply at most ``max_epochs * n_g`` rows). Water-filling:
  groups that saturate their cap return the leftover to the still-open
  groups.

Scale shape: group cardinality (languages, sources) is tiny, so the
allocation runs DRIVER-SIDE on exact integer group counts — one
map-side-combined groupBy produces them — and the result re-enters the
plan as a broadcast ≤|groups|-row rate table. The application is the
``hash_rate_sample`` filter per group (operators/sampling.py): a
map-side md5-threshold test that fuses into the scan. ZERO shuffle of
the corpus at any point — the 100-TB mixing path.

Cross-engine determinism: rates are quantized to integer parts-per-
million and the 8-hex-char keep threshold is derived with pure integer
arithmetic (``rate_ppm * 2^32 // 10^6``), so Spark and the DuckDB
oracle compute bit-identical thresholds from the same dumped ppm —
no float pow/sum ordering can leak into the kept-row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_sizes(df: DataFrame, group_col: str) -> dict:
    """Exact per-group row counts (one partial-agg groupBy; the result
    is |groups| rows — languages/sources, not documents)."""
    rows = df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    if any(r[group_col] is None for r in rows):
        raise ValueError(f"NULL {group_col} present; filter or impute "
                         "before allocating a mixing budget")
    return {r[group_col]: int(r["n"]) for r in rows}


def temperature_allocation(sizes: dict, total: int,
                           alpha: float = 0.5) -> dict:
    """Per-group quotas with budget share ∝ n^alpha, capped at n.

    Deterministic largest-remainder rounding (ties by group key), then
    water-filling: a group whose share exceeds its size saturates and
    the leftover re-divides among open groups by the same weights.
    Quotas sum to min(total, sum(sizes)).
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    _check_sizes(sizes)
    weights = {g: float(n) ** alpha for g, n in sizes.items()}
    return _water_fill(sizes, min(total, sum(sizes.values())), weights)


def unimax_allocation(sizes: dict, total: int,
                      max_epochs: float = 1.0) -> dict:
    """UniMax: as-uniform-as-possible quotas under a per-group epoch cap.

    Each group may supply at most ``floor(max_epochs * n_g)`` rows;
    within that constraint the budget spreads uniformly (weights all 1),
    saturated groups returning their leftover to the open ones.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    _check_sizes(sizes)
    caps = {g: min(n, int(max_epochs * n)) for g, n in sizes.items()}
    alloc = _water_fill({g: caps[g] for g in sizes},
                        min(total, sum(caps.values())),
                        {g: 1.0 for g in sizes})
    return alloc


def _check_sizes(sizes: dict) -> None:
    if not sizes:
        raise ValueError("sizes is empty")
    bad = {g: n for g, n in sizes.items() if n < 1}
    if bad:
        raise ValueError(f"group sizes must be >= 1: {bad}")


def _water_fill(sizes: dict, total: int, weights: dict) -> dict:
    """Distribute ``total`` by ``weights``, capping each group at its
    size; saturated groups' leftover re-divides among open groups.
    Deterministic: largest-remainder rounding, ties broken by the
    sorted group key's string form."""
    alloc = {g: 0 for g in sizes}
    open_g = [g for g in sizes if sizes[g] > 0]
    remaining = total
    while remaining > 0 and open_g:
        wsum = sum(weights[g] for g in open_g)
        # integer largest-remainder split of `remaining` by weight
        exact = {g: remaining * weights[g] / wsum for g in open_g}
        base = {g: int(exact[g]) for g in open_g}
        slack = remaining - sum(base.values())
        order = sorted(open_g, key=lambda g: (-(exact[g] - base[g]),
                                              str(g)))
        for g in order[:slack]:
            base[g] += 1
        progressed = False
        for g in open_g:
            take = min(base[g], sizes[g] - alloc[g])
            alloc[g] += take
            remaining -= take
            progressed = progressed or take > 0
        open_g = [g for g in open_g if alloc[g] < sizes[g]]
        if not progressed:
            break  # all open groups got 0 this round (remaining < |open|
            # after rounding starvation is impossible, but stay safe)
    return alloc


def rates_ppm(alloc: dict, sizes: dict) -> dict:
    """Quota → sampling rate in parts-per-million (floor; a group whose
    quota equals its size keeps EVERY row via the rate-1.0 sentinel)."""
    out = {}
    for g, q in alloc.items():
        n = sizes[g]
        out[g] = 1_000_000 if q >= n else (q * 1_000_000) // n
    return out


def threshold_hex(rate_ppm: int) -> str:
    """Keep iff substr(md5(salt||id),1,8) < this. Pure integer math so
    every engine derives the identical threshold from the same ppm
    ('g' sorts after all hex: the keep-everything sentinel)."""
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError(f"rate_ppm must be in [0, 1e6], got {rate_ppm}")
    if rate_ppm == 1_000_000:
        return "g"
    return format((rate_ppm * (1 << 32)) // 1_000_000, "08x")


def apply_mix(df: DataFrame, rate_ppm_by_group: dict, group_col: str,
              id_col: str = "doc_id", salt: str = "mix:") -> DataFrame:
    """Filter to ~rate_ppm of each group, deterministically, with zero
    corpus shuffle: the ≤|groups|-row threshold table broadcast-joins
    onto the scan and the md5 test is a fused map-side filter. Adds
    ``rate_ppm`` (the group's applied rate) to the output. Rows whose
    group has no allocation are dropped."""
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(g, int(p), threshold_hex(int(p)))
         for g, p in sorted(rate_ppm_by_group.items(),
                            key=lambda kv: str(kv[0]))],
        [group_col, "rate_ppm", "__thr"])  # group dtype inferred
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(key < F.col("__thr"))
        .drop("__thr")
    )


def mix_corpus(df: DataFrame, group_col: str, total: int,
               scheme: str = "unimax", alpha: float = 0.5,
               max_epochs: float = 1.0, id_col: str = "doc_id",
               salt: str = "mix:") -> DataFrame:
    """One-call mixing: count groups, allocate driver-side, apply the
    broadcast rate filter. ``scheme`` = 'unimax' | 'temperature'."""
    sizes = group_sizes(df, group_col)
    if scheme == "unimax":
        alloc = unimax_allocation(sizes, total, max_epochs=max_epochs)
    elif scheme == "temperature":
        alloc = temperature_allocation(sizes, total, alpha=alpha)
    else:
        raise ValueError(f"unknown scheme {scheme!r}")
    return apply_mix(df, rates_ppm(alloc, sizes), group_col,
                     id_col=id_col, salt=salt)
