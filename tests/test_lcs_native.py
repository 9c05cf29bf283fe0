"""Compiled LCS kernel (functions/lcs_native.py): bit-identical to the
pure-Python suffix automaton, compile-once caching, honest fallback."""

import random

import pytest

from fastdup_spark.functions.lcs import _lcs_length_py, lcs_length
from fastdup_spark.functions.lcs_native import native_lib


def _rand_pair(rng, alphabet):
    n, m = rng.randint(0, 120), rng.randint(0, 120)
    s = "".join(rng.choice(alphabet) for _ in range(n))
    t = "".join(rng.choice(alphabet) for _ in range(m))
    if rng.random() < 0.5 and n > 10:
        # plant a shared substring so long matches are exercised
        a, b = sorted(rng.sample(range(n), 2))
        t = t[: m // 2] + s[a:b] + t[m // 2:]
    return s, t


def test_native_kernel_builds_here():
    # this sandbox ships gcc — the kernel must actually be in use, so the
    # equality fuzz below is a real cross-check, not fallback-vs-fallback
    assert native_lib() is not None


def test_native_matches_python_fuzz():
    rng = random.Random(11)
    alphabets = ["ab", "abcd", "abcdefgh é中\U0001F600",
                 "aaab", " \tthe quick brown fox"]
    for i in range(400):
        s, t = _rand_pair(rng, alphabets[i % len(alphabets)])
        assert lcs_length(s, t) == _lcs_length_py(s, t), (s, t)


def test_native_edge_cases():
    cases = [("", ""), ("", "x"), ("x", ""), ("x", "x"),
             ("abc", "abc"), ("abc", "xyz"),
             ("a" * 5000, "b" * 10 + "a" * 4000),
             ("éèê" * 100, "xèêy" * 50)]
    for s, t in cases:
        assert lcs_length(s, t) == _lcs_length_py(s, t), (len(s), len(t))


def test_fallback_env_kill_switch(monkeypatch):
    import fastdup_spark.functions.lcs_native as nat

    monkeypatch.setenv("FASTDUP_SPARK_NO_NATIVE_LCS", "1")
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_lib", None)
    assert nat.native_lib() is None
    # dispatcher still answers correctly through the Python SAM
    assert lcs_length("hello world", "say hello") == len("hello")


@pytest.mark.parametrize("n", [20000])
def test_native_is_actually_faster(n):
    """Not a strict perf assert (host noise ~2x, so min-of-3 on BOTH
    sides per the repo's own noise rule) — a sanity floor: the kernel
    must beat pure Python by >= 3x on a cap-sized pair, else the
    dispatch is pointless."""
    import time

    if native_lib() is None:
        pytest.skip("no native kernel")
    rng = random.Random(3)
    s = "".join(rng.choice("abcdefgh ") for _ in range(n))
    t = s[: n // 2] + "".join(rng.choice("abcdefgh ") for _ in range(n // 2))

    def best_of(fn, trials=3):
        results = []
        times = []
        for _ in range(trials):
            t0 = time.time()
            results.append(fn(s, t))
            times.append(time.time() - t0)
        assert len(set(results)) == 1
        return results[0], min(times)

    r_native, t_native = best_of(lcs_length)
    r_py, t_py = best_of(_lcs_length_py)
    assert r_native == r_py
    assert t_native * 3 < t_py, (t_native, t_py)


def test_compile_failure_logs_compiler_stderr(tmp_path, monkeypatch, caplog):
    # r06 verdict #9: the silent 9-13x Python-SAM fallback must announce
    # itself with the compiler's own stderr at WARNING level.
    import logging
    import subprocess

    import fastdup_spark.functions.lcs_native as m

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    monkeypatch.setattr("tempfile.tempdir", None)
    monkeypatch.setattr(m, "_tried", False)
    monkeypatch.setattr(m, "_lib", None)

    def boom(*a, **k):
        raise subprocess.CalledProcessError(
            1, a[0], output=b"", stderr=b"cc1: fatal error: no such thing")

    monkeypatch.setattr(subprocess, "run", boom)
    with caplog.at_level(logging.WARNING, logger="fastdup_spark.lcs_native"):
        assert m.native_lib() is None
    joined = " ".join(r.message for r in caplog.records)
    assert "no such thing" in joined and "Python SAM" in joined
    # reset module state so later tests re-probe the real kernel
    monkeypatch.setattr(m, "_tried", False)
    monkeypatch.setattr(m, "_lib", None)
