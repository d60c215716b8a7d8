"""Exact-baseline aligner tests: against brute force and the GenASM oracle."""

import random

import pytest

from scrooge_tpu import pyref
from scrooge_tpu.baselines import exact_semiglobal, semiglobal_distance
from scrooge_tpu.cigar import validate_cigar
from scrooge_tpu.config import AlignConfig


def _brute_semiglobal(text, query):
    """O(n*m) scalar reference: min over prefixes of Levenshtein."""
    n, m = len(text), len(query)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j - 1] + (text[j - 1] != query[i - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return min(prev)


def _cases(seed, count):
    rng = random.Random(seed)
    out = []
    for _ in range(count):
        n = rng.randint(0, 60)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = "".join(
            c for c in t if rng.random() > 0.1) + "".join(
            rng.choice("ACGT") for _ in range(rng.randint(0, 6)))
        out.append((t, q))
    out += [("", "ACGT"), ("ACGT", ""), ("A", "A"), ("A", "T")]
    return out


def test_distance_matches_bruteforce():
    for t, q in _cases(5, 60):
        assert semiglobal_distance(t, q) == _brute_semiglobal(t, q)


def test_exact_alignment_valid_and_optimal():
    for t, q in _cases(6, 60):
        ed, cigar = exact_semiglobal(t, q)
        assert ed == _brute_semiglobal(t, q)
        validate_cigar(cigar, ed, t, q)


def test_single_window_genasm_is_exact():
    """With W >= both lengths and no windowing, GenASM edit distance equals
    the exact semiglobal distance (the accuracy-comparison premise)."""
    cfg = AlignConfig(W=64, K=64, O=33)
    for t, q in _cases(7, 40):
        if not q or len(q) > 48 or len(t) > 64:
            continue
        ed, _ = pyref.align_pair(t, q, cfg)
        assert ed == semiglobal_distance(t, q)
