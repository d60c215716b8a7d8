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


def test_banded_adaptive_is_exact():
    """The band-doubling aligner must reproduce the exact optimum (it
    doubles until ed <= band) and emit a valid CIGAR, from a deliberately
    tiny initial band so the doubling path is exercised."""
    from scrooge_tpu.baselines import banded_semiglobal

    for t, q in _cases(11, 60):
        ed, cigar = banded_semiglobal(t, q, initial_band=1)
        assert ed == _brute_semiglobal(t, q), (t, q)
        validate_cigar(cigar, ed, t, q)


def test_edlib_crosscheck():
    """Third-party cross-check through a REAL edlib: the PyPI package
    when installed, else the reference's vendored sources compiled on
    demand and bound with ctypes (baselines._edlib_lib) — the same
    library the reference races (cpu_baseline.cpp:355). Skipped only when
    neither a compiler nor the sources exist."""
    from scrooge_tpu import baselines
    from scrooge_tpu.baselines import edlib_semiglobal

    if not baselines.edlib_available():
        pytest.skip("no edlib (pip package or SCROOGE_EDLIB_SRC + g++)")
    for t, q in _cases(12, 40):
        assert edlib_semiglobal(t, q) == _brute_semiglobal(t, q)


def test_edlib_cigar_path():
    """EDLIB_TASK_PATH binding: the returned extended CIGAR must be a
    valid optimal semiglobal alignment (the reference's accuracy path,
    edlib_to_alignment, cpu_baseline.cpp:294-305)."""
    from scrooge_tpu import baselines

    if baselines._edlib_lib() is None:
        pytest.skip("no edlib ctypes build available")
    from scrooge_tpu.cigar import validate_cigar

    for t, q in _cases(13, 25):
        ed, cigar = baselines.edlib_semiglobal_cigar(t, q)
        assert ed == _brute_semiglobal(t, q), (t, q)
        validate_cigar(cigar, ed, t, q)
    assert baselines.edlib_semiglobal_cigar("ACGT", "") == (0, "")


def _brute_affine(text, query, match=2, mismatch=4, go=4, ge=2):
    """Scalar Gotoh reference for the affine baseline."""
    n, m = len(text), len(query)
    NEG = -(1 << 40)
    H = [[NEG] * (n + 1) for _ in range(m + 1)]
    E = [[NEG] * (n + 1) for _ in range(m + 1)]
    F = [[NEG] * (n + 1) for _ in range(m + 1)]
    H[0][0] = 0
    for j in range(1, n + 1):
        E[0][j] = -(go + ge * j)
        H[0][j] = E[0][j]
    for i in range(1, m + 1):
        H[i][0] = -(go + ge * i)
        F[i][0] = H[i][0]
        for j in range(1, n + 1):
            E[i][j] = max(H[i][j - 1] - go - ge, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go - ge, F[i - 1][j] - ge)
            s = match if text[j - 1] == query[i - 1] else -mismatch
            H[i][j] = max(H[i - 1][j - 1] + s, E[i][j], F[i][j])
    return max(H[m])


def test_affine_matches_bruteforce_and_rescoring():
    from scrooge_tpu.baselines import affine_semiglobal
    from scrooge_tpu.cigar import affine_score, validate_cigar

    for t, q in _cases(9, 40):
        if not q:
            continue
        score, cigar = affine_semiglobal(t, q)
        assert score == _brute_affine(t, q), (t, q)
        # the CIGAR's affine rescoring must equal the DP score, and the
        # alignment must be semantically valid
        assert affine_score(cigar) == score, (t, q, cigar)
        edits = sum(c for c, op in
                    __import__("scrooge_tpu.cigar", fromlist=["parse_cigar"]
                               ).parse_cigar(cigar) if op in "IDX")
        validate_cigar(cigar, edits, t, q)


def _brute_affine_global(text, query, match=2, mismatch=4, go=4, ge=2):
    """O(n*m) global affine score (both sequences fully consumed)."""
    n, m = len(text), len(query)
    NEG = -(1 << 29)
    H = [[NEG] * (n + 1) for _ in range(m + 1)]
    E = [[NEG] * (n + 1) for _ in range(m + 1)]
    F = [[NEG] * (n + 1) for _ in range(m + 1)]
    H[0][0] = 0
    for j in range(1, n + 1):
        F[0][j] = H[0][j] = -(go + ge * j)
    for i in range(1, m + 1):
        E[i][0] = H[i][0] = -(go + ge * i)
        for j in range(1, n + 1):
            E[i][j] = max(H[i][j - 1] - go - ge, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go - ge, F[i - 1][j] - ge)
            s = match if text[j - 1] == query[i - 1] else -mismatch
            H[i][j] = max(H[i - 1][j - 1] + s, E[i][j], F[i][j])
    return H[m][n]


def test_gact_tiled_valid_and_single_tile_optimal():
    """GACT tiling baseline: perfect inputs give all-'=', every CIGAR is
    semantically valid, and a single tile that consumes both sequences
    entirely reproduces the optimal global affine score."""
    from scrooge_tpu.baselines import gact_tiled
    from scrooge_tpu.cigar import affine_score, parse_cigar

    assert gact_tiled("ACGTACGTAA", "ACGTACGTAA") == "10="

    rng = random.Random(77)
    for _ in range(25):
        L = rng.randint(4, 70)
        t = "".join(rng.choice("ACGT") for _ in range(L))
        q = "".join(c if rng.random() > 0.08 else rng.choice("ACGT")
                    for c in t)  # substitutions only: same length
        cigar = gact_tiled(t, q, T=128, O=16)
        runs = parse_cigar(cigar)
        qlen = sum(c for c, op in runs if op in "=XI")
        tlen = sum(c for c, op in runs if op in "=XD")
        assert qlen == len(q)
        assert tlen <= len(t)
        # equal-length substitution-only pairs: the global optimum ends
        # at the far corner, which a single covering tile must find
        if tlen == len(t):
            assert affine_score(cigar) == _brute_affine_global(t, q), (t, q)

    # multi-tile path stays valid and matches on indel cases
    rng = random.Random(78)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    read = "".join(c for c in genome[:500] if rng.random() > 0.05)
    cigar = gact_tiled(genome, read, T=96, O=24)
    runs = parse_cigar(cigar)
    assert sum(c for c, op in runs if op in "=XI") == len(read)
    frac_eq = sum(c for c, op in runs if op == "=") / len(read)
    assert frac_eq > 0.9, frac_eq


def _penalty_oracle(text, query, x, o, e, semiglobal):
    """Independent min-plus Gotoh DP in WFA penalty space: matches free,
    mismatch x, a length-L gap costs o + e*L."""
    n, m = len(text), len(query)
    INF = 1 << 28
    H = [0] + [o + e * j for j in range(1, n + 1)]
    E = [INF] * (n + 1)
    F = [INF] * (n + 1)
    for i in range(1, m + 1):
        prev = H
        H = [o + e * i] + [0] * n
        F = [min(F[j], prev[j] + o) + e for j in range(n + 1)]
        F[0] = H[0]
        E = [INF] * (n + 1)
        for j in range(1, n + 1):
            E[j] = min(E[j - 1], H[j - 1] + o) + e
            d = prev[j - 1] + (0 if text[j - 1] == query[i - 1] else x)
            H[j] = min(d, E[j], F[j])
    return min(H) if semiglobal else H[n]


def _cigar_penalty(cigar, x, o, e):
    from scrooge_tpu.cigar import parse_cigar

    p = 0
    for cnt, op in parse_cigar(cigar):
        if op == "X":
            p += x * cnt
        elif op in "ID":
            p += o + e * cnt
    return p


def _check_wfa_cigar(cigar, text, query, semiglobal):
    from scrooge_tpu.cigar import parse_cigar

    i = j = 0
    for cnt, op in parse_cigar(cigar):
        for _ in range(cnt):
            if op == "=":
                assert query[i] == text[j]
                i, j = i + 1, j + 1
            elif op == "X":
                assert query[i] != text[j]
                i, j = i + 1, j + 1
            elif op == "I":
                i += 1
            else:
                j += 1
    assert i == len(query)
    assert j <= len(text) if semiglobal else j == len(text)


def test_wfa_matches_penalty_oracle():
    """wfa_global/wfa_semiglobal are exact: optimal penalty equals an
    independent min-plus Gotoh oracle, and the returned CIGAR re-derives
    exactly that penalty (so the traceback is an optimal path)."""
    from scrooge_tpu.wfa import wfa_global, wfa_semiglobal

    for idx, (t, q) in enumerate(_cases(42, 40)):
        # vary penalties, including o=0 (linear gaps) and x < e
        x, o, e = [(4, 6, 2), (1, 0, 1), (2, 3, 1), (5, 1, 3)][idx % 4]
        for semi, fn in ((True, wfa_semiglobal), (False, wfa_global)):
            pen, cigar = fn(t, q, x, o, e)
            assert pen == _penalty_oracle(t, q, x, o, e, semi), (t, q)
            assert _cigar_penalty(cigar, x, o, e) == pen, (t, q, cigar)
            _check_wfa_cigar(cigar, t, q, semi)


def test_wfa_distance_low_memory_matches_full():
    from scrooge_tpu.wfa import (wfa_distance, wfa_global,
                                 wfa_semiglobal)

    for idx, (t, q) in enumerate(_cases(43, 20)):
        x, o, e = [(4, 6, 2), (2, 3, 1)][idx % 2]
        for semi, fn in ((True, wfa_semiglobal), (False, wfa_global)):
            pen, _ = fn(t, q, x, o, e)
            assert wfa_distance(t, q, x, o, e, semiglobal=semi) == pen


def test_wfa_semiglobal_unit_penalties_is_edit_distance():
    """x=1, o=0, e=1 penalties turn WFA into plain semiglobal edit
    distance — cross-checks it against the repo's other exact aligners."""
    from scrooge_tpu.wfa import wfa_semiglobal

    for t, q in _cases(44, 30):
        pen, _ = wfa_semiglobal(t, q, x=1, o=0, e=1)
        assert pen == _brute_semiglobal(t, q)


def _brute_local_affine(t, q, mat=2, mis=4, go=4, ge=2):
    n, m = len(t), len(q)
    NEG = -(10**9)
    H = [[0] * (n + 1) for _ in range(m + 1)]
    E = [[NEG] * (n + 1) for _ in range(m + 1)]
    F = [[NEG] * (n + 1) for _ in range(m + 1)]
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            E[i][j] = max(E[i][j - 1] - ge, H[i][j - 1] - go - ge)
            F[i][j] = max(F[i - 1][j] - ge, H[i - 1][j] - go - ge)
            d = H[i - 1][j - 1] + (mat if t[j - 1] == q[i - 1] else -mis)
            H[i][j] = max(0, d, E[i][j], F[i][j])
            best = max(best, H[i][j])
    return best


def test_local_affine_matches_bruteforce():
    """local_affine (the CUDASW++ local-alignment role) is exact, and its
    segment CIGAR rescoring equals the optimal local score."""
    from scrooge_tpu.baselines import local_affine
    from scrooge_tpu.cigar import parse_cigar

    rng = random.Random(9)
    for trial in range(40):
        n = rng.randrange(0, 50)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        if rng.random() < 0.5 and n > 5:
            q = "".join(c if rng.random() > 0.15 else rng.choice("ACGT")
                        for c in t[rng.randrange(n // 2):])
        else:
            q = "".join(rng.choice("ACGT")
                        for _ in range(rng.randrange(0, 50)))
        score, cigar, qs, ts = local_affine(t, q)
        assert score == _brute_local_affine(t, q), (t, q)
        if not cigar:
            continue
        s, i, j = 0, qs, ts
        for cnt, op in parse_cigar(cigar):
            if op == "=":
                for _ in range(cnt):
                    assert q[i] == t[j]
                    i, j = i + 1, j + 1
                s += 2 * cnt
            elif op == "X":
                for _ in range(cnt):
                    assert q[i] != t[j]
                    i, j = i + 1, j + 1
                s -= 4 * cnt
            else:
                s -= 4 + 2 * cnt
                if op == "I":
                    i += cnt
                else:
                    j += cnt
        assert s == score, (t, q, cigar)
