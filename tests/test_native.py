"""Native post-processing parity with the pure-Python implementations."""

import numpy as np
import pytest

from scrooge_tpu import native
from scrooge_tpu.cigar import affine_score
from scrooge_tpu.ops.postprocess import entries_to_cigars


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native compiler available")
    return lib


def _random_entries(seed, cap=40, B=64):
    rng = np.random.default_rng(seed)
    ops = rng.integers(0, 4, (cap, B), dtype=np.uint16)
    cnts = rng.integers(1, 4096, (cap, B), dtype=np.uint16)
    entries = (ops << 12) | cnts
    totals = rng.integers(0, cap + 1, B, dtype=np.int32)
    slot = np.arange(cap)[:, None]
    entries = np.where(slot < totals[None, :], entries, 0).astype(np.uint16)
    return entries, totals


def test_format_cigars_matches_numpy(lib):
    entries, totals = _random_entries(0)
    got = native.format_cigars(entries, totals)
    want = entries_to_cigars(entries, totals)
    assert got == want


def test_format_cigars_empty(lib):
    entries = np.zeros((4, 8), np.uint16)
    totals = np.zeros(8, np.int32)
    assert native.format_cigars(entries, totals) == [""] * 8


def test_affine_scores_matches_python(lib):
    entries, totals = _random_entries(3)
    got = native.affine_scores(entries, totals)
    want = []
    for cigars in entries_to_cigars(entries, totals):
        want.append(affine_score(cigars) if cigars else 0)
    assert got.tolist() == want
