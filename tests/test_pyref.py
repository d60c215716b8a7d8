"""Golden-value and oracle tests for the Python reference implementation.

Golden inputs/distances come from the reference's correctness tests
(/root/reference/src/tests.cu:171-271): 9 handcrafted reads against a 16bp
reference with expected edit distances {8,0,3,8,12,6,8,0,48}, including an
empty read, an oversized read, and a length-64 boundary read.
"""

import itertools

import pytest

from scrooge_tpu.config import AlignConfig
from scrooge_tpu import pyref
from scrooge_tpu.cigar import validate_cigar, parse_cigar

GOLDEN_REFERENCE = "AAAACCCCGGGGTTTT"

GOLDEN_READS = [
    ("test_read_4d12m4i", "CCCCGGGGTTTTAAAA", 8),
    ("test_read_16m", "AAAACCCCGGGGTTTT", 0),
    ("test_read_3d7m", "ACCCCGG", 3),
    ("test_read_4m4d4m4i4m", "AAAAGGGGAAAATTTT", 8),
    ("test_read_12s4m", "AAAAAAAAAAAAAAAA", 12),
    ("test_read_1m1s1i3m1s2m3i", "ATTAACGCCTTT", 6),
    ("test_read_oversized", "TTTTAAAACCCCGGGGTTTTAAAA", 8),
    ("test_read_empty", "", 0),
    (
        "test_read_len64",
        "TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTAAAACCCCGGGGTTTTAAAA",
        48,
    ),
]


@pytest.mark.parametrize("desc,read,expected_ed", GOLDEN_READS)
def test_golden_edit_distances(desc, read, expected_ed):
    cfg = AlignConfig()
    ed, cigar = pyref.align_pair(GOLDEN_REFERENCE, read, cfg)
    assert ed == expected_ed, f"{desc}: got {ed}, want {expected_ed}"
    validate_cigar(cigar, ed, GOLDEN_REFERENCE, read)


def test_empty_read_empty_cigar():
    ed, cigar = pyref.align_pair(GOLDEN_REFERENCE, "", AlignConfig())
    assert ed == 0
    assert cigar == ""


def test_perfect_match_long():
    # longer-than-W perfect match exercises the windowing loop; the
    # reference emits per-window runs that are NOT merged across windows.
    text = ("ACGTGATTACA" * 30)[:300]
    cfg = AlignConfig()
    ed, cigar = pyref.align_pair(text, text, cfg)
    assert ed == 0
    runs = parse_cigar(cigar)
    assert all(op == "=" for _, op in runs)
    assert sum(c for c, _ in runs) == 300
    # windowing advances by at most W-O per window
    assert len(runs) >= 300 // (cfg.W - cfg.O)


ALL_MODE_CONFIGS = [
    AlignConfig(store_entries_not_edges=sene,
                discard_entries_not_used_by_traceback=dent,
                early_termination=et)
    for sene, dent, et in itertools.product([True, False], repeat=3)
]


def test_optimization_toggles_are_output_invariant():
    """SENE/DENT/ET change memory layout and work, never outputs."""
    import random

    rng = random.Random(7)
    cases = [(GOLDEN_REFERENCE, r) for _, r, _ in GOLDEN_READS]
    for _ in range(6):
        n = rng.randint(5, 200)
        text = "".join(rng.choice("ACGT") for _ in range(n))
        read = _mutate(text, rng, 0.1)
        cases.append((text, read))

    for text, read in cases:
        results = {
            (pyref.align_pair(text, read, cfg)) for cfg in ALL_MODE_CONFIGS
        }
        assert len(results) == 1, f"modes disagree for ({text!r}, {read!r}): {results}"


def _mutate(seq, rng, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))  # substitution
            continue
        if r < rate:
            out.append(rng.choice("ACGT"))  # insertion
        out.append(c)
    return "".join(out)


def test_random_pairs_cigar_oracle():
    """Property test: every CIGAR must pass the semantic oracle and the
    reported edit distance must equal the CIGAR's edit count."""
    import random

    rng = random.Random(1234)
    cfg = AlignConfig()
    for _ in range(30):
        n = rng.randint(1, 400)
        text = "".join(rng.choice("ACGT") for _ in range(n))
        read = _mutate(text, rng, rng.choice([0.0, 0.05, 0.15]))
        if not read:
            continue
        ed, cigar = pyref.align_pair(text, read, cfg)
        validate_cigar(cigar, ed, text, read)


def test_w32_short_read_config():
    """The short-read representative config (W=32, O=17; plot.py:1304-1331)."""
    cfg = AlignConfig(W=32, K=32, O=17)
    ed, cigar = pyref.align_pair(GOLDEN_REFERENCE, "AAAACCCCGGGGTTTT", cfg)
    assert ed == 0
    validate_cigar(cigar, ed, GOLDEN_REFERENCE, "AAAACCCCGGGGTTTT")


def test_unaligned_within_k_raises():
    cfg = AlignConfig(W=8, K=2, O=3)
    with pytest.raises(ValueError):
        pyref.align_pair("AAAAAAAA", "TTTTTTTT", cfg)
