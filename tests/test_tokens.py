"""CIGAR token-compression roundtrip: tokenize (device) -> decode (host)
must reproduce the exact run stream / CIGAR strings of the uncompressed
path (ops/tokens.py format; scroogext.cpp decode_lane)."""

import numpy as np
import pytest

from scrooge_tpu import native
from scrooge_tpu.ops import tokens as tok


def _random_runs(rng, max_cnt=31):
    """One lane's run stream: alternating-ish ops incl. '='-'=' window
    boundaries, same-op edit adjacency, multi-count edits, leading and
    trailing edits."""
    runs = []
    n = int(rng.integers(0, 40))
    prev_op = None
    for _ in range(n):
        op = int(rng.integers(0, 4))
        # '='-'=' adjacency is legal (window boundary); same-op edit
        # adjacency is legal too — keep whatever the rng gives
        cnt = int(rng.integers(1, max_cnt + 1))
        runs.append((op, cnt))
        prev_op = op
    return runs


def _comp_buffer(lanes, cap):
    B = len(lanes)
    comp = np.zeros((cap, B), np.uint8)
    totals = np.zeros(B, np.int32)
    for b, runs in enumerate(lanes):
        totals[b] = len(runs)
        for g, (op, cnt) in enumerate(runs):
            comp[g, b] = (op << 6) | cnt
    return comp, totals


def _cigar(runs):
    return "".join(f"{c}{'=XID'[o]}" for o, c in runs)


@pytest.fixture(scope="module")
def cases():
    rng = np.random.default_rng(11)
    lanes = [_random_runs(rng) for _ in range(257)]
    lanes[0] = []                      # empty lane
    lanes[1] = [(2, 1)]                # single insertion
    lanes[2] = [(0, 31), (0, 31)]      # '='-'=' boundary at max count
    lanes[3] = [(1, 31), (1, 2)]       # same-op edit adjacency, multi-count
    lanes[4] = [(3, 5)]                # leading multi-delete
    cap = max(len(r) for r in lanes)
    comp, totals = _comp_buffer(lanes, cap)
    toks2 = np.asarray(tok.tokenize_u8(comp))
    tok_totals = (toks2 != 0).sum(axis=0).astype(np.int32)
    capT = int(tok_totals.max())
    toksc = np.asarray(tok.compact_tokens(toks2, capT))
    return lanes, comp, totals, toksc, tok_totals


def test_token_roundtrip_py(cases):
    lanes, _, _, toksc, tok_totals = cases
    decoded = tok.decode_tokens_py(toksc, tok_totals)
    assert decoded == lanes


def test_token_compression_ratio(cases):
    lanes, _, totals, _, tok_totals = cases
    # hard bound: every run emits at most 2 tokens
    assert (tok_totals <= 2 * totals).all()
    # a typical CIGAR stream (alternating '='-run / single edit) must
    # collapse to ~half the runs
    alt = [(0, 19), (1, 1)] * 20
    comp, tots = _comp_buffer([alt], len(alt))
    toks = np.asarray(tok.tokenize_u8(comp))
    n_tok = int((toks != 0).sum())
    assert n_tok == len(alt) // 2
    assert tok.decode_tokens_py(
        np.asarray(tok.compact_tokens(toks, n_tok)),
        np.array([n_tok], np.int32)) == [alt]


def test_format_tokens_native(cases):
    lanes, _, _, toksc, tok_totals = cases
    if native.get_ext() is None:
        pytest.skip("no compiler for the native extension")
    got = native.format_tokens(toksc, tok_totals)
    assert got == [_cigar(r) for r in lanes]


def test_tokens_to_runs_native(cases):
    lanes, _, _, toksc, tok_totals = cases
    if native.get_ext() is None:
        pytest.skip("no compiler for the native extension")
    flat, counts = native.tokens_to_runs(toksc, tok_totals)
    assert counts.tolist() == [len(r) for r in lanes]
    offs = np.zeros(len(lanes) + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    for b, runs in enumerate(lanes):
        got = flat[offs[b]: offs[b + 1]]
        want = [(o << 12) | c for o, c in runs]
        assert got.tolist() == want


def test_compact_tokenize_matches_two_step(cases):
    """The fused compact_tokenize must equal compaction then tokenize."""
    lanes, comp, totals, _, tok_totals = cases
    maxw, ne = 8, -(-comp.shape[0] // 8)
    B = comp.shape[1]
    # rebuild a dense per-window layout feeding the same compacted stream
    ent = np.zeros((maxw, ne, B), np.uint16)
    cnts = np.zeros((maxw, B), np.int32)
    for b, runs in enumerate(lanes):
        for g, (op, cnt) in enumerate(runs):
            ent[g // ne, g % ne, b] = (op << 12) | cnt
        # dense prefix per window
        full, rem = divmod(len(runs), ne)
        cnts[:full, b] = ne
        if full < maxw:
            cnts[full, b] = rem
    cap = int(totals.max())
    toks2, run_tot, tok_tot = tok.compact_tokenize(ent, cnts, cap, False)
    assert np.array_equal(np.asarray(run_tot), totals)
    assert np.array_equal(np.asarray(tok_tot), tok_totals)
    capT = int(tok_totals.max())
    toksc = np.asarray(tok.compact_tokens(np.asarray(toks2), capT))
    decoded = tok.decode_tokens_py(toksc, tok_tot)
    assert decoded == lanes


def test_two_level_compaction_matches(cases):
    """compact_tokenize(ne3c>0) — window-local pack + slice + global
    compact — must equal the single-level path, for BOTH row layouts."""
    lanes, comp, totals, _, tok_totals = cases
    maxw, ne = 8, -(-comp.shape[0] // 8)
    B = comp.shape[1]
    dense = np.zeros((maxw, ne, B), np.uint16)
    cnts = np.zeros((maxw, B), np.int32)
    rng = np.random.default_rng(7)
    sparse = np.zeros((maxw, 2 * ne, B), np.uint16)  # zero-padded slots
    for b, runs in enumerate(lanes):
        for g, (op, cnt) in enumerate(runs):
            dense[g // ne, g % ne, b] = (op << 12) | cnt
        full, rem = divmod(len(runs), ne)
        cnts[:full, b] = ne
        if full < maxw:
            cnts[full, b] = rem
        # sparse layout: same runs scattered into 2*ne rows per window,
        # order preserved (the Pallas engines' zero-gapped row shape)
        for w in range(maxw):
            k = int(cnts[w, b])
            if not k:
                continue
            slots = np.sort(rng.choice(2 * ne, size=k, replace=False))
            sparse[w, slots, b] = dense[w, :k, b]
    cap = int(totals.max())
    ne3c = int(cnts.max())
    for ents, sp, ne3 in ((dense, False, ne), (sparse, True, 2 * ne)):
        toks2, run_tot, tok_tot = tok.compact_tokenize(ents, cnts, cap, sp,
                                                       ne3c)
        assert np.array_equal(np.asarray(run_tot), totals), (sp,)
        assert np.array_equal(np.asarray(tok_tot), tok_totals), (sp,)
        capT = int(tok_totals.max())
        toksc = np.asarray(tok.compact_tokens(np.asarray(toks2), capT))
        assert tok.decode_tokens_py(toksc, tok_tot) == lanes, (sp,)


def test_supports_gate():
    from scrooge_tpu.config import AlignConfig

    assert tok.supports(AlignConfig(W=64, O=33))      # tb_limit 31
    assert tok.supports(AlignConfig(W=32, O=17))      # tb_limit 15
    assert not tok.supports(AlignConfig(W=64, O=0))   # tb_limit 64
