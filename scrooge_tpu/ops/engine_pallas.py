"""Pallas TPU kernel engine: DP fill + traceback in VMEM.

Same windowed-alignment semantics as engine_xla (and therefore the scalar
oracle and the reference C++, genasm_cpu.cpp:210-438) with the hot per-
window work — pattern-bitmask build, GenASM DP fill, traceback with CIGAR
run emission, and the window-to-window carry update — fused into ONE Pallas
kernel that processes KW consecutive windows per invocation, so the R
traceback table lives entirely in VMEM and never touches HBM. This is the
TPU analogue of the reference GPU's shared-memory DP storage
(genasm_gpu.cu:584-600, DP_MEMORY=SHARED), with lane-tile batching standing
in for the per-pair thread blocks.

TPU-first design decisions (deliberately NOT the GPU mapping):
 - no anti-diagonal wavefront/shuffle_up: batch lanes already fill the VPU,
   so the fill runs the CPU-style sequential (d, i) loops with every lane
   advancing in lockstep; cross-lane communication is zero.
 - sequences are 2-bit packed, 16 bases/uint32 word (the reference packs
   4 bases/byte, genasm_gpu.cu:162-189), stored word-major (Wd, B), and
   the outer scan ships one SLAB of (KW-1)*TB + W chars per KW windows
   as a CONTIGUOUS dynamic_slice at the active lanes' minimum word base
   — per-lane gathers (which cost per element on TPU and measured ~40%
   of runtime) are gone; per-lane word offsets up to SLAB_MARGIN_WORDS
   normalize in-kernel and beyond-margin drifters fail to the exact
   retry path. Window extraction from the slab happens in-kernel at
   2-bit offsets (windows advance data-dependently by the traceback's
   consumed counts, which only the kernel knows).
 - early termination is batched per lane-tile: the d-loop is a while_loop
   that stops once every lane in the tile has found its window distance.
 - traceback is a lockstep d-level sweep reading R rows from VMEM; run
   emission is per LEVEL: a pending-edit-run register carry merges
   cross-level runs (e.g. "III") and each level ends with two
   scalar-indexed row stores, leaving sparse rows whose non-empty slots
   are complete maximal runs. A per-run in-kernel flush (masked RMW over
   the whole entry scratch at a per-lane slot) measured ~52% of kernel
   time; per-level stores + sparse-aware device compaction
   (compact_entries_sparse) replace it.

The kernel grid runs over lane tiles of the batch; slabs advance in an
outer XLA lax.scan. Outputs are bit-identical to engine_xla —
tests/test_engine_pallas.py enforces it — so either engine can back the
public API.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AlignConfig
from . import bitvec as bv
from .engine_xla import (
    BatchResult,
    ENTRY_CNT_MASK,
    ENTRY_OP_SHIFT,
    OP_D,
    OP_EQ,
    OP_I,
    OP_NONE,
    OP_X,
    cumsum_log,
)

LANE = 128
CHARS_PER_WORD = 16  # 2-bit codes per uint32
DEFAULT_KW = 8  # windows fused per kernel invocation

# Measurement knob: run one kernel section TWICE (a bit-identical rerun,
# every section is idempotent), so bench(full doubled-X) - bench(full)
# isolates section X's cost under realistic data-dependent control flow.
# Values: "pm2" (pattern unpack+bitmask build), "fill2" (DP fill),
# "tb2" (traceback). Never set in production paths.
_ABLATE = os.environ.get("SCROOGE_ABLATE", "")
_SK_OVERRIDE = int(os.environ.get("SCROOGE_SK", "0"))
_KW_OVERRIDE = int(os.environ.get("SCROOGE_KW", "0"))


def slab_chars(cfg: AlignConfig, kw: int) -> int:
    """Chars a KW-window slab must cover: each window consumes at most
    tb_limit text/pattern chars before the next starts."""
    return (kw - 1) * cfg.tb_limit + cfg.W


def slab_words(cfg: AlignConfig, kw: int) -> int:
    """uint32 words covering a slab at an arbitrary 2-bit start offset."""
    return -(-slab_chars(cfg, kw) // CHARS_PER_WORD) + 1


# Extra slab words shipped per lane beyond the slab span: lanes drift
# apart slowly (per-window text/pattern advance varies by a few chars),
# so each slab is fetched as ONE contiguous dynamic_slice at the active
# lanes' minimum word base and per-lane word offsets up to this margin
# resolve in-kernel. A lane drifting past the margin is failed to the
# exact retry path (compound drift over a read is tens of chars; the
# margin is 128). This removes all per-slab gathers, which measured
# ~40% of kernel-path runtime.
SLAB_MARGIN_WORDS = 8

# Per-lane failure-reason bits carried in BatchResult.failed (int32).
# The drift/dead-end telemetry analogue of the reference's DEBUG-gated
# traceback checks (genasm_cpu.cpp:362-385); AlignStats aggregates them.
FAIL_TB = 1          # window's d-search exceeded tb_cap (no traceback found)
FAIL_STALL = 2       # window consumed no text and no pattern (would loop)
FAIL_DRIFT = 4       # lane drifted past SLAB_MARGIN_WORDS of the slab base
FAIL_INCOMPLETE = 8  # slab loop ended before the read was consumed

# Mosaic compile time explodes combinatorially with the per-char unpack
# select-chain length, which scales with slab_words: 19-21-word chains
# (W=64 kw=8, W=128 kw=4) compile in minutes and are hardware-validated;
# a 35-word chain did not finish compiling in 40 minutes. Shapes whose
# slab exceeds this bound are rejected by choose_kernel_shape in favor of
# fewer fused windows per launch (smaller kw).
MAX_SLAB_WORDS = 24


def slab_io_words(cfg: AlignConfig, kw: int) -> int:
    """Words shipped to the kernel per lane per slab (span + drift
    margin; the margin defaults to SLAB_MARGIN_WORDS and is raised per
    config by the escalation ladder, cfg.margin_override)."""
    return slab_words(cfg, kw) + cfg.margin_words


def tb_rows(cfg: AlignConfig) -> int:
    """Per-window traceback row budget: two rows per d-level (a pending
    edit-run flush and the '='-run of that level) plus the closing pending
    flush + d==0 '=' row pair. Rows are SPARSE (empty slots are 0) but
    every non-empty row is a complete maximal CIGAR run, in order;
    compact_entries_sparse consumes them directly."""
    return 2 * cfg.tb_cap + 2


def kernel_vmem_bytes(cfg: AlignConfig, sk: int, kw: int = DEFAULT_KW) -> int:
    """Approximate VMEM footprint of the window kernel for sublane tile sk."""
    lane_b = sk * LANE * 4
    r = (cfg.tb_cap + 2) * cfg.columns * cfg.num_tb_words * lane_b
    ff = (cfg.W + 2) * cfg.num_words * lane_b  # W+1 rows + dummy sink row
    pmi = cfg.W * cfg.num_words * lane_b
    upat = (cfg.W if cfg.W % 16 else 1) * lane_b
    pmc = 4 * cfg.num_words * lane_b
    ent = (kw + 1) * tb_rows(cfg) * lane_b
    io = 2 * slab_io_words(cfg, kw) * lane_b + 16 * lane_b
    return r + ff + pmi + upat + pmc + ent + 2 * io


# A 90MB-scratch kernel (W=256, sk=8, kw=8: 87.9MB model estimate)
# compiles and runs on v5e (128MB physical VMEM); leave margin for Mosaic
# temporaries above that empirical point. SCROOGE_VMEM_BUDGET (MB)
# overrides for probing other parts.
VMEM_BUDGET = int(os.environ.get("SCROOGE_VMEM_BUDGET", "92")) << 20


def choose_kernel_shape(cfg: AlignConfig, S: int,
                        budget_bytes: int = VMEM_BUDGET):
    """(sublane tile, windows-per-slab) for a batch of S sublane groups.

    Mosaic block constraint: the sublane block dim must be a multiple of 8
    or equal to the full dimension. sk=16 measures fastest at the default
    config across every windows-per-slab choice (operating-point kernel
    sweep, profile/simulated_32768_10000_device_sweep_kernel.csv: 84.7k
    aligns/s vs 82.1k at sk=32 and 74.9k at sk=8 — finer tiles couple
    early termination over fewer lanes, and the grid amortization loss is
    smaller than that gain); smaller shapes trade slab fusion for VMEM so
    larger-W configs (W=128 at ~72MB scratch) still run on the Pallas
    engine. Returns (0, 0) if nothing fits.
    """
    # S itself is always Mosaic-legal (a block dim equal to the full
    # dimension needs no divisibility), so batches whose S has no small
    # multiple-of-8 divisor still get a (single-tile) kernel if it fits
    candidates = [min(16, S), min(32, S), min(8, S), S]
    if _SK_OVERRIDE:  # measurement-only tile override (see _ABLATE)
        candidates = [min(_SK_OVERRIDE, S)]
    kws = (DEFAULT_KW, 4, 2, 1)
    if _KW_OVERRIDE:
        kws = (_KW_OVERRIDE,)
    for sk in dict.fromkeys(candidates):
        if sk <= 0 or S % sk:
            continue
        for kw in kws:
            if slab_words(cfg, kw) > MAX_SLAB_WORDS and not _KW_OVERRIDE:
                continue  # Mosaic select-chain compile bound (see above)
            if kernel_vmem_bytes(cfg, sk, kw) <= budget_bytes:
                return sk, kw
    return 0, 0


def choose_sublane_tile(cfg: AlignConfig, S: int,
                        budget_bytes: int = VMEM_BUDGET) -> int:
    return choose_kernel_shape(cfg, S, budget_bytes)[0]


def fits_vmem(cfg: AlignConfig, budget_bytes: int = VMEM_BUDGET) -> bool:
    return kernel_vmem_bytes(cfg, 8) <= budget_bytes


def slab_bound_ok(cfg: AlignConfig) -> bool:
    """Whether ANY windows-per-slab choice stays under the Mosaic
    select-chain compile bound — when false the config can never run on
    the Pallas engine regardless of batch size (api reports it as a W/O
    limit, not a batch-tiling problem)."""
    return slab_words(cfg, 1) <= MAX_SLAB_WORDS


def pack_2bit(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack 2-bit codes (..., T) uint8 -> (..., ceil(T/16)) uint32 words,
    char k of a word in bits [2k, 2k+2) (genasm_gpu.cu:640-685 analogue)."""
    T = codes.shape[-1]
    Tw = -(-T // CHARS_PER_WORD)
    pad = Tw * CHARS_PER_WORD - T
    if pad:
        codes = jnp.pad(codes, [(0, 0)] * (codes.ndim - 1) + [(0, pad)])
    grouped = codes.reshape(codes.shape[:-1] + (Tw, CHARS_PER_WORD))
    shifts = jnp.arange(CHARS_PER_WORD, dtype=jnp.uint32) * 2
    return jnp.sum(grouped.astype(jnp.uint32) << shifts, axis=-1,
                   dtype=jnp.uint32)


def pack_2bit_host(codes: np.ndarray) -> np.ndarray:
    """Host-side pack_2bit (numpy or native): quarters the host->device
    transfer vs shipping uint8 codes. codes: (rows, T) uint8."""
    from .. import native

    out = native.pack_2bit_rows(codes)
    if out is not None:
        return out
    rows, T = codes.shape
    Tw = -(-T // CHARS_PER_WORD)
    pad = Tw * CHARS_PER_WORD - T
    if pad:
        codes = np.pad(codes, ((0, 0), (0, pad)))
    grouped = codes.reshape(rows, Tw, CHARS_PER_WORD).astype(np.uint32)
    shifts = (np.arange(CHARS_PER_WORD, dtype=np.uint32) * 2)[None, None, :]
    return (grouped << shifts).sum(axis=2, dtype=np.uint32)


def _shl1_u32(v, W):
    """Multiword shift-left-by-1 on a list of uint32 (sk,128) words."""
    nw = len(v)
    out = []
    for w in range(nw):
        word = v[w] << 1
        if w > 0:
            word = word | (v[w - 1] >> 31)
        out.append(word)
    out[-1] = out[-1] & jnp.uint32(bv.top_mask(W))
    return out


def _ones_shifted_u32(shift, W, nw):
    """Per-lane ones(W) << shift as a list of uint32 words."""
    umax = jnp.full(shift.shape, 0xFFFFFFFF, jnp.uint32)
    out = []
    for w in range(nw):
        c = jnp.clip(shift - 32 * w, 0, 32)
        word = jnp.where(
            c >= 32, jnp.uint32(0),
            (umax.astype(jnp.int32) << jnp.minimum(c, 31)).astype(jnp.uint32))
        out.append(word)
    out[-1] = out[-1] & jnp.uint32(bv.top_mask(W))
    return out


def _mw_shr_u32(words, s):
    """Right-shift a little-endian uint32 word list by per-lane amount
    s (clamped to [0, 32*len-1]): result bit t = source bit t+s."""
    nwm = len(words)
    si = jnp.clip(s, 0, 32 * nwm - 1)
    q = si >> 5
    r = (si & 31).astype(jnp.uint32)
    r_inv = (jnp.uint32(32) - r) & jnp.uint32(31)
    out = []
    for w in range(nwm):
        acc = jnp.zeros_like(words[0])
        for qq in range(nwm - w):
            lo = words[w + qq] >> r
            if w + qq + 1 < nwm:
                hi = jnp.where(r == 0, jnp.uint32(0),
                               words[w + qq + 1] << r_inv)
                lo = lo | hi
            acc = jnp.where(q == qq, lo, acc)
        out.append(acc)
    return out


def _mw_onehot_u32(t, nwm):
    """Word list with bit t set (none when t outside [0, 32*nwm))."""
    out = []
    for w in range(nwm):
        tw = t - 32 * w
        ok = (tw >= 0) & (tw < 32)
        sh = jnp.clip(tw, 0, 31).astype(jnp.uint32)
        out.append(jnp.where(ok, jnp.uint32(1) << sh, jnp.uint32(0)))
    return out


def _mw_below_u32(t, nwm):
    """Word list with bits [0, max(t, 0)) set, saturating."""
    out = []
    for w in range(nwm):
        k = jnp.clip(t - 32 * w, 0, 32)
        sh = jnp.clip(k, 0, 31).astype(jnp.uint32)
        part = (jnp.uint32(1) << sh) - jnp.uint32(1)
        out.append(jnp.where(k >= 32, jnp.uint32(0xFFFFFFFF), part))
    return out


def _mw_ctz_u32(words):
    """Index of the lowest set bit (int32), 32*len when all zero."""
    nwm = len(words)
    res = jnp.full(words[0].shape, 32 * nwm, jnp.int32)
    for w in reversed(range(nwm)):
        x = words[w]
        lsb = x & (jnp.uint32(0) - x)
        t = (31 - lax.clz(lsb).astype(jnp.int32)) + 32 * w
        res = jnp.where(x != 0, t, res)
    return res


def _mw_bit_u32(words, t):
    """Bit t of the word list as a bool (t clamped into range)."""
    nwm = len(words)
    tc = jnp.clip(t, 0, 32 * nwm - 1)
    sh = (tc & 31).astype(jnp.uint32)
    acc = jnp.zeros_like(words[0])
    for w in range(nwm):
        acc = acc | jnp.where((tc >> 5) == w,
                              (words[w] >> sh) & jnp.uint32(1),
                              jnp.uint32(0))
    return acc != 0


def _select_word(idx, values):
    """values[idx] (idx a traced array, values a static list) via a
    log-depth balanced select tree.

    Mosaic compile time explodes on long LINEAR select chains (a 35-word
    chain did not finish compiling in 40 minutes; see MAX_SLAB_WORDS) —
    the chain's dependency depth, not its op count, is what blows up. The
    tree emits the same n-1 selects at depth log2(n), which compiles
     30+-word selections in seconds and is what lets kw grow past 8."""
    vals = list(values)
    bit = 1
    while len(vals) > 1:
        nxt = []
        for j in range(0, len(vals) - 1, 2):
            nxt.append(jnp.where((idx & bit) != 0, vals[j + 1], vals[j]))
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
        bit <<= 1
    return vals[0]


def _unpack_char(words, bit, nwd):
    """Extract the 2-bit code at per-lane bit offset `bit` from the per-lane
    word list `words` (each (sk,128) uint32). bit in [0, 32*nwd)."""
    word = _select_word(bit >> 5, words[:nwd])
    sh = bit & 31
    return ((word.astype(jnp.int32) >> sh) & 3).astype(jnp.int32)


def _multi_window_kernel(cfg: AlignConfig, kw: int,
                         twords_ref, toff_ref, pwords_ref, poff_ref,
                         tlen_ref, plen_ref,
                         ref_in, read_in, ed_in, done_in, failed_in,
                         ref_out, read_out, ed_out, done_out, failed_out,
                         entries_ref, nfl_ref,
                         R_ref, ff_ref, pmi_ref, upat_ref, ent_ref):
    """KW consecutive alignment windows for one lane tile, carry included.

    Window semantics: genasm_cpu.cpp:210-438 (fill, traceback, windowing).
    """
    W, K, O = cfg.W, cfg.K, cfg.O
    DCAP = cfg.tb_cap  # d-search cap; deeper windows fail to retry
    NW, FTW = cfg.num_words, cfg.first_tb_word
    NWH = cfg.num_tb_words
    COLS, TB = cfg.columns, cfg.tb_limit
    NWC = -(-COLS // 32)  # words of the per-lane traceback offset masks
    NWD = slab_io_words(cfg, kw)
    NE3 = tb_rows(cfg)
    sk = tlen_ref.shape[0]
    lane = (sk, LANE)
    top_bit_off = (W - 1) % 32

    tlen = tlen_ref[...]
    plen = plen_ref[...]
    # Normalize each lane's slab once: shift out the drift-margin word
    # offset (one M+1-way select per kept word), so every later per-char
    # unpack chains over the slab span only, not span+margin.
    MARG = cfg.margin_words
    NWDC = NWD - MARG

    def _normalize(words_ref, off_raw):
        raw = [words_ref[wdi] for wdi in range(NWD)]
        woff = off_raw >> 5
        out = [_select_word(woff, raw[k : k + MARG + 1])
               for k in range(NWDC)]
        return out, off_raw & 31

    twords, toff0 = _normalize(twords_ref, toff_ref[...])
    pwords, poff0 = _normalize(pwords_ref, poff_ref[...])

    ref_idx = ref_in[...]
    read_idx = read_in[...]
    ed = ed_in[...]
    done = done_in[...]  # int32 masks
    failed = failed_in[...]
    ref0 = ref_idx
    read0 = read_idx

    for k in range(kw):
        m = jnp.where(done != 0, 0, jnp.clip(plen - read_idx, 0, W))
        n = jnp.where(done != 0, 0, jnp.clip(tlen - ref_idx, 0, W))
        s = W - m
        # steps needing the start-column select: per lane, step <= W-n+1.
        # Done lanes (n forced 0) compute garbage on the fast path; every
        # read of their results is masked, and d_cond treats them as found.
        n_split = jnp.min(jnp.where(done != 0, W, n))
        split = jnp.clip(W - n_split + 2, 2, W + 2)
        lane_ones = _ones_shifted_u32(s, W, NW)
        toff_raw = toff0 + 2 * (ref_idx - ref0)
        poff_raw = poff0 + 2 * (read_idx - read0)

        # Per-window RE-BASE: select this window's <= WINW slab words once
        # (tree depth log2(bound_k), bound_k grows with the window's slab
        # position) so every later per-char/group unpack selects over WINW
        # words instead of the whole slab. Without this the per-char
        # select work scales with slab size and eats the dispatch savings
        # of fusing more windows per slab (measured: kw=16/32 ran no
        # faster than kw=8 before re-basing).
        WINW = min(W // 16 + 2, NWDC)
        # toff0 < 32 and the window advance is <= k*TB chars
        bound = min(((30 + 2 * k * TB) >> 5) + 1, NWDC)

        def _rebase(words, woff):
            return [_select_word(woff, words[j : j + bound])
                    for j in range(WINW)]

        twin = _rebase(twords, toff_raw >> 5)
        pwin = _rebase(pwords, poff_raw >> 5)
        toff = toff_raw & 31
        poff = poff_raw & 31

        def build_pm():
            # ---- pattern bitmasks (genasm_cpu.cpp:178-198, MSB-aligned):
            # global bit gb holds pattern position j = W-1-gb; bits below
            # s are zeroed by the lane_ones mask ----
            pmc = [[None] * NW for _ in range(4)]
            if W % 16 == 0:
                # Grouped build from the packed slab: each slab word holds
                # 16 chars, so char==c is one XOR + OR-collapse per word;
                # the 16 match bits are compacted (log-step pair packing)
                # and bit-reversed into the MSB-aligned mask position.
                # ~4x fewer ops and far less unrolled code than per-bit
                # accumulation (Mosaic compile time scales with unrolled
                # op count).
                # poff < 32 after the window re-base, so group g's pair
                # of source words is statically pwin[g], pwin[g+1] — no
                # per-group selects at all
                sh = poff.astype(jnp.uint32) & jnp.uint32(31)
                ish = (jnp.uint32(32) - sh) & jnp.uint32(31)
                accs = [[jnp.zeros(lane, jnp.uint32) for _ in range(NW)]
                        for _ in range(4)]
                pwin_x = pwin + [pwin[-1]]  # w1 dummy near slab end
                for g in range(W // 16):
                    w0 = pwin_x[min(g, WINW - 1)]
                    w1 = pwin_x[min(g + 1, WINW)]
                    val = (w0 >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                                 w1 << ish)
                    for c in range(4):
                        x = val ^ jnp.uint32(c * 0x55555555)
                        z = x | (x >> 1)
                        y = (~z) & jnp.uint32(0x55555555)
                        y = (y | (y >> 1)) & jnp.uint32(0x33333333)
                        y = (y | (y >> 2)) & jnp.uint32(0x0F0F0F0F)
                        y = (y | (y >> 4)) & jnp.uint32(0x00FF00FF)
                        y = (y | (y >> 8)) & jnp.uint32(0x0000FFFF)
                        # reverse the 16 match bits (mask is MSB-aligned)
                        y = ((y & jnp.uint32(0x5555)) << 1) \
                            | ((y >> 1) & jnp.uint32(0x5555))
                        y = ((y & jnp.uint32(0x3333)) << 2) \
                            | ((y >> 2) & jnp.uint32(0x3333))
                        y = ((y & jnp.uint32(0x0F0F)) << 4) \
                            | ((y >> 4) & jnp.uint32(0x0F0F))
                        y = ((y & jnp.uint32(0x00FF)) << 8) \
                            | ((y >> 8) & jnp.uint32(0x00FF))
                        gb0 = W - 16 * (g + 1)
                        accs[c][gb0 >> 5] = (accs[c][gb0 >> 5]
                                             | (y << (gb0 & 31)))
                for c in range(4):
                    for w in range(NW):
                        pmc[c][w] = (~accs[c][w]) & lane_ones[w]
            else:
                # odd widths: per-char accumulation via unpacked chars
                for j in range(W):
                    upat_ref[j] = _unpack_char(pwin, poff + 2 * j, WINW)
                for c in range(4):
                    for w in range(NW):
                        acc = jnp.zeros(lane, jnp.uint32)
                        bits_here = min(32, W - 32 * w)
                        for b in range(bits_here):
                            gb = 32 * w + b
                            pos = upat_ref[W - 1 - gb]
                            match = (pos == c)
                            acc = acc | (match.astype(jnp.uint32) << b)
                        pmc[c][w] = (~acc) & lane_ones[w]

            def pm_body(i, _):
                t = _unpack_char(twin, toff + 2 * i, WINW)
                for w in range(NW):
                    word = pmc[0][w]
                    for c in range(1, 4):
                        word = jnp.where(t == c, pmc[c][w], word)
                    pmi_ref[i, w] = word
                return 0

            lax.fori_loop(0, W, pm_body, 0)

        build_pm()
        if _ABLATE == "pm2":
            build_pm()

        # ---- DP fill (genasm_cpu.cpp:210-288), two rows per i-pass ----
        # Rows d (A) and d+1 (B) advance in one wavefront: at loop index i,
        # A computes cell (d, i) and B computes cell (d+1, i+1). Row d's
        # values flow to row d+1 entirely through registers (B's top is
        # A's center from the previous step, and every shift B needs was
        # already computed for A), so ff is read once and written once per
        # TWO rows and the loop runs (W+2) steps per two rows instead of
        # 2(W+1). The recurrence itself is exactly genasm_cpu.cpp:246-251.
        def make_pair_body(is_zero):
            # is_zero is a PYTHON bool: the d=0 pair is peeled out of the
            # while_loop so general rows skip the is_zero select entirely
            return functools.partial(_pair_body, is_zero)

        def _pair_body(is_zero, st):
            d, found, wed = st
            ones_a = _ones_shifted_u32(s + d, W, NW)
            ones_b = _ones_shifted_u32(s + d + 1, W, NW)

            def i_body(with_start, step, carry):
                i = W - step  # W .. -1
                # A deps (row d, col i): rA = center_A(i+1), trA = top(i+1)
                # = ff value read last step, sh_trA = its cached shift.
                # B deps (row d+1, col i+1): rB = center_B(i+2),
                # trB = center_A(i+2) (prev step's rA), sh_trB = its shift
                # (prev step's sh_rA), top_B = center_A(i+1) = rA with
                # shift sh_rA computed this step, pm at col i+1 = prev
                # step's A pm.
                rA, trA, sh_trA, rB, trB, sh_trB, pm_prev = carry
                ic = jnp.maximum(i, 0)
                top = [ff_ref[ic, w] for w in range(NW)]
                ip = jnp.minimum(ic, W - 1)
                cur_pm = [pmi_ref[ip, w] for w in range(NW)]
                sh_rA = _shl1_u32(rA, W)
                sh_tA = _shl1_u32(top, W)
                sh_rB = _shl1_u32(rB, W)
                if with_start:
                    startA = i >= n
                    startB = (i + 1) >= n
                cA = []
                cB = []
                for w in range(NW):
                    matA = sh_rA[w] | cur_pm[w]
                    if is_zero:
                        nsA = matA
                    else:
                        nsA = matA & sh_trA[w] & sh_tA[w] & trA[w]
                    if with_start:
                        nsA = jnp.where(startA, ones_a[w], nsA)
                    cA.append(nsA)
                    matB = sh_rB[w] | pm_prev[w]
                    # terms: shl1(topright_B)=sh_trB, shl1(top_B)=sh_rA,
                    # raw topright_B = trB (center_A at col i+2)
                    fullB = matB & sh_trB[w] & sh_rA[w] & trB[w]
                    if with_start:
                        fullB = jnp.where(startB, ones_b[w], fullB)
                    cB.append(fullB)

                # writes: A is valid for i in [0, W]; B's column i+1 is
                # valid for i in [-1, W-1]. Out-of-range steps write to
                # dummy slots (row K+1 of R, row W+1 of ff) via scalar
                # index selects — pl.when-guarded stores trip a Mosaic
                # relayout bug. ff ends up holding row d+1.
                rowA = jnp.where(i >= 0, d, DCAP + 1)
                icol = jnp.minimum(jnp.maximum(i, 0), COLS - 1)
                for w in range(NWH):
                    R_ref[rowA, icol, w] = cA[FTW + w]

                ffi = jnp.minimum(i + 1, W + 1)
                for w in range(NW):
                    ff_ref[ffi, w] = cB[w]
                rowB = jnp.where((i + 1 <= W) & (d + 1 <= DCAP),
                                 d + 1, DCAP + 1)
                bcol = jnp.minimum(i + 1, COLS - 1)
                for w in range(NWH):
                    R_ref[rowB, bcol, w] = cB[FTW + w]

                return (tuple(cA), tuple(top), tuple(sh_tA),
                        tuple(cB), tuple(rA), tuple(sh_rA),
                        tuple(cur_pm))

            # init the carry from VMEM reads (contents are never used: the
            # first steps take the start-column paths). Splat-zero inits
            # pin a replicated register layout through the pure-passthrough
            # carry slots (trB = previous rA), which Mosaic then cannot
            # unify with the computed values' layouts.
            #
            # Steps [0, split) run the start-select body; beyond split no
            # lane can hit a start column (split = W - min(n) + 2), so the
            # remaining steps drop the two compares and 2*NW selects.
            z = tuple(ff_ref[W + 1, w] for w in range(NW))
            mid = lax.fori_loop(0, split,
                                functools.partial(i_body, True),
                                (z, z, z, z, z, z, z))
            fc = lax.fori_loop(split, W + 2,
                               functools.partial(i_body, False), mid)
            # the i==0 centers (full-match probe column) fall out of the
            # final carry: slot 4 (trB) = cA of the i==0 step, slot 3 (rB)
            # = cB of the i==-1 step, whose B column is 0.
            probeA = fc[4][NW - 1]
            probeB = fc[3][NW - 1]

            hitA = ((probeA >> top_bit_off) & 1) == 0
            newlyA = hitA & (found == 0)
            wed = jnp.where(newlyA, d, wed)
            found = jnp.where(newlyA, 1, found)
            if_b_valid = (d + 1) <= DCAP
            hitB = (((probeB >> top_bit_off) & 1) == 0) & if_b_valid
            newlyB = hitB & (found == 0)
            wed = jnp.where(newlyB, d + 1, wed)
            found = jnp.where(newlyB, 1, found)
            return d + 2, found, wed

        def d_cond(st):
            d, found, _ = st
            in_range = d <= DCAP
            if cfg.early_termination:
                # done lanes may never probe a match (their fill is
                # garbage past the select split) — treat them as found
                return in_range & ~jnp.all((found != 0) | (done != 0))
            return in_range

        def run_fill():
            found0 = jnp.zeros(lane, jnp.int32)
            wed0 = jnp.zeros(lane, jnp.int32)
            # peel the d=0 pair (match-only recurrence on row 0), then
            # loop the general pairs from d=2
            st1 = make_pair_body(True)((jnp.int32(0), found0, wed0))
            _, found_i, wed_ = lax.while_loop(
                d_cond, make_pair_body(False), st1)
            fnd = found_i != 0
            return fnd, jnp.where(fnd & (done == 0), wed_, 0)

        found, wed = run_fill()
        if _ABLATE == "fill2":
            found, wed = run_fill()

        # ---- traceback (genasm_cpu.cpp:290-409), lockstep d-level sweep
        #
        # Emission is PER LEVEL, not per run: within one d-level a lane
        # does a single '='-run followed by at most one edit op (the edit
        # is what drops it to the next level), so each level needs exactly
        # two scalar-indexed row stores. Runs that span levels (e.g. "III")
        # are merged vectorized on the XLA side (merge_level_runs). This
        # replaced a per-step masked RMW over the whole (NE, sk, 128)
        # entry scratch, which the ablation knob measured at ~52% of total
        # kernel time (the RMW traffic ran every step: with 4096 lanes per
        # tile, some lane flushes at essentially every step).
        def level_body(st):
            lvl, i, j, dd, fin, pend_op, pend_cnt, nfl = st
            L = lvl - 1
            active = (fin == 0) & (dd == lvl)

            # Closed-form level step (no per-step inner loop): within one
            # d-level a lane runs '='s along the DIAGONAL (i+t, j+t) until
            # the first offset t where an edit becomes legal (priority
            # I>D>X, genasm_cpu.cpp:346-370) or a TB_LIMIT/window bound
            # terminates it. One pass over the stored columns extracts the
            # three decision bits for ALL offsets into packed per-lane
            # masks; the run length is then a count-trailing-zeros. At
            # offset t the sequential tracer inspects
            #   zA(t):  bit (W-2-j-t) of R[L, i+t]    (insertion)
            #   zB0(t): bit (W-1-j-t) of R[L, i+t+1]  (deletion)
            #   zB1(t): bit (W-2-j-t) of R[L, i+t+1]  (substitution)
            # i.e. for column c the bit positions are (bA - c), (bB - c),
            # (bB - 1 - c) with bA = W-2-j+i, bB = W-1-j+i+1 ... built
            # column-indexed (bit c, scalar shifts), then one per-lane
            # funnel shift by i (A) / i+1 (B) re-indexes them by t.
            bA = (W - 2) - j + i
            bB = (W - 1) - j + (i + 1)
            zero = jnp.zeros(lane, jnp.uint32)
            McA = [zero] * NWC
            McB0 = [zero] * NWC
            McB1 = [zero] * NWC
            for c in range(COLS):
                words = [R_ref[L, c, w] for w in range(NWH)]
                # bit positions clamped for shift safety; out-of-range
                # extractions are garbage only at offsets t that
                # min(t_stop, t_term) already excludes (the DENT store
                # covers every traceback-reachable bit)
                pA = jnp.clip(bA - c, 0, W - 1)
                pB0 = jnp.clip(bB - c, 0, W - 1)
                pB1 = jnp.clip(bB - 1 - c, 0, W - 1)
                bits = []
                for p in (pA, pB0, pB1):
                    wsel = words[0]
                    for wd in range(1, NWH):
                        wsel = jnp.where((p >> 5) == (FTW + wd),
                                         words[wd], wsel)
                    bits.append(
                        ((wsel >> (p & 31).astype(jnp.uint32)) & 1) ^ 1)
                cw, cb = c >> 5, c & 31
                McA[cw] = McA[cw] | (bits[0] << cb)
                McB0[cw] = McB0[cw] | (bits[1] << cb)
                McB1[cw] = McB1[cw] | (bits[2] << cb)

            MA = _mw_shr_u32(McA, i)
            MB0 = _mw_shr_u32(McB0, i + 1)
            MB1 = _mw_shr_u32(McB1, i + 1)
            tj = (m - 1) - j  # the single offset where j+t == m-1
            tn = n - i        # offsets t >= tn have i+t >= n (i_limit)
            jbit = _mw_onehot_u32(tj, NWC)
            below = _mw_below_u32(tn, NWC)
            m_ins = [MA[w] | jbit[w] for w in range(NWC)]
            m_del = [MB0[w] & ~jbit[w] & below[w] for w in range(NWC)]
            m_sub = [(MB1[w] | jbit[w]) & below[w] for w in range(NWC)]
            stop = [m_ins[w] | m_del[w] | m_sub[w] for w in range(NWC)]
            t_stop = _mw_ctz_u32(stop)
            t_term = jnp.maximum(
                jnp.minimum(jnp.minimum(m - j, TB - i), TB - j), 0)
            run = jnp.minimum(t_stop, t_term)
            does_edit = active & (t_stop < t_term)
            op = jnp.where(
                _mw_bit_u32(m_ins, t_stop), OP_I,
                jnp.where(_mw_bit_u32(m_del, t_stop), OP_D, OP_X))

            eq = jnp.where(active, run, 0)
            ed = jnp.where(does_edit, op, OP_NONE)
            i = i + eq + jnp.where(does_edit & (op != OP_I), 1, 0)
            j = j + eq + jnp.where(does_edit & (op != OP_D), 1, 0)
            dd = dd - does_edit.astype(jnp.int32)
            fin = jnp.where(active & ~does_edit, 1, fin)

            # Emission with a pending-edit-run carry: consecutive same-op
            # edits across levels (e.g. "III") accumulate in registers and
            # flush as ONE row, so every non-empty row is already a
            # MAXIMAL CIGAR run — no downstream merging. A lane with a
            # pending run is always active at the next level (dd drops by
            # exactly 1 per edit), so the carry can never skip its flush.
            base = 2 * (max_d - lvl)
            ext = ((eq == 0) & (ed != OP_NONE) & (ed == pend_op)
                   & (pend_cnt > 0))
            fl = (pend_cnt > 0) & ~ext
            ent_ref[base] = jnp.where(
                fl, (pend_op << ENTRY_OP_SHIFT) | pend_cnt, 0)
            ent_ref[base + 1] = jnp.where(
                eq > 0, (OP_EQ << ENTRY_OP_SHIFT) | eq, 0)
            nfl = nfl + fl.astype(jnp.int32) + (eq > 0).astype(jnp.int32)
            pend_cnt = jnp.where(ext, pend_cnt + 1,
                                 jnp.where(ed != OP_NONE, 1, 0))
            pend_op = ed  # when ext, ed == pend_op already
            return lvl - 1, i, j, dd, fin, pend_op, pend_cnt, nfl

        def run_tb():
            ent_ref[...] = jnp.zeros((NE3,) + lane, jnp.int32)
            i0 = jnp.zeros(lane, jnp.int32)
            j0 = jnp.zeros(lane, jnp.int32)
            fin0 = (j0 >= m).astype(jnp.int32)
            pend_op0 = jnp.full(lane, OP_NONE, jnp.int32)
            z0 = jnp.zeros(lane, jnp.int32)
            _, i, j, dd, fin, pend_op, pend_cnt, nfl = lax.while_loop(
                lambda st: st[0] >= 1, level_body,
                (max_d, i0, j0, wed, fin0, pend_op0, z0, z0))

            # final d==0 phase: flush any pending edit run, then the
            # closed-form '=' run (check-before-step)
            active0 = (fin == 0) & (dd == 0)
            run = jnp.minimum(jnp.minimum(m - j, TB - i), TB - j)
            run = jnp.where(active0, jnp.maximum(run, 0), 0)
            fl0 = pend_cnt > 0
            ent_ref[2 * max_d] = jnp.where(
                fl0, (pend_op << ENTRY_OP_SHIFT) | pend_cnt, 0)
            ent_ref[2 * max_d + 1] = jnp.where(
                run > 0, (OP_EQ << ENTRY_OP_SHIFT) | run, 0)
            nfl = (nfl + fl0.astype(jnp.int32)
                   + (run > 0).astype(jnp.int32))
            i = i + run
            j = j + run

            # each emitted edit op decremented dd by exactly one, so the
            # edits actually used by the kept traceback prefix = wed - dd
            return i, j, wed - dd, nfl

        max_d = jnp.max(wed)
        i, j, edits_used, nfl = run_tb()
        if _ABLATE == "tb2":
            i, j, edits_used, nfl = run_tb()

        # ---- carry update (genasm_cpu.cpp:432-435) ----
        # failed is a per-lane reason BITMASK (FAIL_* constants): the
        # in-kernel analogue of the reference's DEBUG dead-end traceback
        # check (genasm_cpu.cpp:362-385) — instead of an assert, the
        # cause is recorded and surfaced through AlignStats telemetry.
        active = done == 0
        window_failed = active & ~found
        stalled = active & found & (i == 0) & (j == 0)
        failed = (failed
                  | jnp.where(window_failed, FAIL_TB, 0)
                  | jnp.where(stalled, FAIL_STALL, 0))
        take = active & ~window_failed & ~stalled
        ed = ed + jnp.where(take, edits_used, 0)
        ref_idx = ref_idx + jnp.where(take, i, 0)
        read_idx = read_idx + jnp.where(take, j, 0)
        done = ((read_idx >= plen) | (failed != 0)).astype(jnp.int32)

        # pack row pairs (2j, 2j+1) into one int32 word (each packed run
        # is op << 12 | cnt <= 0x3FFF): halves the kernel's HBM output
        # traffic — the entries store is the kernel's largest write
        # (NE3 * kw * 4 bytes/lane/slab)
        NE3H = NE3 // 2
        for j in range(NE3H):
            entries_ref[k * NE3H + j] = (ent_ref[2 * j]
                                         | (ent_ref[2 * j + 1] << 16))
        nfl_ref[k] = jnp.where(take, nfl, 0)

    ref_out[...] = ref_idx
    read_out[...] = read_idx
    ed_out[...] = ed
    done_out[...] = done
    failed_out[...] = failed


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def slab_step_kernel(cfg: AlignConfig, kw: int, sk: int,
                     twords, toff, pwords, poff, tlen, plen,
                     ref_idx, read_idx, ed, done, failed):
    """Run the fused KW-window kernel over the batch.

    twords/pwords: (NWD, S, 128) uint32 packed slab words; toff/poff:
    (S, 128) int32 slab-start bit offsets; the remaining args are the
    (S, 128) int32 windowing carry. Returns the updated carry plus
    PAIR-PACKED entries (KW*NE/2, S, 128) int32 — rows (2j, 2j+1) of each
    window's sparse run rows in the low/high halfwords — and per-window
    run counts (KW, S, 128).
    """
    W = cfg.W
    NWD = slab_io_words(cfg, kw)
    NE3 = tb_rows(cfg)
    NE3H = NE3 // 2
    S = tlen.shape[0]
    assert S % sk == 0, (S, sk)
    grid = (S // sk,)

    def im3(t):
        return (0, t, 0)

    def im2(t):
        return (t, 0)

    lane2 = pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM)
    slab3 = pl.BlockSpec((NWD, sk, LANE), im3, memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # ref_idx
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # read_idx
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # ed
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # done
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # failed
        jax.ShapeDtypeStruct((kw * NE3H, S, LANE), jnp.int32),  # level runs
        jax.ShapeDtypeStruct((kw, S, LANE), jnp.int32),  # runs per window
    ]
    out_specs = [
        lane2, lane2, lane2, lane2, lane2,
        pl.BlockSpec((kw * NE3H, sk, LANE), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((kw, sk, LANE), im3, memory_space=pltpu.VMEM),
    ]
    in_specs = [slab3, lane2, slab3, lane2, lane2, lane2,
                lane2, lane2, lane2, lane2, lane2]
    scratch_shapes = [
        # tb_cap+2 rows: the device engine caps the d-search at tb_cap
        # (deeper windows fail to the exact retry path); the extra row is
        # the wavefront's discard sink
        pltpu.VMEM((cfg.tb_cap + 2, cfg.columns, cfg.num_tb_words, sk, LANE),
                   jnp.uint32),  # R
        # W+2: slot W+1 is the wavefront's dummy sink (and the carry init)
        pltpu.VMEM((W + 2, cfg.num_words, sk, LANE), jnp.uint32),  # forefront
        pltpu.VMEM((W, cfg.num_words, sk, LANE), jnp.uint32),  # pmi
        # unpacked pattern chars (odd-W pm path only)
        pltpu.VMEM((W if W % 16 else 1, sk, LANE), jnp.int32),
        pltpu.VMEM((NE3, sk, LANE), jnp.int32),  # per-window level-run rows
    ]
    # off-TPU (tests, virtual CPU meshes) the kernel runs in interpreter
    # mode: slow but bit-identical, so parity tests cover the same code
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_multi_window_kernel, cfg, kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # track the shape chooser's budget (the env knob is meant for
            # probing bigger shapes — a fixed limit below the budget would
            # reject the very shapes the chooser accepted)
            vmem_limit_bytes=max(100 * 1024 * 1024, VMEM_BUDGET + (8 << 20)),
        ),
        interpret=interpret,
    )(twords, toff, pwords, poff, tlen, plen,
      ref_idx, read_idx, ed, done, failed)


def _align_scan(cfg: AlignConfig, sk: int, kw: int, max_windows: int,
                text_t, tphase, text_len, pattern_t, pattern_len
                ) -> BatchResult:
    """Slab scan over the batch: ceil(max_windows/kw) kernel invocations.

    text_t / pattern_t: word-major (Wd, B) uint32 pack_2bit buffers,
    padded to at least slab_io_words rows. tphase: (B,) int32 char phase
    of each lane's word-0 (0 for row-local buffers; starts & 15 for the
    shared-genome segment buffer). Each slab is ONE contiguous
    dynamic_slice at the active lanes' minimum word base; per-lane word
    offsets up to SLAB_MARGIN_WORDS resolve in-kernel via the slab bit
    offset, and lanes beyond the margin fail to the exact retry path.
    """
    B = pattern_t.shape[1]
    if B % LANE != 0:
        raise ValueError("batch must be a multiple of 128 lanes")
    S = B // LANE
    lane = (S, LANE)
    tlen = text_len.astype(jnp.int32).reshape(lane)
    plen = pattern_len.astype(jnp.int32).reshape(lane)
    NWD2 = slab_io_words(cfg, kw)
    M = cfg.margin_words
    NE3 = tb_rows(cfg)
    n_steps = -(-max_windows // kw)
    tphase = tphase.astype(jnp.int32).reshape(B)

    def slab_slice(buf_t, cpos, act):
        """One contiguous slab for the whole batch: words (NWD2, B),
        per-lane in-slab bit offsets, and the beyond-margin mask.

        The base is the active lanes' minimum word position while every
        active lane fits the drift margin (the common case: all survive).
        When the spread exceeds the margin, somebody must fail — the base
        centers on the ACTIVE MEAN, which tracks the bulk of the pack, so
        a single pathological outlier in either direction (an insertion-
        dominated laggard whose text cursor crawls, or a deletion-rich
        leader racing ahead) fails alone instead of dragging the base
        with it and spuriously failing every other lane to the retry
        path. The mean is robust here: one outlier among thousands of
        lanes moves it by drift/B words."""
        wd = buf_t.shape[0]
        w0 = cpos >> 4
        w0min = jnp.min(jnp.where(act, w0, jnp.int32(1 << 30)))
        w0max = jnp.max(jnp.where(act, w0, jnp.int32(-1)))
        n_act = jnp.maximum(jnp.sum(act.astype(jnp.int32)), 1)
        w0mean = jnp.sum(jnp.where(act, w0, 0)) // n_act
        centered = jnp.clip(w0mean - M // 2, w0min, w0max)
        base = jnp.where(w0max - w0min <= M, w0min, centered)
        base = jnp.clip(base, 0, max(wd - NWD2, 0))
        words = lax.dynamic_slice(buf_t, (base, jnp.int32(0)), (NWD2, B))
        woff = w0 - base
        bad = act & ((woff < 0) | (woff > M))
        off = ((cpos & 15) * 2 + jnp.clip(woff, 0, M) * 32)
        return words, off.astype(jnp.int32), bad

    carry0 = (
        jnp.zeros(lane, jnp.int32),  # ref_idx
        jnp.zeros(lane, jnp.int32),  # read_idx
        jnp.zeros(lane, jnp.int32),  # edit distance
        (plen <= 0).astype(jnp.int32),  # done
        jnp.zeros(lane, jnp.int32),  # failed
    )

    # while-based slab loop with early exit once every lane is done (a
    # fixed-length scan would run inert tail slabs: lanes finish at
    # data-dependent windows and maxw is a worst-case bound)
    NE3H = NE3 // 2
    # pair-packed kernel rows (two uint16 runs per int32, see
    # slab_step_kernel); unpacked once after the loop
    ents0 = jnp.zeros((n_steps, kw, NE3H, B), jnp.int32)
    cnts0 = jnp.zeros((n_steps, kw, B), jnp.int32)

    def loop_cond(st):
        step, carry, _, _ = st
        done = carry[3]
        return (step < n_steps) & ~jnp.all(done != 0)

    def loop_body(st):
        step, carry, ents, cnts = st
        ref_idx, read_idx, ed, done, failed = carry

        act = (done == 0).reshape(B)
        twords, toff, bad_t = slab_slice(text_t,
                                         tphase + ref_idx.reshape(B), act)
        pwords, poff, bad_p = slab_slice(pattern_t, read_idx.reshape(B),
                                         act)
        bad = (bad_t | bad_p).reshape(lane)
        done = jnp.where(bad, 1, done)
        failed = failed | jnp.where(bad, FAIL_DRIFT, 0)

        (ref_idx, read_idx, ed, done, failed, entries_i, nfl
         ) = slab_step_kernel(
            cfg, kw, sk, twords.reshape(NWD2, S, LANE),
            toff.reshape(lane), pwords.reshape(NWD2, S, LANE),
            poff.reshape(lane), tlen, plen,
            ref_idx, read_idx, ed, done, failed)

        ents = lax.dynamic_update_slice(
            ents, entries_i.reshape(1, kw, NE3H, B), (step, 0, 0, 0))
        cnts = lax.dynamic_update_slice(
            cnts, nfl.reshape(1, kw, B), (step, 0, 0))
        new_carry = (ref_idx, read_idx, ed, done, failed)
        return step + 1, new_carry, ents, cnts

    _, carry, entries, counts = lax.while_loop(
        loop_cond, loop_body, (jnp.int32(0), carry0, ents0, cnts0))

    _, read_idx, ed, done, failed = carry
    failed = failed | jnp.where((failed == 0) & (read_idx < plen),
                                FAIL_INCOMPLETE, 0)

    # SPARSE rows (tb_rows wide): non-empty slots are complete maximal
    # runs in order. The engine returns them PAIR-PACKED — (maxw, NE3/2,
    # B) int32, rows (2j, 2j+1) in the low/high halfwords — and the
    # unpack is deferred into the consumers' jits (unpack_entry_pairs /
    # the compactors), where XLA fuses it into their first elementwise
    # pass: materializing the unpacked u16 store here cost a 1.9 GB
    # write + re-read per headline batch for nothing.
    entries = entries.reshape(n_steps * kw, NE3H, B)
    counts = counts.reshape(n_steps * kw, B).astype(jnp.int32)
    if n_steps * kw > max_windows:
        # the slab loop runs whole slabs, so when kw does not divide
        # max_windows the scan grants up to kw-1 extra trailing windows.
        # Those are outside the contract (engine_xla runs EXACTLY
        # max_windows): lanes that emitted anything there fail instead of
        # silently succeeding where the XLA engine reports failure.
        extra_used = counts[max_windows:].sum(axis=0) > 0
        failed = failed | jnp.where(extra_used.reshape(failed.shape),
                                    FAIL_INCOMPLETE, 0)
        entries = entries[:max_windows]
        counts = counts[:max_windows]
    return BatchResult(
        edit_distance=ed.reshape(B),
        # int32 reason bitmask (FAIL_*); nonzero = lane needs retry
        failed=failed.reshape(B),
        entries=entries,
        counts=counts,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def align_batch(cfg: AlignConfig, max_windows: int, sk: int, kw: int,
                text_words, text_len, pattern_words,
                pattern_len) -> BatchResult:
    """Pallas-engine unstructured batch alignment. text_words /
    pattern_words: (B, ceil(T/16)) / (B, ceil(P/16)) uint32 pack_2bit
    words (pack on host with pack_2bit_host). Buffers are transposed to
    word-major once here; slabs are then contiguous slices (no gathers)."""
    B = text_words.shape[0]
    NWD2 = slab_io_words(cfg, kw)

    def prep(words):
        # always pad a full slice width: the slab slice must be able to
        # START at the last real word without the in-bounds clamp pulling
        # the base back (which would blow per-lane offsets past the
        # margin and spuriously fail every lane near its sequence end)
        return jnp.pad(words, ((0, 0), (0, NWD2))).T

    tphase = jnp.zeros((B,), jnp.int32)
    return _align_scan(cfg, sk, kw, max_windows, prep(text_words), tphase,
                       text_len, prep(pattern_words), pattern_len)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def align_batch_mapped(cfg: AlignConfig, max_windows: int, sk: int, kw: int,
                       genome_words, starts, text_len,
                       pattern_words, pattern_len) -> BatchResult:
    """Pallas-engine read-mapping alignment: one shared 2-bit-packed genome
    in HBM (uint32 words, pack_2bit layout), per-lane global char offsets —
    the reference's shared-reference views (genasm_gpu.cu:692-743) without
    per-pair copies. starts: (B,) uint32 global char offsets;
    pattern_words: (B, ceil(P/16)) uint32 pack_2bit words.

    The per-pair genome segments are extracted word-major ONCE (the only
    gather on this path); every slab is then a contiguous slice of the
    segment buffer, exactly as in the unstructured path."""
    B = pattern_words.shape[0]
    Gw = genome_words.shape[0]
    NWD2 = slab_io_words(cfg, kw)
    # maximum text chars a pair can touch: every window advances at most
    # tb_limit and reads W beyond its start, plus the word phase
    maxchars = max_windows * cfg.tb_limit + cfg.W + 15
    # + NWD2: slices near the segment end must not hit the in-bounds clamp
    seg_w = -(-maxchars // CHARS_PER_WORD) + 1 + NWD2
    starts_u = starts.astype(jnp.uint32)
    sw = (starts_u >> 4).astype(jnp.int32)
    # Contiguous per-lane slices, NOT an elementwise take: an (seg_w, B)
    # index gather runs at ~8.6ns/element on this workload (~0.29s at the
    # headline shape, 73% of core time — tools/probe_scan.py 2026-08-19);
    # vmapped dynamic_slice lowers to a gather of whole contiguous rows
    # (2.9KB each) and measures 3.1x faster. Out-of-range words past the
    # genome end replicate the last word exactly like the old
    # min(idx, Gw-1) clamp: the pad region below is genome_words[-1] and
    # sw <= Gw-1 keeps dynamic_slice from ever clamping the start, so the
    # resulting buffer is bit-identical.
    gpad = jnp.broadcast_to(genome_words[-1:], (seg_w,))
    gwords_p = jnp.concatenate([genome_words, gpad])
    seg_t = jax.vmap(
        lambda s: lax.dynamic_slice_in_dim(gwords_p, s, seg_w))(sw).T
    tphase = (starts_u & 15).astype(jnp.int32)

    pattern_t = jnp.pad(pattern_words, ((0, 0), (0, NWD2))).T

    return _align_scan(cfg, sk, kw, max_windows, seg_t, tphase,
                       text_len, pattern_t, pattern_len)


def _pack_rows_dense(entries):
    """Stable-compact each window's valid (nonzero) sparse rows into a
    dense prefix along the row axis.

    NOT on the production path (compact_entries_sparse flattens straight
    into engine_xla._compact_flat_logshift); retained, with its oracle
    test, as the documented proof-of-argument for the log-shift routing
    both compactors share (engine_xla._compact_flat_logshift cites it).

    entries: (MAXW, NE3, B) uint16, empty slots 0. A valid row at position
    r with j-1 valid rows above it must shift down by d = r+1 - vcum[r],
    and d is non-decreasing in r — so a log-depth sequence of
    conditional power-of-two down-shifts (move iff bit k of the remaining
    distance is set, LSB first) routes every row to its target without
    collisions (validated against a scalar oracle over random patterns in
    tests/test_engine_pallas.py). ~2 log2(NE3) elementwise passes over the
    run store; replaces a per-output-element binary search whose sub-word
    gathers were ~100x slower than this on TPU."""
    maxw, ne3, b = entries.shape
    valid = entries != 0
    vcum = cumsum_log(valid.astype(jnp.uint8), axis=1)
    riota = jnp.arange(1, ne3 + 1, dtype=jnp.uint8)[None, :, None]
    dist = jnp.where(valid, riota - vcum, jnp.uint8(0))
    ent = entries
    k = 1
    while k < ne3:
        src_e = jnp.pad(ent, ((0, 0), (0, k), (0, 0)))[:, k:, :]
        src_d = jnp.pad(dist, ((0, 0), (0, k), (0, 0)))[:, k:, :]
        take = (src_d & jnp.uint8(k)) != 0
        ent = jnp.where(take, src_e, ent)
        dist = jnp.where(take, src_d - jnp.uint8(k), dist)
        k *= 2
    # rows >= the window's run count may hold stale copies of rows that
    # shifted down; they are never addressed (e < count), left as-is
    return ent


def unpack_entry_pairs(packed):
    """Pair-packed engine rows (MAXW, NE3/2, B) int32 -> sparse u16 rows
    (MAXW, NE3, B): row 2j from the low halfword, 2j+1 from the high.
    Values are < 2^30, so the arithmetic >> is safe. Call this INSIDE a
    consumer's jit — XLA fuses it into the consumer's first elementwise
    pass, which is the point of deferring it out of the engine (a
    materialized unpack cost a 1.9 GB store + re-read per headline
    batch)."""
    maxw, ne3h, b = packed.shape
    lo = (packed & 0xFFFF).astype(jnp.uint16)
    hi = (packed >> 16).astype(jnp.uint16)
    return jnp.stack([lo, hi], axis=2).reshape(maxw, 2 * ne3h, b)


@functools.partial(jax.jit, static_argnums=(2,))
def compact_entries_sparse(entries, counts, cap: int):
    """engine_xla.compact_entries for the Pallas engine's SPARSE rows.

    entries: the engine's pair-packed (MAXW, NE3/2, B) int32 rows (see
    unpack_entry_pairs) holding per-window traceback rows where empty
    slots are 0 and each lane's non-empty slots hold its maximal CIGAR
    runs in order; counts: (MAXW, B) int32 runs per window (== the
    nonzero slots per window). Output slot g of lane b holds the g-th run
    of that pair; slots >= total are 0.

    One log-shift compaction over the flattened (MAXW*NE3) row axis
    (engine_xla._compact_flat_logshift) — purely elementwise; validity is
    slot != 0. The two earlier designs both gathered: a per-element row
    binary search (~11 s/batch at the headline benchmark shape) and a
    window binary search + word-packed run gather (~5 s/batch); the
    gather-free shifts run the same batch in ~0.2 s."""
    maxw, ne3h, b = entries.shape
    from .engine_xla import _compact_flat_logshift

    flat = unpack_entry_pairs(entries).reshape(maxw * 2 * ne3h, b)
    out, totals = _compact_flat_logshift(flat, flat != 0, cap)
    return out.astype(jnp.uint16), totals


@functools.partial(jax.jit, static_argnums=(2,))
def compact_entries_sparse_u8(entries, counts, cap: int):
    """compact_entries_sparse with runs repacked to uint8 (op<<6|count,
    valid when tb_limit <= 63 — see engine_xla._entries_to_u8) BEFORE the
    log-shift passes, halving their traffic."""
    from .engine_xla import _compact_flat_logshift, _entries_to_u8

    maxw, ne3h, b = entries.shape
    flat = unpack_entry_pairs(entries).reshape(maxw * 2 * ne3h, b)
    out, totals = _compact_flat_logshift(_entries_to_u8(flat), flat != 0,
                                         cap)
    return out.astype(jnp.uint8), totals
