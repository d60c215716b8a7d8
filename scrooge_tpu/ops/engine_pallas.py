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
   4 bases/byte, genasm_gpu.cu:162-189), and the outer scan gathers one
   SLAB of (KW-1)*TB + W chars per KW windows: XLA TPU gathers cost
   ~8ns/element regardless of width, so slab word-gathers cost ~25x less
   than per-window byte gathers — the difference between glue-bound and
   compute-bound. Window extraction from the slab happens in-kernel at
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


def slab_chars(cfg: AlignConfig, kw: int) -> int:
    """Chars a KW-window slab must cover: each window consumes at most
    tb_limit text/pattern chars before the next starts."""
    return (kw - 1) * cfg.tb_limit + cfg.W


def slab_words(cfg: AlignConfig, kw: int) -> int:
    """uint32 words covering a slab at an arbitrary 2-bit start offset."""
    return -(-slab_chars(cfg, kw) // CHARS_PER_WORD) + 1


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
    ff = (cfg.W + 1) * cfg.num_words * lane_b
    pmi = cfg.W * cfg.num_words * lane_b
    upat = cfg.W * lane_b
    pmc = 4 * cfg.num_words * lane_b
    ent = (kw + 1) * tb_rows(cfg) * lane_b
    io = 2 * slab_words(cfg, kw) * lane_b + 16 * lane_b
    return r + ff + pmi + upat + pmc + ent + 2 * io


# A 72MB-scratch kernel (W=128, sk=8, kw=4) compiles and runs on v5e;
# leave margin for Mosaic temporaries above that empirical point.
VMEM_BUDGET = 76 << 20


def choose_kernel_shape(cfg: AlignConfig, S: int,
                        budget_bytes: int = VMEM_BUDGET):
    """(sublane tile, windows-per-slab) for a batch of S sublane groups.

    Mosaic block constraint: the sublane block dim must be a multiple of 8
    or equal to the full dimension. sk=32 x kw=8 measures fastest at the
    default config (fewer grid steps; the coarser per-tile early-
    termination coupling costs less than the amortization gains); smaller
    shapes trade slab fusion for VMEM so larger-W configs (W=128 at ~72MB
    scratch) still run on the Pallas engine. Returns (0, 0) if nothing fits.
    """
    candidates = [min(32, S), min(16, S), min(8, S)]
    if _SK_OVERRIDE:  # measurement-only tile override (see _ABLATE)
        candidates = [min(_SK_OVERRIDE, S)]
    for sk in dict.fromkeys(candidates):
        if sk <= 0 or S % sk:
            continue
        for kw in (DEFAULT_KW, 4, 2, 1):
            if kernel_vmem_bytes(cfg, sk, kw) <= budget_bytes:
                return sk, kw
    return 0, 0


def choose_sublane_tile(cfg: AlignConfig, S: int,
                        budget_bytes: int = VMEM_BUDGET) -> int:
    return choose_kernel_shape(cfg, S, budget_bytes)[0]


def fits_vmem(cfg: AlignConfig, budget_bytes: int = VMEM_BUDGET) -> bool:
    return kernel_vmem_bytes(cfg, 8) <= budget_bytes


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


def _unpack_char(words, bit, nwd):
    """Extract the 2-bit code at per-lane bit offset `bit` from the per-lane
    word list `words` (each (sk,128) uint32). bit in [0, 32*nwd)."""
    widx = bit >> 5
    sh = bit & 31
    word = words[0]
    for wdi in range(1, nwd):
        word = jnp.where(widx == wdi, words[wdi], word)
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
    NWD = slab_words(cfg, kw)
    NE3 = tb_rows(cfg)
    sk = tlen_ref.shape[0]
    lane = (sk, LANE)
    top_bit_off = (W - 1) % 32

    tlen = tlen_ref[...]
    plen = plen_ref[...]
    twords = [twords_ref[wdi] for wdi in range(NWD)]
    pwords = [pwords_ref[wdi] for wdi in range(NWD)]
    toff0 = toff_ref[...]
    poff0 = poff_ref[...]

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
        toff = toff0 + 2 * (ref_idx - ref0)
        poff = poff0 + 2 * (read_idx - read0)

        def build_pm():
            # ---- unpack the pattern window from the slab into upat ----
            for j in range(W):
                upat_ref[j] = _unpack_char(pwords, poff + 2 * j, NWD)

            # ---- pattern bitmasks (genasm_cpu.cpp:178-198, MSB-aligned):
            # global bit gb holds pattern position j = W-1-gb, valid iff
            # gb >= s ----
            pmc = [[None] * NW for _ in range(4)]
            for c in range(4):
                for w in range(NW):
                    acc = jnp.zeros(lane, jnp.uint32)
                    bits_here = min(32, W - 32 * w)
                    for b in range(bits_here):
                        gb = 32 * w + b
                        pos = upat_ref[W - 1 - gb]
                        match = (pos == c) & (gb >= s)
                        acc = acc | (match.astype(jnp.uint32) << b)
                    pmc[c][w] = (~acc) & lane_ones[w]

            def pm_body(i, _):
                t = _unpack_char(twords, toff + 2 * i, NWD)
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

            def sub_cond(sst):
                _, _, dd_, fin_, _, _, safety = sst
                active = (fin_ == 0) & (dd_ == lvl)
                return jnp.any(active) & (safety < TB + 2)

            def sub_body(sst):
                i_, j_, dd_, fin_, eq_, ed_, safety = sst
                active = (fin_ == 0) & (dd_ == lvl)
                term = active & ((j_ >= m) | (i_ >= TB) | (j_ >= TB))
                fin_ = jnp.where(term, 1, fin_)
                act = active & ~term

                # one sweep over the columns selects the row-(lvl-1)
                # entry words at per-lane columns i (A) and i+1 (B).
                # (A dynamic-bounded [min_i, max_i+2) sweep measured 14%
                # SLOWER end-to-end: the while-lowered loop + two cross-
                # lane reductions beat the static sweep's savings.)
                selA = [jnp.zeros(lane, jnp.uint32) for _ in range(NWH)]
                selB = [jnp.zeros(lane, jnp.uint32) for _ in range(NWH)]
                ip1 = i_ + 1
                for c in range(COLS):
                    eqA = i_ == c
                    eqB = ip1 == c
                    for w in range(NWH):
                        word = R_ref[lvl - 1, c, w]
                        selA[w] = jnp.where(eqA, word, selA[w])
                        selB[w] = jnp.where(eqB, word, selB[w])

                def bit_zero(sel, gbit):
                    word_idx = gbit >> 5
                    off = gbit & 31
                    acc = jnp.zeros(lane, jnp.uint32)
                    for w in range(NWH):
                        v = (sel[w].astype(jnp.int32) >> off
                             ).astype(jnp.uint32)
                        acc = acc | jnp.where(word_idx == (w + FTW),
                                              v & jnp.uint32(1),
                                              jnp.uint32(0))
                    return acc == 0

                jlast = j_ == (m - 1)
                i_limit = i_ >= n
                bj1 = W - 1 - (j_ + 1)
                zA_j1 = bit_zero(selA, bj1)
                zB_j = bit_zero(selB, W - 1 - j_)
                zB_j1 = bit_zero(selB, bj1)
                # boolean algebra instead of where(mask, literal, arr):
                # Mosaic cannot lower the i8->i1 truncation that produces
                can_ins = jlast | zA_j1
                can_del = ~jlast & ~i_limit & zB_j
                can_sub = ~i_limit & (jlast | zB_j1)

                op = jnp.where(
                    can_ins, OP_I,
                    jnp.where(can_del, OP_D,
                              jnp.where(can_sub, OP_X, OP_EQ)))
                is_eq = op == OP_EQ
                takes_i = op != OP_I
                takes_j = op != OP_D

                eq_ = eq_ + jnp.where(act & is_eq, 1, 0)
                ed_ = jnp.where(act & ~is_eq, op, ed_)
                i_ = i_ + jnp.where(act & takes_i, 1, 0)
                j_ = j_ + jnp.where(act & takes_j, 1, 0)
                dd_ = dd_ - jnp.where(act & ~is_eq, 1, 0)
                return i_, j_, dd_, fin_, eq_, ed_, safety + 1

            eq0 = jnp.zeros(lane, jnp.int32)
            edn0 = jnp.full(lane, OP_NONE, jnp.int32)
            i, j, dd, fin, eq, ed, _ = lax.while_loop(
                sub_cond, sub_body,
                (i, j, dd, fin, eq0, edn0, jnp.int32(0)))

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
        active = done == 0
        window_failed = active & ~found
        stalled = active & found & (i == 0) & (j == 0)
        new_failed = (failed != 0) | window_failed | stalled
        take = active & ~new_failed
        ed = ed + jnp.where(take, edits_used, 0)
        ref_idx = ref_idx + jnp.where(take, i, 0)
        read_idx = read_idx + jnp.where(take, j, 0)
        done = ((read_idx >= plen) | new_failed).astype(jnp.int32)
        failed = new_failed.astype(jnp.int32)

        entries_ref[k * NE3 : (k + 1) * NE3] = ent_ref[...]
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
    entries (KW*NE, S, 128) int32 and per-window run counts (KW, S, 128).
    """
    W = cfg.W
    NWD = slab_words(cfg, kw)
    NE3 = tb_rows(cfg)
    S = tlen.shape[0]
    assert S % sk == 0, (S, sk)
    grid = (S // sk,)

    def im3(t):
        return (0, t, 0)

    def im2(t):
        return (t, 0)

    def ime(t):
        return (0, t, 0)

    lane2 = pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM)
    slab3 = pl.BlockSpec((NWD, sk, LANE), im3, memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # ref_idx
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # read_idx
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # ed
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # done
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # failed
        jax.ShapeDtypeStruct((kw * NE3, S, LANE), jnp.int32),  # level runs
        jax.ShapeDtypeStruct((kw, S, LANE), jnp.int32),  # runs per window
    ]
    out_specs = [
        lane2, lane2, lane2, lane2, lane2,
        pl.BlockSpec((kw * NE3, sk, LANE), ime, memory_space=pltpu.VMEM),
        pl.BlockSpec((kw, sk, LANE), ime, memory_space=pltpu.VMEM),
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
        pltpu.VMEM((W, sk, LANE), jnp.int32),  # unpacked pattern chars
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
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(twords, toff, pwords, poff, tlen, plen,
      ref_idx, read_idx, ed, done, failed)


def _align_scan(cfg: AlignConfig, sk: int, kw: int, max_windows: int,
                gather_text_words, pwords_all, text_len, pattern_len
                ) -> BatchResult:
    """Slab scan over the batch: ceil(max_windows/kw) kernel invocations.

    gather_text_words(ref_idx (S,128) int32) -> ((NWD, B) uint32 words,
    (B,) int32 bit offsets) for the text slab of each lane (word-major so
    kernel blocks need no transpose).
    pwords_all: (B, Pw) uint32 pack_2bit words of the patterns.
    """
    B = pwords_all.shape[0]
    if B % LANE != 0:
        raise ValueError("batch must be a multiple of 128 lanes")
    S = B // LANE
    lane = (S, LANE)
    tlen = text_len.astype(jnp.int32).reshape(lane)
    plen = pattern_len.astype(jnp.int32).reshape(lane)
    NWD = slab_words(cfg, kw)
    NE = 2 * max(cfg.tb_limit, 1) + 2
    NE3 = tb_rows(cfg)
    n_steps = -(-max_windows // kw)

    Pw = pwords_all.shape[1]
    pwflat = pwords_all.reshape(B * Pw)
    prow = (jnp.arange(B, dtype=jnp.int32) * Pw)[None, :]
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

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
    ents0 = jnp.zeros((n_steps, kw, NE3, B), jnp.uint16)
    cnts0 = jnp.zeros((n_steps, kw, B), jnp.int32)

    def loop_cond(st):
        step, carry, _, _ = st
        done = carry[3]
        return (step < n_steps) & ~jnp.all(done != 0)

    def loop_body(st):
        step, carry, ents, cnts = st
        ref_idx, read_idx, ed, done, failed = carry

        twords, toff = gather_text_words(ref_idx)  # (NWD, B), (B,)
        rb = read_idx.reshape(B)
        pw0 = rb >> 4
        pidx = prow + jnp.minimum(pw0[None, :] + nwd_iota[:, None],
                                  Pw - 1)
        pwords = jnp.take(pwflat, pidx)  # (NWD, B) uint32
        poff = ((rb & 15) * 2).astype(jnp.int32)

        twords_t = twords.reshape(NWD, S, LANE)
        pwords_t = pwords.reshape(NWD, S, LANE)

        (ref_idx, read_idx, ed, done, failed, entries_i, nfl
         ) = slab_step_kernel(
            cfg, kw, sk, twords_t, toff.reshape(lane), pwords_t,
            poff.reshape(lane), tlen, plen,
            ref_idx, read_idx, ed, done, failed)

        ents = lax.dynamic_update_slice(
            ents, entries_i.astype(jnp.uint16).reshape(1, kw, NE3, B),
            (step, 0, 0, 0))
        cnts = lax.dynamic_update_slice(
            cnts, nfl.reshape(1, kw, B), (step, 0, 0))
        new_carry = (ref_idx, read_idx, ed, done, failed)
        return step + 1, new_carry, ents, cnts

    _, carry, entries, counts = lax.while_loop(
        loop_cond, loop_body, (jnp.int32(0), carry0, ents0, cnts0))

    _, read_idx, ed, done, failed = carry
    failed = (failed != 0) | (read_idx < plen)

    return BatchResult(
        edit_distance=ed.reshape(B),
        failed=failed.reshape(B),
        # SPARSE rows (tb_rows wide): non-empty slots are complete maximal
        # runs in order; compact with compact_entries_sparse[_u8]
        entries=entries.reshape(n_steps * kw, NE3, B),
        counts=counts.reshape(n_steps * kw, B).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def align_batch(cfg: AlignConfig, max_windows: int, sk: int, kw: int,
                text_words, text_len, pattern_words,
                pattern_len) -> BatchResult:
    """Pallas-engine unstructured batch alignment. text_words /
    pattern_words: (B, ceil(T/16)) / (B, ceil(P/16)) uint32 pack_2bit
    words (pack on host with pack_2bit_host)."""
    B, Tw = text_words.shape
    NWD = slab_words(cfg, kw)
    twflat = text_words.reshape(B * Tw)
    trow = (jnp.arange(B, dtype=jnp.int32) * Tw)[None, :]
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

    def gather_text_words(ref_idx):
        rb = ref_idx.reshape(B)
        w0 = rb >> 4
        idx = trow + jnp.minimum(w0[None, :] + nwd_iota[:, None], Tw - 1)
        words = jnp.take(twflat, idx)  # (NWD, B)
        return words, ((rb & 15) * 2).astype(jnp.int32)

    return _align_scan(cfg, sk, kw, max_windows, gather_text_words,
                       pattern_words, text_len, pattern_len)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def align_batch_mapped(cfg: AlignConfig, max_windows: int, sk: int, kw: int,
                       genome_words, starts, text_len,
                       pattern_words, pattern_len) -> BatchResult:
    """Pallas-engine read-mapping alignment: one shared 2-bit-packed genome
    in HBM (uint32 words, pack_2bit layout), per-lane global char offsets —
    the reference's shared-reference views (genasm_gpu.cu:692-743) without
    per-pair copies. starts: (B,) uint32 global char offsets;
    pattern_words: (B, ceil(P/16)) uint32 pack_2bit words."""
    B = pattern_words.shape[0]
    Gw = genome_words.shape[0]
    NWD = slab_words(cfg, kw)
    starts_u = starts.astype(jnp.uint32)
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

    def gather_text_words(ref_idx):
        gchar = starts_u.reshape(B) + ref_idx.reshape(B).astype(jnp.uint32)
        w0 = (gchar >> 4).astype(jnp.int32)  # word index fits int32 (<2^28)
        idx = jnp.minimum(w0[None, :] + nwd_iota[:, None], Gw - 1)
        words = jnp.take(genome_words, idx)  # (NWD, B)
        toff = ((gchar & 15) * 2).astype(jnp.int32)
        return words, toff

    return _align_scan(cfg, sk, kw, max_windows, gather_text_words,
                       pattern_words, text_len, pattern_len)


@functools.partial(jax.jit, static_argnums=(2,))
def compact_entries_sparse(entries, counts, cap: int):
    """engine_xla.compact_entries for the Pallas engine's SPARSE rows.

    entries: (MAXW, NE3, B) uint16 per-window traceback rows where empty
    slots are 0 and each lane's non-empty slots hold its maximal CIGAR
    runs in order; counts: (MAXW, B) int32 runs per window. Output slot g
    of lane b holds the g-th run of that pair; slots >= total are 0.

    Two-level search: the window by a binary search over the per-window
    count prefix sums (as compact_entries), then the run's ROW inside the
    window by a binary search over a per-window validity prefix sum. The
    row prefix is built with log-depth pad-shift adds — XLA lowers
    jnp.cumsum along a short axis to an O(L)-pass reduce-window on TPU,
    which measured ~30x slower. Row lookups are flat jnp.take (fast path;
    take_along_axis on wide operands is far slower, see
    engine_xla.compact_entries notes).
    """
    maxw, ne3, b = entries.shape
    # uint8 prefix (values <= ne3 < 256): this buffer spans the whole
    # sparse run store, so width dominates the HBM high-water mark
    valid = (entries != 0).astype(jnp.uint8)
    vcum = valid
    sh = 1
    while sh < ne3:
        vcum = vcum + jnp.pad(vcum, ((0, 0), (sh, 0), (0, 0)))[:, :ne3, :]
        sh *= 2

    cum = jnp.cumsum(counts, axis=0)  # inclusive, (MAXW, B)
    totals = cum[-1]
    g = jnp.arange(cap, dtype=jnp.int32)[:, None]  # (cap, 1)
    lane_iota = jnp.arange(b, dtype=jnp.int32)[None, :]
    lo = jnp.zeros((cap, b), jnp.int32)
    hi = jnp.full((cap, b), maxw, jnp.int32)
    for _ in range(max(1, maxw.bit_length())):
        mid = (lo + hi) >> 1
        cmid = jnp.take_along_axis(cum, jnp.minimum(mid, maxw - 1), axis=0)
        go_right = cmid <= g
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    w = jnp.minimum(lo, maxw - 1)
    prev = jnp.where(w > 0,
                     jnp.take_along_axis(cum, jnp.maximum(w - 1, 0), axis=0),
                     0)
    e = g - prev  # 0-based run index within window w
    vflat = vcum.reshape(-1)
    lo2 = jnp.zeros((cap, b), jnp.int32)
    hi2 = jnp.full((cap, b), ne3, jnp.int32)
    for _ in range(max(1, ne3.bit_length())):
        mid = (lo2 + hi2) >> 1
        idxf = (w * ne3 + jnp.minimum(mid, ne3 - 1)) * b + lane_iota
        cmid = jnp.take(vflat, idxf)
        go_right = cmid <= e
        lo2 = jnp.where(go_right, mid + 1, lo2)
        hi2 = jnp.where(go_right, hi2, mid)
    r = jnp.minimum(lo2, ne3 - 1)

    src = (w * ne3 + r) * b + lane_iota
    out = jnp.take(entries.reshape(-1), src)
    valid_g = g < totals[None, :]
    return jnp.where(valid_g, out, 0).astype(jnp.uint16), totals


@functools.partial(jax.jit, static_argnums=(2,))
def compact_entries_sparse_u8(entries, counts, cap: int):
    """compact_entries_sparse + uint8 repack (op << 6 | count), valid when
    tb_limit <= 63 — see engine_xla.compact_entries_u8."""
    out16, totals = compact_entries_sparse(entries, counts, cap)
    ops = (out16 >> ENTRY_OP_SHIFT).astype(jnp.uint8)
    cnts = (out16 & ENTRY_CNT_MASK).astype(jnp.uint8)
    return ((ops << 6) | cnts).astype(jnp.uint8), totals
