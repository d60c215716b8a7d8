"""Pallas TPU kernel engine: DP fill + traceback in VMEM.

Same windowed-alignment semantics as engine_xla (and therefore the scalar
oracle and the reference C++, genasm_cpu.cpp:210-438) with the hot per-
window work — pattern-bitmask build, GenASM DP fill, and traceback with
CIGAR run emission — fused into ONE Pallas kernel per window so the R
traceback table lives entirely in VMEM and never touches HBM. This is the
TPU analogue of the reference GPU's shared-memory DP storage
(genasm_gpu.cu:584-600, DP_MEMORY=SHARED), with lane-tile batching standing
in for the per-pair thread blocks.

TPU-first design decisions (deliberately NOT the GPU mapping):
 - no anti-diagonal wavefront/shuffle_up: batch lanes already fill the VPU,
   so the fill runs the CPU-style sequential (d, i) loops with every lane
   advancing in lockstep; cross-lane communication is zero.
 - sequences are 2-bit packed, 16 bases/uint32 word (the reference packs
   4 bases/byte, genasm_gpu.cu:162-189). Window extraction gathers ~W/16+1
   WORDS per lane instead of W bytes: XLA TPU gathers cost ~8ns/element
   regardless of width, so word gathers are ~13x cheaper than byte gathers
   — this is the difference between glue-bound and compute-bound.
 - early termination is batched per lane-tile: the d-loop is a while_loop
   that stops once every lane in the tile has found its window distance.
 - traceback is a lockstep d-level sweep reading R rows from VMEM; the
   CIGAR-run flush is predicated on any-lane-flushing, which removes ~90%
   of its VMEM traffic at realistic error rates.

The kernel grid runs over lane tiles of the batch; windows advance in an
outer XLA lax.scan (word gathers + carry updates stay in XLA). Outputs are
bit-identical to engine_xla — tests/test_engine_pallas.py enforces it — so
either engine can back the public API.
"""

from __future__ import annotations

import functools

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
    ENTRY_OP_SHIFT,
    OP_D,
    OP_EQ,
    OP_I,
    OP_NONE,
    OP_X,
)

LANE = 128
CHARS_PER_WORD = 16  # 2-bit codes per uint32


def num_window_words(W: int) -> int:
    """uint32 words covering W chars at an arbitrary 2-bit offset."""
    return W // CHARS_PER_WORD + 1


def kernel_vmem_bytes(cfg: AlignConfig, sk: int) -> int:
    """Approximate VMEM footprint of the window kernel for sublane tile sk."""
    lane_b = sk * LANE * 4
    r = cfg.rows * cfg.columns * cfg.num_tb_words * lane_b
    ff = (cfg.W + 1) * cfg.num_words * lane_b
    pmi = cfg.W * cfg.num_words * lane_b
    upat = cfg.W * lane_b
    pmc = 4 * cfg.num_words * lane_b
    ent = (2 * max(cfg.tb_limit, 1) + 2) * lane_b
    io = 2 * num_window_words(cfg.W) * lane_b + 10 * lane_b
    return r + ff + pmi + upat + pmc + ent + 2 * io


VMEM_BUDGET = 11 << 20  # leaves headroom for Mosaic temporaries


def choose_sublane_tile(cfg: AlignConfig, S: int,
                        budget_bytes: int = VMEM_BUDGET) -> int:
    """Sublane tile for a batch of S sublane groups (S a power of two).

    Mosaic block constraint: the sublane block dim must be a multiple of 8
    or equal to the full dimension, so the only valid choices here are
    min(8, S) (S is a power of two). Returns 0 if that doesn't fit VMEM.
    """
    sk = min(8, S)
    if S % sk != 0:
        return 0
    return sk if kernel_vmem_bytes(cfg, sk) <= budget_bytes else 0


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


def _window_kernel(cfg: AlignConfig,
                   twords_ref, toff_ref, pwords_ref, poff_ref, m_ref, n_ref,
                   wed_ref, found_ref, icons_ref, jcons_ref,
                   entries_ref, nfl_ref,
                   R_ref, ff_ref, pmi_ref, upat_ref):
    W, K, O = cfg.W, cfg.K, cfg.O
    NW, FTW = cfg.num_words, cfg.first_tb_word
    NWH = cfg.num_tb_words
    COLS, TB = cfg.columns, cfg.tb_limit
    NWD = num_window_words(W)
    NE = 2 * max(TB, 1) + 2
    sk = m_ref.shape[0]
    lane = (sk, LANE)
    top_bit_off = (W - 1) % 32

    m = m_ref[...]
    n = n_ref[...]
    s = W - m
    lane_ones = _ones_shifted_u32(s, W, NW)

    # ---- unpack the pattern window from packed words into upat ----
    pwords = [pwords_ref[wdi] for wdi in range(NWD)]
    poff = poff_ref[...]
    for j in range(W):
        upat_ref[j] = _unpack_char(pwords, poff + 2 * j, NWD)

    # ---- pattern bitmasks (genasm_cpu.cpp:178-198, MSB-aligned) ----
    # global bit gb (word gb//32, offset gb%32) holds pattern position
    # j = W-1-gb, valid iff gb >= s. Build per-char masks, then per-text-
    # position PM rows into the pmi scratch.
    pmc = [[None] * NW for _ in range(4)]
    for c in range(4):
        for w in range(NW):
            acc = jnp.zeros(lane, jnp.uint32)
            bits_here = min(32, W - 32 * w)
            for b in range(bits_here):
                gb = 32 * w + b
                pos = upat_ref[W - 1 - gb]  # pattern char at j = W-1-gb
                match = (pos == c) & (gb >= s)
                acc = acc | (match.astype(jnp.uint32) << b)
            pmc[c][w] = (~acc) & lane_ones[w]

    twords = [twords_ref[wdi] for wdi in range(NWD)]
    toff = toff_ref[...]

    def pm_body(i, _):
        t = _unpack_char(twords, toff + 2 * i, NWD)
        for w in range(NW):
            word = pmc[0][w]
            for c in range(1, 4):
                word = jnp.where(t == c, pmc[c][w], word)
            pmi_ref[i, w] = word
        return 0

    lax.fori_loop(0, W, pm_body, 0)

    # ---- DP fill (genasm_cpu.cpp:210-288) ----
    def d_body(st):
        d, found, wed = st
        ones_d = _ones_shifted_u32(s + d, W, NW)
        is_zero = d == 0

        def i_body(step, carry):
            i = W - step
            right, topright = carry  # tuples of NW uint32 words
            top = [ff_ref[i, w] for w in range(NW)]
            ip = jnp.minimum(i, W - 1)
            cur_pm = [pmi_ref[ip, w] for w in range(NW)]
            is_start = i >= n
            sh_r = _shl1_u32(right, W)
            sh_tr = _shl1_u32(topright, W)
            sh_t = _shl1_u32(top, W)
            center = []
            for w in range(NW):
                mat = sh_r[w] | cur_pm[w]
                full = mat & sh_tr[w] & sh_t[w] & topright[w]
                nonstart = jnp.where(is_zero, mat, full)
                cw = jnp.where(is_start, ones_d[w], nonstart)
                center.append(cw)
                ff_ref[i, w] = cw
            # stored entry: traceback words only; i >= COLS lands on slot
            # COLS-1 and is overwritten later as i descends
            ic = jnp.minimum(i, COLS - 1)
            for w in range(NWH):
                R_ref[d, ic, w] = center[FTW + w]
            return tuple(center), tuple(top)

        z = tuple(jnp.zeros(lane, jnp.uint32) for _ in range(NW))
        center, _ = lax.fori_loop(0, W + 1, i_body, (z, z))

        hit = ((center[NW - 1] >> top_bit_off) & 1) == 0
        newly = hit & (found == 0)
        wed = jnp.where(newly, d, wed)
        found = jnp.where(newly, 1, found)
        return d + 1, found, wed

    def d_cond(st):
        d, found, _ = st
        in_range = d <= K
        if cfg.early_termination:
            return in_range & ~jnp.all(found != 0)
        return in_range

    found0 = jnp.zeros(lane, jnp.int32)
    wed0 = jnp.zeros(lane, jnp.int32)
    _, found, wed = lax.while_loop(d_cond, d_body, (jnp.int32(0), found0, wed0))
    found = found != 0
    wed = jnp.where(found, wed, 0)

    # ---- traceback (genasm_cpu.cpp:290-409), lockstep d-level sweep ----
    def flush(nfl, op, cnt, do_flush):
        """Append packed (op, cnt) at per-lane slot nfl where do_flush.

        The (NE, sk, 128) read-modify-write only runs when some lane
        actually flushes — with realistic error rates op changes are rare,
        so this predication removes ~90% of the traceback's VMEM traffic.
        """
        @pl.when(jnp.any(do_flush))
        def _():
            packed = (op << ENTRY_OP_SHIFT) | cnt
            slot = lax.broadcasted_iota(jnp.int32, (NE,) + lane, 0)
            mask = (slot == nfl[None]) & do_flush[None]
            entries_ref[...] = jnp.where(mask, packed[None], entries_ref[...])

        return nfl + do_flush.astype(jnp.int32)

    entries_ref[...] = jnp.zeros((NE,) + lane, jnp.int32)

    def level_body(st):
        lvl, i, j, dd, fin, cur_op, cur_cnt, nfl = st

        def sub_cond(sst):
            _, _, dd_, fin_, _, _, _, safety = sst
            active = (fin_ == 0) & (dd_ == lvl)
            return jnp.any(active) & (safety < TB + 2)

        def sub_body(sst):
            i_, j_, dd_, fin_, cur_op_, cur_cnt_, nfl_, safety = sst
            active = (fin_ == 0) & (dd_ == lvl)
            term = active & ((j_ >= m) | (i_ >= TB) | (j_ >= TB))
            fin_ = jnp.where(term, 1, fin_)
            act = active & ~term

            # one sweep over the columns selects the row-(lvl-1) entry
            # words at per-lane columns i (A) and i+1 (B)
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
                """Bit `gbit` (per-lane int32) of the selected words == 0."""
                word_idx = gbit >> 5
                off = gbit & 31
                acc = jnp.zeros(lane, jnp.uint32)
                for w in range(NWH):
                    v = (sel[w].astype(jnp.int32) >> off).astype(jnp.uint32)
                    acc = acc | jnp.where(word_idx == (w + FTW),
                                          v & jnp.uint32(1), jnp.uint32(0))
                return acc == 0

            jlast = j_ == (m - 1)
            i_limit = i_ >= n
            bj1 = W - 1 - (j_ + 1)
            zA_j1 = bit_zero(selA, bj1)
            zB_j = bit_zero(selB, W - 1 - j_)
            zB_j1 = bit_zero(selB, bj1)
            # boolean algebra instead of where(mask, literal, arr): Mosaic
            # cannot lower the i8->i1 truncation the literal form produces
            can_ins = jlast | zA_j1
            can_del = ~jlast & ~i_limit & zB_j
            can_sub = ~i_limit & (jlast | zB_j1)

            op = jnp.where(
                can_ins, OP_I,
                jnp.where(can_del, OP_D, jnp.where(can_sub, OP_X, OP_EQ)))
            takes_i = (op == OP_D) | (op == OP_X) | (op == OP_EQ)
            takes_j = (op == OP_I) | (op == OP_X) | (op == OP_EQ)
            is_edit = op != OP_EQ

            changed = act & (op != cur_op_)
            do_flush = changed & (cur_cnt_ > 0)
            nfl_ = flush(nfl_, cur_op_, cur_cnt_, do_flush)
            cur_op_ = jnp.where(changed, op, cur_op_)
            cur_cnt_ = jnp.where(act, jnp.where(changed, 1, cur_cnt_ + 1),
                                 cur_cnt_)
            i_ = i_ + jnp.where(act & takes_i, 1, 0)
            j_ = j_ + jnp.where(act & takes_j, 1, 0)
            dd_ = dd_ - jnp.where(act & is_edit, 1, 0)
            return i_, j_, dd_, fin_, cur_op_, cur_cnt_, nfl_, safety + 1

        i, j, dd, fin, cur_op, cur_cnt, nfl, _ = lax.while_loop(
            sub_cond, sub_body,
            (i, j, dd, fin, cur_op, cur_cnt, nfl, jnp.int32(0)))
        return lvl - 1, i, j, dd, fin, cur_op, cur_cnt, nfl

    i0 = jnp.zeros(lane, jnp.int32)
    j0 = jnp.zeros(lane, jnp.int32)
    fin0 = (j0 >= m).astype(jnp.int32)
    nfl0 = jnp.zeros(lane, jnp.int32)
    cur_op0 = jnp.full(lane, OP_NONE, jnp.int32)
    cur_cnt0 = jnp.zeros(lane, jnp.int32)
    max_d = jnp.max(wed)
    _, i, j, dd, fin, cur_op, cur_cnt, nfl = lax.while_loop(
        lambda st: st[0] >= 1, level_body,
        (max_d, i0, j0, wed, fin0, cur_op0, cur_cnt0, nfl0))

    # final d==0 phase: closed-form '=' run (check-before-step)
    active0 = (fin == 0) & (dd == 0)
    run = jnp.minimum(jnp.minimum(m - j, TB - i), TB - j)
    run = jnp.where(active0, jnp.maximum(run, 0), 0)
    has_run = run > 0
    same = has_run & (cur_op == OP_EQ) & (cur_cnt > 0)
    do_flush = has_run & ~same & (cur_cnt > 0)
    nfl = flush(nfl, cur_op, cur_cnt, do_flush)
    cur_cnt = jnp.where(has_run, jnp.where(same, cur_cnt + run, run), cur_cnt)
    cur_op = jnp.where(has_run, OP_EQ, cur_op)
    i = i + run
    j = j + run

    # trailing flush (genasm_cpu.cpp:400-403)
    nfl = flush(nfl, cur_op, cur_cnt, cur_cnt > 0)

    wed_ref[...] = wed
    found_ref[...] = found.astype(jnp.int32)
    icons_ref[...] = i
    jcons_ref[...] = j
    nfl_ref[...] = nfl


@functools.partial(jax.jit, static_argnums=(0, 1))
def window_step_kernel(cfg: AlignConfig, sk: int,
                       twords, toff, pwords, poff, m, n):
    """Run the fused window kernel over the batch.

    twords/pwords: (NWD, S, 128) uint32 packed window words; toff/poff:
    (S, 128) int32 starting bit offsets; m/n: (S, 128) int32.
    Returns (wed, found, icons, jcons, entries(NE,S,128) int32, nfl).
    """
    W = cfg.W
    NW, NWH = cfg.num_words, cfg.num_tb_words
    NWD = num_window_words(W)
    NE = 2 * max(cfg.tb_limit, 1) + 2
    S = m.shape[0]
    assert S % sk == 0, (S, sk)
    grid = (S // sk,)

    def im3(t):  # (NWD, S, 128) blocked over sublane tiles
        return (0, t, 0)

    def im2(t):  # (S, 128)
        return (t, 0)

    def ime(t):  # (NE, S, 128)
        return (0, t, 0)

    out_shape = [
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # wed
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # found
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # icons
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # jcons
        jax.ShapeDtypeStruct((NE, S, LANE), jnp.int32),  # entries
        jax.ShapeDtypeStruct((S, LANE), jnp.int32),  # nfl
    ]
    out_specs = [
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((NE, sk, LANE), ime, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec((NWD, sk, LANE), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((NWD, sk, LANE), im3, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
        pl.BlockSpec((sk, LANE), im2, memory_space=pltpu.VMEM),
    ]
    scratch_shapes = [
        pltpu.VMEM((cfg.rows, cfg.columns, NWH, sk, LANE), jnp.uint32),  # R
        pltpu.VMEM((W + 1, NW, sk, LANE), jnp.uint32),  # forefront
        pltpu.VMEM((W, NW, sk, LANE), jnp.uint32),  # pmi
        pltpu.VMEM((W, sk, LANE), jnp.int32),  # unpacked pattern chars
    ]
    # off-TPU (tests, virtual CPU meshes) the kernel runs in interpreter
    # mode: slow but bit-identical, so parity tests cover the same code
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_window_kernel, cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(twords, toff, pwords, poff, m, n)


def _align_scan(cfg: AlignConfig, sk: int, max_windows: int,
                gather_text_words, pwords_all, text_len, pattern_len
                ) -> BatchResult:
    """Windowed scan over the batch.

    gather_text_words(ref_idx (S,128) int32) -> ((B, NWD) uint32 words,
    (B,) int32 bit offsets) for the text window of each lane.
    pwords_all: (B, Pw) uint32 pack_2bit words of the patterns.
    """
    B = pwords_all.shape[0]
    if B % LANE != 0:
        raise ValueError("batch must be a multiple of 128 lanes")
    S = B // LANE
    lane = (S, LANE)
    tlen = text_len.astype(jnp.int32).reshape(lane)
    plen = pattern_len.astype(jnp.int32).reshape(lane)
    W = cfg.W
    NWD = num_window_words(W)
    NE = 2 * max(cfg.tb_limit, 1) + 2

    Pw = pwords_all.shape[1]
    pwflat = pwords_all.reshape(B * Pw)
    prow = (jnp.arange(B, dtype=jnp.int32) * Pw).reshape(B, 1)
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

    carry0 = (
        jnp.zeros(lane, jnp.int32),  # ref_idx
        jnp.zeros(lane, jnp.int32),  # read_idx
        jnp.zeros(lane, jnp.int32),  # edit distance
        plen <= 0,  # done
        jnp.zeros(lane, bool),  # failed
    )

    def scan_body(carry, _):
        ref_idx, read_idx, ed, done, failed = carry
        m = jnp.where(done, 0, jnp.clip(plen - read_idx, 0, W))
        n = jnp.where(done, 0, jnp.clip(tlen - ref_idx, 0, W))

        twords, toff = gather_text_words(ref_idx)  # (B, NWD), (B,)
        rb = read_idx.reshape(B)
        pw0 = rb >> 4
        pidx = prow + jnp.minimum(pw0.reshape(B, 1) + nwd_iota[None, :],
                                  Pw - 1)
        pwords = jnp.take(pwflat, pidx)  # (B, NWD) uint32
        poff = ((rb & 15) * 2).astype(jnp.int32)

        twords_t = twords.reshape(S, LANE, NWD).transpose(2, 0, 1)
        pwords_t = pwords.reshape(S, LANE, NWD).transpose(2, 0, 1)
        toff_t = toff.reshape(lane)
        poff_t = poff.reshape(lane)

        wed, found_i, icons, jcons, entries_i, nfl = window_step_kernel(
            cfg, sk, twords_t, toff_t, pwords_t, poff_t, m, n)
        found = found_i != 0
        entries = entries_i.astype(jnp.uint16)

        # edits used by the kept traceback prefix == total count of non-'='
        # runs emitted this window (each edit op decrements dd by exactly 1,
        # so this equals wed - dd_final)
        ops = entries_i >> ENTRY_OP_SHIFT
        cnts = entries_i & ((1 << ENTRY_OP_SHIFT) - 1)
        slot = lax.broadcasted_iota(jnp.int32, entries_i.shape, 0)
        valid = slot < nfl[None]
        is_edit = valid & (ops != OP_EQ)
        edits_used = jnp.sum(jnp.where(is_edit, cnts, 0), axis=0)

        # carry update (genasm_cpu.cpp:432-435)
        active = ~done
        window_failed = active & ~found
        stalled = active & found & (icons == 0) & (jcons == 0)
        new_failed = failed | window_failed | stalled
        ed = ed + jnp.where(active & ~new_failed, edits_used, 0)
        ref_idx = ref_idx + jnp.where(active & ~new_failed, icons, 0)
        read_idx = read_idx + jnp.where(active & ~new_failed, jcons, 0)
        new_done = (read_idx >= plen) | new_failed

        nfl = jnp.where(active & ~new_failed, nfl, 0)
        new_carry = (ref_idx, read_idx, ed, new_done, new_failed)
        return new_carry, (entries.reshape(NE, B), nfl.reshape(B))

    carry, (entries, counts) = lax.scan(
        scan_body, carry0, None, length=max_windows)

    _, read_idx, ed, done, failed = carry
    failed = failed | (read_idx < plen)

    return BatchResult(
        edit_distance=ed.reshape(B),
        failed=failed.reshape(B),
        entries=entries,
        counts=counts.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def align_batch(cfg: AlignConfig, max_windows: int, sk: int,
                text_words, text_len, pattern_words,
                pattern_len) -> BatchResult:
    """Pallas-engine unstructured batch alignment. text_words /
    pattern_words: (B, ceil(T/16)) / (B, ceil(P/16)) uint32 pack_2bit
    words (pack on host with pack_2bit_host)."""
    B, Tw = text_words.shape
    NWD = num_window_words(cfg.W)
    twflat = text_words.reshape(B * Tw)
    trow = (jnp.arange(B, dtype=jnp.int32) * Tw).reshape(B, 1)
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

    def gather_text_words(ref_idx):
        rb = ref_idx.reshape(B)
        w0 = rb >> 4
        idx = trow + jnp.minimum(w0.reshape(B, 1) + nwd_iota[None, :], Tw - 1)
        words = jnp.take(twflat, idx)
        return words, ((rb & 15) * 2).astype(jnp.int32)

    return _align_scan(cfg, sk, max_windows, gather_text_words,
                       pattern_words, text_len, pattern_len)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def align_batch_mapped(cfg: AlignConfig, max_windows: int, sk: int,
                       genome_words, starts, text_len,
                       pattern_words, pattern_len) -> BatchResult:
    """Pallas-engine read-mapping alignment: one shared 2-bit-packed genome
    in HBM (uint32 words, pack_2bit layout), per-lane global char offsets —
    the reference's shared-reference views (genasm_gpu.cu:692-743) without
    per-pair copies. starts: (B,) uint32 global char offsets;
    pattern_words: (B, ceil(P/16)) uint32 pack_2bit words."""
    B = pattern_words.shape[0]
    Gw = genome_words.shape[0]
    NWD = num_window_words(cfg.W)
    starts_u = starts.astype(jnp.uint32)
    nwd_iota = jnp.arange(NWD, dtype=jnp.int32)

    def gather_text_words(ref_idx):
        gchar = starts_u.reshape(B) + ref_idx.reshape(B).astype(jnp.uint32)
        w0 = (gchar >> 4).astype(jnp.int32)  # word index fits int32 (<2^28)
        idx = jnp.minimum(w0.reshape(B, 1) + nwd_iota[None, :], Gw - 1)
        words = jnp.take(genome_words, idx)
        toff = ((gchar & 15) * 2).astype(jnp.int32)
        return words, toff

    return _align_scan(cfg, sk, max_windows, gather_text_words,
                       pattern_words, text_len, pattern_len)
