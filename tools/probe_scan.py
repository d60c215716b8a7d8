#!/usr/bin/env python3
"""Where does core time go? Stage-isolated timings of the Pallas
genome-mapped alignment path at the headline shape.

Stages timed separately (each its own jit, real device syncs):
  gather_take   the production segment extraction (jnp.take, word-major)
  gather_slice  candidate replacement: vmap(dynamic_slice) + transpose
  scan          ep._align_scan on a precomputed segment buffer
  scan_noents   the same slab loop WITHOUT the (n_steps,kw,NE3,B) entries
                accumulation (checksum only) - isolates that buffer's cost
  full          align_batch_mapped (everything fused, the production call)

Run: python tools/probe_scan.py [--batch 32768] [--read_len 10000]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32_768)
    p.add_argument("--read_len", type=int, default=10_000)
    p.add_argument("--accuracy", type=float, default=0.95)
    args = p.parse_args(argv)
    batch, read_len = args.batch, args.read_len

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from scrooge_tpu.api import encode_np
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.ops import engine_pallas as ep
    from scrooge_tpu.utils.simulate import simulate_dataset

    cfg = AlignConfig(W=64, K=64, O=33, batch_tile=batch)
    ds = simulate_dataset(genome_len=1_000_000, num_reads=batch,
                          read_len=read_len, accuracy=args.accuracy, seed=7)
    genome_codes = encode_np(ds.genome.content)
    gpad = -(-len(genome_codes) // 16) * 16
    gwords = jax.device_put(ep.pack_2bit_host(
        np.pad(genome_codes, (0, gpad - len(genome_codes)))[None, :])[0])
    longest = max(len(r.content) for r in ds.reads)
    maxw = -(-cfg.max_windows(longest) // 32) * 32
    P = -(-longest // 1024) * 1024
    pattern = np.zeros((batch, P), np.uint8)
    plen = np.zeros(batch, np.int32)
    starts = np.zeros(batch, np.uint32)
    tlen = np.zeros(batch, np.int32)
    bound = maxw * cfg.tb_limit + cfg.W
    for i, r in enumerate(ds.reads):
        q = encode_np(r.content)
        pattern[i, : len(q)] = q
        plen[i] = len(q)
        st = r.locations[0].start_in_reference
        starts[i] = st
        tlen[i] = min(len(genome_codes) - st, bound)
    pwords = ep.pack_2bit_host(pattern)
    starts_d, tlen_d, pwords_d, plen_d = (
        jax.device_put(x) for x in (starts, tlen, pwords, plen))
    sk, kw = ep.choose_kernel_shape(cfg, batch // 128)
    print(f"sk={sk} kw={kw} maxw={maxw}", file=sys.stderr)

    NWD2 = ep.slab_io_words(cfg, kw)
    Gw = gwords.shape[0]
    maxchars = maxw * cfg.tb_limit + cfg.W + 15
    seg_w = -(-maxchars // ep.CHARS_PER_WORD) + 1 + NWD2

    @jax.jit
    def gather_take(genome_words, starts):
        starts_u = starts.astype(jnp.uint32)
        sw = (starts_u >> 4).astype(jnp.int32)
        idx = jnp.minimum(sw[None, :]
                          + jnp.arange(seg_w, dtype=jnp.int32)[:, None],
                          Gw - 1)
        seg = jnp.take(genome_words, idx)
        return seg, seg.sum(dtype=jnp.uint32)

    @jax.jit
    def gather_slice(genome_words, starts):
        starts_u = starts.astype(jnp.uint32)
        sw = jnp.minimum((starts_u >> 4).astype(jnp.int32),
                         max(Gw - seg_w, 0))
        seg = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(genome_words, s, seg_w))(sw).T
        return seg, seg.sum(dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnums=())
    def pat_prep(pattern_words):
        pat = jnp.pad(pattern_words, ((0, 0), (0, NWD2))).T
        return pat, pat.sum(dtype=jnp.uint32)

    _scan_inner = functools.partial(ep._align_scan, cfg, sk, kw, maxw)

    @jax.jit
    def scan(*a):
        r = _scan_inner(*a)
        chk = (r.edit_distance.sum() + r.failed.sum()
               + r.entries.astype(jnp.int32).sum() + r.counts.sum())
        return r, chk

    # the slab loop without the big entries buffers: checksums only
    def _scan_noents(text_t, tphase, text_len, pattern_t, pattern_len):
        B = pattern_t.shape[1]
        S = B // ep.LANE
        lane = (S, ep.LANE)
        tl = text_len.astype(jnp.int32).reshape(lane)
        pl_ = pattern_len.astype(jnp.int32).reshape(lane)
        n_steps = -(-maxw // kw)
        tph = tphase.astype(jnp.int32).reshape(B)
        carry0 = (jnp.zeros(lane, jnp.int32), jnp.zeros(lane, jnp.int32),
                  jnp.zeros(lane, jnp.int32),
                  (pl_ <= 0).astype(jnp.int32), jnp.zeros(lane, jnp.int32))
        sl = functools.partial(
            ep._align_scan.__globals__["lax"].dynamic_slice, )  # unused

        def slab_slice(buf_t, cpos, act):
            wd = buf_t.shape[0]
            M = ep.SLAB_MARGIN_WORDS
            w0 = cpos >> 4
            w0min = jnp.min(jnp.where(act, w0, jnp.int32(1 << 30)))
            w0max = jnp.max(jnp.where(act, w0, jnp.int32(-1)))
            n_act = jnp.maximum(jnp.sum(act.astype(jnp.int32)), 1)
            w0mean = jnp.sum(jnp.where(act, w0, 0)) // n_act
            centered = jnp.clip(w0mean - M // 2, w0min, w0max)
            base = jnp.where(w0max - w0min <= M, w0min, centered)
            base = jnp.clip(base, 0, max(wd - NWD2, 0))
            words = lax.dynamic_slice(buf_t, (base, jnp.int32(0)),
                                      (NWD2, B))
            woff = w0 - base
            bad = act & ((woff < 0) | (woff > M))
            off = ((cpos & 15) * 2 + jnp.clip(woff, 0, M) * 32)
            return words, off.astype(jnp.int32), bad

        def loop_cond(st):
            step, carry, _ = st
            return (step < n_steps) & ~jnp.all(carry[3] != 0)

        def loop_body(st):
            step, carry, chk = st
            ref_idx, read_idx, ed, done, failed = carry
            act = (done == 0).reshape(B)
            twords, toff, bad_t = slab_slice(text_t,
                                             tph + ref_idx.reshape(B), act)
            pwords_, poff, bad_p = slab_slice(pattern_t,
                                              read_idx.reshape(B), act)
            bad = (bad_t | bad_p).reshape(lane)
            done = jnp.where(bad, 1, done)
            failed = failed | jnp.where(bad, ep.FAIL_DRIFT, 0)
            (ref_idx, read_idx, ed, done, failed, entries_i, nfl
             ) = ep.slab_step_kernel(
                cfg, kw, sk, twords.reshape(NWD2, S, ep.LANE),
                toff.reshape(lane), pwords_.reshape(NWD2, S, ep.LANE),
                poff.reshape(lane), tl, pl_,
                ref_idx, read_idx, ed, done, failed)
            chk = chk + entries_i.sum(axis=0) + nfl.sum(axis=0)
            return step + 1, (ref_idx, read_idx, ed, done, failed), chk

        _, carry, chk = lax.while_loop(
            loop_cond, loop_body,
            (jnp.int32(0), carry0, jnp.zeros(lane, jnp.int32)))
        return carry[2], chk.sum() + carry[2].sum()

    scan_noents = jax.jit(_scan_noents)

    def timed(tag, fn, *a):
        # block_until_ready does NOT wait on the tunneled axon plugin; a
        # small np.asarray readback is the only real sync (same trick as
        # tools/ablate_run.py). Each stage fn returns (big_out, checksum)
        # with a tiny checksum whose materialization forces the stage.
        outs = fn(*a)
        np.asarray(outs[1])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(*a)[1])
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:14s} {dt:7.4f}s  ({batch/dt:9.1f} aligns/s-equiv)")
        return dt, outs[0]

    t_take, seg = timed("gather_take", gather_take, gwords, starts_d)
    t_slice, seg2 = timed("gather_slice", gather_slice, gwords, starts_d)
    same = bool(jnp.array_equal(
        seg[:, : min(4096, batch)], seg2[:, : min(4096, batch)]))
    print(f"gather parity (first 4096 lanes): {same}")
    t_pat, pat_t = timed("pat_prep", pat_prep, pwords_d)
    tph = jnp.zeros((batch,), jnp.int32) + (
        starts_d.astype(jnp.uint32) & 15).astype(jnp.int32)
    seg = jax.device_put(seg)
    pat_t = jax.device_put(pat_t)
    t_scan, r = timed("scan", scan, seg, tph, tlen_d, pat_t, plen_d)
    t_noe, r2 = timed("scan_noents", scan_noents, seg, tph, tlen_d,
                      pat_t, plen_d)

    @jax.jit
    def full():
        r = ep.align_batch_mapped(cfg, maxw, sk, kw, gwords, starts_d,
                                  tlen_d, pwords_d, plen_d)
        chk = (r.edit_distance.sum() + r.failed.sum()
               + r.entries.astype(jnp.int32).sum() + r.counts.sum())
        return r, chk

    t_full, rf = timed("full", full)
    print(f"\nbreakdown: gather={t_take:.3f} pat={t_pat:.3f} "
          f"scan={t_scan:.3f} (sum {t_take+t_pat+t_scan:.3f} vs "
          f"full {t_full:.3f})")
    print(f"entries-accum cost: {t_scan - t_noe:.3f}s; "
          f"gather_slice saves {t_take - t_slice:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
