"""Kernel microbenchmark lab: isolate where the window-kernel time goes.

Variants of the DP fill, timed on synthetic data. Not part of the library.
Run: python tools/kernel_lab.py [variant ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, K, O = 64, 64, 33
NW = 2
COLS = W - O + 1
ROWS = K + 1
SK = 8
LANE = 128
TOPMASK = 0xFFFFFFFF


def _shl1(v):
    out = []
    for w in range(NW):
        word = v[w] << 1
        if w > 0:
            word = word | (v[w - 1] >> 31)
        out.append(word)
    return out


def fill_kernel(variant, m_ref, n_ref, pmi_ref, wed_ref, R_ref, ff_ref):
    m = m_ref[...]
    n = n_ref[...]
    s = W - m
    lane = (SK, LANE)

    def ones_shifted(shift):
        umax = jnp.full(lane, 0xFFFFFFFF, jnp.uint32)
        out = []
        for w in range(NW):
            c = jnp.clip(shift - 32 * w, 0, 32)
            word = jnp.where(c >= 32, jnp.uint32(0),
                             (umax.astype(jnp.int32) << jnp.minimum(c, 31)).astype(jnp.uint32))
            out.append(word)
        return out

    def d_body(st):
        d, found, wed = st
        ones_d = ones_shifted(s + d)
        is_zero = d == 0

        def i_body(step, carry):
            i = W - step
            right, topright = carry
            top = [ff_ref[i, w] for w in range(NW)]
            ip = jnp.minimum(i, W - 1)
            cur_pm = [pmi_ref[ip, w] for w in range(NW)]
            is_start = i >= n
            sh_r = _shl1(right)
            sh_tr = _shl1(topright)
            sh_t = _shl1(top)
            center = []
            for w in range(NW):
                mat = sh_r[w] | cur_pm[w]
                full = mat & sh_tr[w] & sh_t[w] & topright[w]
                nonstart = jnp.where(is_zero, mat, full)
                cw = jnp.where(is_start, ones_d[w], nonstart)
                center.append(cw)
                if variant != "noff":
                    ff_ref[i, w] = cw
            if variant not in ("nostore", "noff"):
                ic = jnp.minimum(i, COLS - 1)
                R_ref[d, ic, 0] = center[1]
            return tuple(center), tuple(top)

        z = tuple(jnp.zeros(lane, jnp.uint32) for _ in range(NW))
        center, _ = lax.fori_loop(0, W + 1, i_body, (z, z))

        hit = ((center[NW - 1] >> 31) & 1) == 0
        newly = hit & (found == 0)
        wed = jnp.where(newly, d, wed)
        found = jnp.where(newly, 1, found)
        return d + 1, found, wed

    def d_cond(st):
        d, found, _ = st
        return (d <= K) & ~jnp.all(found != 0)

    f0 = jnp.zeros(lane, jnp.int32)
    w0 = jnp.zeros(lane, jnp.int32)
    _, found, wed = lax.while_loop(d_cond, d_body, (jnp.int32(0), f0, w0))
    wed_ref[...] = wed


@functools.partial(jax.jit, static_argnums=(0, 1))
def run(variant, nwin, m, n, pmi):
    S = m.shape[0]
    grid = (S // SK,)

    def step(carry, _):
        wed = pl.pallas_call(
            functools.partial(fill_kernel, variant),
            grid=grid,
            in_specs=[
                pl.BlockSpec((SK, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SK, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, NW, SK, LANE), lambda t: (0, 0, t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SK, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, LANE), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((ROWS, COLS, 1, SK, LANE), jnp.uint32),
                pltpu.VMEM((W + 1, NW, SK, LANE), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(m, n, pmi)
        return carry + wed.sum(), None

    acc, _ = lax.scan(step, jnp.int32(0), None, length=nwin)
    return acc


def main():
    variants = sys.argv[1:] or ["full", "nostore", "noff"]
    B = 2048
    S = B // LANE
    rng = np.random.default_rng(0)
    m = np.full((S, LANE), 31, np.int32)  # typical mid-stream window
    n = np.full((S, LANE), W, np.int32)
    pmi = rng.integers(0, 2**32, (W, NW, S, LANE), dtype=np.uint32)
    # make the DP realistic: random masks give ~ small wed with ET
    NWIN = 64
    for v in variants:
        r = run(v, NWIN, m, n, pmi)
        r.block_until_ready()
        t0 = time.time()
        r = run(v, NWIN, m, n, pmi)
        r.block_until_ready()
        dt = time.time() - t0
        print(f"{v:8s}: {dt*1e3:8.1f} ms for {NWIN} windows x {B} pairs "
              f"-> {dt/NWIN*1e6:7.1f} us/window")


if __name__ == "__main__":
    main()
