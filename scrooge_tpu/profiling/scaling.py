"""Multi-device scaling-efficiency measurement.

Measures aligned pairs/second on a 1-D ``pairs`` mesh at 1..N devices and
reports weak-scaling efficiency (fixed per-device batch). The engine's
sharded program contains ZERO collectives (test_parallel.py asserts this on
the compiled HLO), so on real multi-chip hardware the only scaling losses
are host dispatch and result readback — per-chip device time is identical
by construction.

On the virtual CPU mesh used in tests/CI
(``--xla_force_host_platform_device_count=N``) all "devices" share one
host's cores, so the absolute efficiencies measured there are a LOWER
bound sanity check (they mostly measure the host's core count), not an ICI
result; the CSV records them with the platform column so they are not
mistaken for chip scaling.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m scrooge_tpu.profiling.scaling --out profile/scaling.csv
"""

from __future__ import annotations

import argparse
import csv
import sys
import time

import numpy as np


def measure(engine: str, per_device: int, read_len: int, reps: int):
    import jax

    from ..config import AlignConfig
    from ..ops import engine_pallas, engine_xla
    from ..parallel import mesh as M

    cfg = AlignConfig(W=64, K=64, O=33)
    platform = jax.default_backend()
    n_all = len(jax.devices())
    rows = []
    base_aps = None
    n = 1
    while n <= n_all:
        B = per_device * n
        rng = np.random.default_rng(5)
        tl = read_len + 80
        text = rng.integers(0, 4, (B, tl), dtype=np.uint8)
        pattern = np.where(
            rng.random((B, read_len)) < 0.05,
            rng.integers(0, 4, (B, read_len), dtype=np.uint8),
            text[:, :read_len]).astype(np.uint8)
        tlen = np.full(B, tl, np.int32)
        plen = np.full(B, read_len, np.int32)
        maxw = cfg.max_windows(read_len)
        mesh = M.make_mesh(n)

        if engine == "pallas":
            S_local = per_device // 128
            sk, kw = engine_pallas.choose_kernel_shape(cfg, S_local)
            tw = engine_pallas.pack_2bit_host(text)
            pw = engine_pallas.pack_2bit_host(pattern)

            def run():
                return M.pallas_align_on_mesh(cfg, maxw, sk, kw, mesh,
                                              tw, tlen, pw, plen)
        else:
            def run():
                return M.align_batch_on_mesh(cfg, maxw, mesh,
                                             text, tlen, pattern, plen)

        np.asarray(run().edit_distance)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            res = run()
            np.asarray(res.edit_distance)  # sync (block_until_ready can
            # return early on tunneled plugins)
        dt = (time.perf_counter() - t0) / reps
        aps = B / dt
        if base_aps is None:
            base_aps = aps
        eff = aps / (base_aps * n)
        rows.append({"platform": platform, "engine": engine, "devices": n,
                     "batch": B, "read_len": read_len,
                     "aligns_per_second": round(aps, 1),
                     "weak_scaling_efficiency": round(eff, 4)})
        print(f"devices={n} batch={B} {aps:,.0f} aligns/s "
              f"eff={eff:.2%}", file=sys.stderr)
        n *= 2
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--engine", default="xla", choices=["xla", "pallas"])
    p.add_argument("--per_device", type=int, default=1024)
    p.add_argument("--read_len", type=int, default=600)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="profile/scaling.csv")
    args = p.parse_args(argv)
    rows = measure(args.engine, args.per_device, args.read_len, args.reps)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
