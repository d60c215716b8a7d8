#!/usr/bin/env python3
"""Round-5 kernel A/B: engine-only rate vs tb_cap / batch tile.

The entries store and its accumulation are sized by NE3 = 2*tb_cap+2
(engine_pallas.tb_rows); at the 95%-accuracy headline workload windows
rarely exceed a dozen edits, so a smaller cap halves the kernel's largest
HBM write (and the downstream compaction) at the cost of failing deeper
windows to the escalation ladder. This lab measures the engine-only rate
(kernel_time sampling, 3 groups) across caps and tiles, and counts the
lanes each cap fails (the retry-cost side of the trade).

Run: python tools/r5_kernel_ab.py [--caps 32,24,16] [--tiles 16384,32768]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--caps", default="32,24,16")
    p.add_argument("--tiles", default="16384,32768")
    p.add_argument("--read_len", type=int, default=10_000)
    p.add_argument("--accuracy", type=float, default=0.95)
    p.add_argument("--reps", type=int, default=6)
    args = p.parse_args(argv)

    import numpy as np

    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.profiling.kernel_time import (kernel_rate_samples,
                                                   stage_mapped)
    from scrooge_tpu.utils.simulate import simulate_dataset

    tiles = [int(t) for t in args.tiles.split(",")]
    caps = [int(c) for c in args.caps.split(",")]
    nmax = max(tiles)
    ds = simulate_dataset(genome_len=1_000_000, num_reads=nmax,
                          read_len=args.read_len, accuracy=args.accuracy,
                          seed=7)

    from scrooge_tpu.ops import engine_pallas as ep

    for tile in tiles:
        for cap in caps:
            cfg = AlignConfig(W=64, K=64, O=33, batch_tile=tile,
                              tb_cap_override=cap if cap != 32 else 0)
            staged = stage_mapped(ds.genome.content, ds.reads, cfg)
            if staged is None:
                print(f"tile={tile} cap={cap}: not stageable", flush=True)
                continue
            rates = sorted(kernel_rate_samples(staged, args.reps))
            # failure count at this cap (one extra run, synced)
            res = ep.align_batch_mapped(staged[0], staged[1], staged[2],
                                        staged[3], *staged[4])
            failed = np.asarray(res.failed)
            print(f"tile={tile} cap={cap} sk={staged[2]} kw={staged[3]} "
                  f"rate_med={rates[len(rates)//2]:,.0f} "
                  f"min={rates[0]:,.0f} max={rates[-1]:,.0f} "
                  f"failed={int((failed != 0).sum())}/{tile}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
