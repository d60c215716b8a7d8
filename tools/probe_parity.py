"""On-device engine parity check: Pallas kernel vs XLA engine, real TPU.

The CPU test suite runs the Pallas kernel in interpreter mode; this checks
the MOSAIC-COMPILED kernel produces bit-identical CIGARs/distances on the
actual chip (the r2 hardware-validation step, repeated after every kernel
change). Exits nonzero on any mismatch.

Run: python tools/probe_parity.py [--pairs 2048] [--read_len 2000]
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--pairs", type=int, default=2048)
    p.add_argument("--read_len", type=int, default=2000)
    p.add_argument("--accuracy", type=float, default=0.92)
    p.add_argument("--W", type=int, default=64)
    p.add_argument("--O", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from scrooge_tpu import api
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset

    print(f"platform: {jax.default_backend()}", file=sys.stderr)
    ds = simulate_dataset(genome_len=300_000, num_reads=args.pairs,
                          read_len=args.read_len, accuracy=args.accuracy,
                          seed=13)
    tile = min(args.pairs, 8192)
    W = args.W
    O = args.O or (W // 2 + 1)
    pal = api.align_reads(ds.genome, ds.reads,
                          AlignConfig(W=W, K=W, O=O, backend="pallas",
                                      batch_tile=tile))
    xla = api.align_reads(ds.genome, ds.reads,
                          AlignConfig(W=W, K=W, O=O, backend="xla",
                                      batch_tile=tile))
    bad = 0
    for i, (a, b) in enumerate(zip(pal, xla)):
        if (a.edit_distance, a.cigar) != (b.edit_distance, b.cigar):
            bad += 1
            if bad <= 3:
                print(f"MISMATCH pair {i}: pallas=({a.edit_distance},"
                      f"{a.cigar[:60]}...) xla=({b.edit_distance},"
                      f"{b.cigar[:60]}...)", file=sys.stderr)
    print(f"parity: {args.pairs - bad}/{args.pairs} identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
