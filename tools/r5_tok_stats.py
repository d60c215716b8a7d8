#!/usr/bin/env python3
"""Token-stream statistics at the headline shape: how much of the (B,
capT) readback is padding, and what a sorted-chunk (per-chunk-width)
readback would transfer instead. Drives the round-5 readback-compression
decision (round-3/4 target: <= 25 MB at the headline shape)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main() -> int:
    import numpy as np

    from scrooge_tpu import api
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset

    batch = int(os.environ.get("BENCH_READS", "32768"))
    ds = simulate_dataset(genome_len=1_000_000, num_reads=batch,
                          read_len=10_000, accuracy=0.95, seed=7)
    cfg = AlignConfig(W=64, K=64, O=33, batch_tile=16384)
    api._cap_cache.clear()
    _, stats = api.align_reads(ds.genome, ds.reads, cfg, return_stats=True,
                               return_packed=True)
    key = next(iter(api._cap_cache))
    cap, capT, ne3c, wcap = api._cap_cache[key]
    print(f"caps: runs={cap} tokens={capT} ne3c={ne3c} wcap={wcap}")
    print(f"readback_bytes={stats.readback_bytes/1e6:.1f}MB "
          f"(2 tiles x 16384 x capT)")

    # per-lane token totals from a fresh run's runs: recompute via the
    # packed payload run counts -> token count bound? Use the pipeline's
    # own accounting instead: align once more at tile=batch to get one
    # tile's tok_tot via the slow path
    from scrooge_tpu.ops import tokens as tokens_mod
    from scrooge_tpu.profiling.kernel_time import stage_mapped
    from scrooge_tpu.ops import engine_pallas as ep

    staged = stage_mapped(ds.genome.content, ds.reads,
                          AlignConfig(W=64, K=64, O=33, batch_tile=batch))
    cfgS, maxw, sk, kw, dev, n = staged
    res = ep.align_batch_mapped(cfgS, maxw, sk, kw, *dev)
    toks, totals, tok_tot = tokens_mod.compact_tokenize(
        res.entries, res.counts, cap, True, ne3c)
    tt = np.asarray(tok_tot)
    tt_sorted = np.sort(tt)
    print(f"tok_tot: mean={tt.mean():.0f} p50={np.percentile(tt,50):.0f} "
          f"p99={np.percentile(tt,99):.0f} max={tt.max()}")
    dense = tt.sum()
    for n_chunks in (8, 16, 32, 64):
        cb = -(-batch // n_chunks)
        tot = sum(int(tt_sorted[i:i+cb].max()) * len(tt_sorted[i:i+cb])
                  for i in range(0, batch, cb))
        print(f"sorted-chunk readback x{n_chunks}: {tot/1e6:.1f}MB "
              f"(dense {dense/1e6:.1f}MB, flat {batch*capT/1e6:.1f}MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
