"""Why does return_packed trail the string path at the long-read
end-to-end point despite doing strictly less work? Times both modes
back-to-back with GC isolation and prints (a) the AlignStats breakdown,
(b) a wall-segment split of align_reads' phases via a monkeypatched
_consume_tokens, and (c) cProfile top-20 cumulative for each mode.

Run on the TPU rig: python tools/probe_packed.py [reads] [read_len]
"""

import cProfile
import gc
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

    from scrooge_tpu.api import align_reads
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset

    cfg = AlignConfig(W=64, K=64, O=33, early_termination=True,
                      batch_tile=n)
    ds = simulate_dataset(genome_len=1_000_000, num_reads=n, read_len=L,
                          accuracy=0.95, seed=7)
    align_reads(ds.genome, ds.reads, cfg)  # warm

    for mode in ("strings", "packed", "strings", "packed"):
        packed = mode == "packed"
        gc.collect()
        t0 = time.perf_counter()
        out, stats = align_reads(ds.genome, ds.reads, cfg,
                                 return_stats=True, return_packed=packed)
        w = time.perf_counter() - t0
        print(f"== {mode}: wall={w:.3f}s ({n/w:,.0f} aligns/s)")
        print(f"   {stats.breakdown()}")
        del out

    for mode in ("strings", "packed"):
        packed = mode == "packed"
        gc.collect()
        pr = cProfile.Profile()
        pr.enable()
        out = align_reads(ds.genome, ds.reads, cfg, return_packed=packed)
        pr.disable()
        del out
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
        body = "\n".join(l for l in s.getvalue().splitlines()
                         if "/" in l or "ncalls" in l)
        print(f"== cProfile {mode}:\n{body}")


if __name__ == "__main__":
    main()
