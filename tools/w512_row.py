"""Record W=512 XLA-fallback throughput (one row past the Pallas fast path).

The Pallas engine's Mosaic compile bound (MAX_SLAB_WORDS) tops out at
W=256; W>=512 rides the XLA engine. The reference sweep stops at 256
(/root/reference/scripts/profile.py:65-82), so this row documents where
our fast path ends and what the fallback costs.

Each ladder attempt runs in a SUBPROCESS: the XLA fallback on long reads
can exceed the tunneled TPU worker's execution watchdog, and a crashed
worker poisons the whole client process — the parent must survive to try
the next (smaller) batch.
"""
import csv
import json
import os
import subprocess
import sys

# runnable as `python tools/<name>.py` from anywhere: the package lives in
# the repo root, which is the script's parent directory (sys.path gets the
# script dir, not the CWD)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def worker(batch: int) -> int:
    from scrooge_tpu.api import align_reads, prepare_genome
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset

    ds = simulate_dataset(genome_len=1_000_000, num_reads=batch,
                          read_len=10_000, accuracy=0.95, seed=7)
    pg = prepare_genome(ds.genome)
    cfg = AlignConfig(W=512, K=512, O=257, backend="xla", batch_tile=batch)
    align_reads(pg, ds.reads, cfg)  # compile + warm
    _, stats = align_reads(pg, ds.reads, cfg, return_stats=True)
    print(json.dumps({"W": 512, "O": 257, "batch": batch,
                      "aligns_per_second": stats.aligns_per_second}))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker(int(sys.argv[2]))
    rows = []
    for batch in (1024, 512, 256):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(batch)],
            capture_output=True, text=True, timeout=3600)
        if proc.returncode:
            print(f"batch={batch} failed:\n{proc.stderr[-800:]}",
                  file=sys.stderr)
            import time
            time.sleep(60)  # give a crashed TPU worker time to restart
            continue
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"W=512 xla batch={batch}: "
              f"{row['aligns_per_second']:,.0f} aligns/s")
        rows.append([row["W"], row["O"], row["batch"],
                     row["aligns_per_second"]])
        break
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "profile", "w512_xla.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["W", "O", "batch", "aligns/second"])
        w.writerows(rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
