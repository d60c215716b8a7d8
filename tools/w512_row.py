"""Record W=512 XLA-fallback throughput (one row past the Pallas fast path).

The Pallas engine's Mosaic compile bound (MAX_SLAB_WORDS) tops out at
W=256; W>=512 rides the XLA engine. The reference sweep stops at 256
(/root/reference/scripts/profile.py:65-82), so this row documents where
our fast path ends and what the fallback costs.
"""
import csv
import os
import sys

# runnable as `python tools/<name>.py` from anywhere: the package lives in
# the repo root, which is the script's parent directory (sys.path gets the
# script dir, not the CWD)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrooge_tpu.api import align_reads, prepare_genome
from scrooge_tpu.config import AlignConfig
from scrooge_tpu.utils.simulate import simulate_dataset


def main() -> None:
    ds = simulate_dataset(genome_len=1_000_000, num_reads=2048,
                          read_len=10_000, accuracy=0.95, seed=7)
    pg = prepare_genome(ds.genome)
    rows = []
    for batch in (2048, 1024, 512):
        try:
            cfg = AlignConfig(W=512, K=512, O=257, backend="xla",
                              batch_tile=batch)
            reads = ds.reads[:batch]
            align_reads(pg, reads, cfg)  # compile + warm
            _, stats = align_reads(pg, reads, cfg, return_stats=True)
            rows.append([512, 257, batch, stats.aligns_per_second])
            print(f"W=512 xla batch={batch}: "
                  f"{stats.aligns_per_second:,.0f} aligns/s")
            break
        except Exception as e:  # noqa: BLE001 — halving ladder on OOM
            print(f"batch={batch} failed: {e}")
    os.makedirs("profile", exist_ok=True)
    with open("profile/w512_xla.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["W", "O", "batch", "aligns/second"])
        w.writerows(rows)


if __name__ == "__main__":
    main()
