#!/usr/bin/env python3
"""Kernel ablation table at the headline shape (the roofline/ablation role
of the reference's plot.py:2338-2476 analysis).

Each kernel section can be run TWICE per window (engine_pallas._ABLATE:
"pm2" = pattern unpack + bitmask build, "fill2" = DP fill, "tb2" =
traceback); bench(doubled-X) - bench(base) isolates section X's cost under
real control flow. _ABLATE is read at import time, so every variant runs
in a fresh subprocess.

Usage:
  python tools/ablate_run.py [--batch 32768] [--read_len 10000]
      [--out profile/ablation.csv]
  python tools/ablate_run.py --worker        # internal (one variant)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

# runnable as `python tools/<name>.py` from anywhere: the package lives in
# the repo root, which is the script's parent directory (sys.path gets the
# script dir, not the CWD)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import subprocess
import sys
import time

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

VARIANTS = ["", "pm2", "fill2", "tb2"]


def worker(batch: int, read_len: int) -> int:
    """Time the Pallas engine (kernel only, genome-mapped path) at the
    headline shape under the current SCROOGE_ABLATE value."""
    import numpy as np

    from scrooge_tpu.api import encode_np
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.ops import engine_pallas as ep
    from scrooge_tpu.utils.simulate import simulate_dataset
    import jax

    cfg = AlignConfig(W=64, K=64, O=33, batch_tile=batch)
    ds = simulate_dataset(genome_len=1_000_000, num_reads=batch,
                          read_len=read_len, accuracy=0.95, seed=7)
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
    args = [jax.device_put(x) for x in (starts, tlen, pwords, plen)]
    sk, kw = ep.choose_kernel_shape(cfg, batch // 128)

    def run():
        r = ep.align_batch_mapped(cfg, maxw, sk, kw, gwords, *args)
        np.asarray(r.edit_distance)  # real sync on tunneled plugins

    run()  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"variant": os.environ.get("SCROOGE_ABLATE", ""),
                      "sk": sk, "kw": kw, "batch": batch,
                      "seconds_per_batch": round(dt, 4),
                      "aligns_per_second": round(batch / dt, 1)}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=32_768)
    p.add_argument("--read_len", type=int, default=10_000)
    p.add_argument("--out", default="profile/ablation.csv")
    p.add_argument("--worker", action="store_true")
    args = p.parse_args(argv)
    if args.worker:
        return worker(args.batch, args.read_len)

    rows = []
    base = None
    for variant in VARIANTS:
        env = dict(os.environ, SCROOGE_ABLATE=variant)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--batch", str(args.batch), "--read_len", str(args.read_len)],
            env=env, capture_output=True, text=True, timeout=3600)
        if proc.returncode:
            print(f"variant {variant!r} failed:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        if variant == "":
            base = row["seconds_per_batch"]
        # doubled-section minus base = the section's own cost
        row["section_seconds"] = (round(row["seconds_per_batch"] - base, 4)
                                  if variant and base else 0.0)
        row["section_share"] = (round(row["section_seconds"] / base, 4)
                                if variant and base else 0.0)
        rows.append(row)
        print(f"{variant or 'base':6s} {row['seconds_per_batch']:.3f}s/batch"
              f" section={row['section_seconds']:.3f}s", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
