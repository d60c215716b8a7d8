"""Headline benchmark: long-read alignment throughput (aligns/second).

Workload mirrors the reference's headline GPU benchmark (README.md:103-108):
PBSIM2-style long reads (10 kbp, 95% accuracy) aligned against a reference
genome at the representative config W=64, O=33, K=64 (plot.py:1277-1291).
Baseline: 25,004 aligns/second — the reference CUDA kernel's example
throughput on an RTX 3060 (kernel-only, as here: core_ns excludes host
pre/post-processing, matching the reference's core_algorithm_ns split).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compilation cache: first-ever run compiles (~2min), later
# runs start hot (must be set before jax import)
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

BASELINE_ALIGNS_PER_S = 25_004.0
# enough invocations to amortize the tunnel's ~50-90ms completion-force
# roundtrip out of the kernel-only split (2 reps leave ~15% of RTT in it)
KERNEL_REPS = 6


def _staged_pass(staged):
    """End-to-end-from-device pass: the FULL result pipeline (engine ->
    compaction -> tokenized d2h readback -> host CIGAR formatting) with
    the inputs already device-resident — what end-to-end becomes when the
    rig's tunnel-bound h2d upload (~40 MB/s here vs >10 GB/s PCIe) is
    taken off the clock. The d2h readback still rides the tunnel, so this
    is a conservative proxy for production-interconnect end-to-end.
    Returns (strings_rate, packed_rate)."""
    from scrooge_tpu import api as api_mod
    from scrooge_tpu.ops import engine_pallas

    cfg, maxw, sk, kw, dev, n = staged

    def run_full(packed, stats=None):
        stats = stats or api_mod.AlignStats(num_pairs=n)
        tns = time.perf_counter_ns()
        res = engine_pallas.align_batch_mapped(cfg, maxw, sk, kw, *dev)
        eds, payload, failed = api_mod._build_alignments(
            cfg, res, stats, sparse_rows=True, packed_out=packed, tns=tns)
        return payload

    import gc

    rates = []
    for packed in (False, True):
        gc.collect()
        run_full(packed)  # warm: compile + cap-cache fill
        best = 0.0
        stats = None
        for _ in range(2):  # best of 2: one-off tunnel stalls (observed
            s = api_mod.AlignStats(num_pairs=n)  # ~15 s) otherwise record
            t0 = time.perf_counter()  # a nonsense staged rate
            payload = run_full(packed, s)
            r = n / (time.perf_counter() - t0)
            if r > best:
                best, stats = r, s
        rates.append(best)
        assert len(payload) == n or len(payload) == 2  # strings | (flat, offs)
        print(f"# staged[{'packed' if packed else 'strings'}]: "
              f"{stats.breakdown()}", file=sys.stderr)
    return rates[0], rates[1]


def main():
    num_reads = int(os.environ.get("BENCH_READS", "32768"))
    read_len = int(os.environ.get("BENCH_READ_LEN", "10000"))
    genome_len = int(os.environ.get("BENCH_GENOME", "1000000"))
    # 0.95 = the PBSIM2 default the reference benchmarks at; ~0.85 models
    # ONT-class error rates (the tb_cap retry-cliff stress level)
    accuracy = float(os.environ.get("BENCH_ACCURACY", "0.95"))

    from scrooge_tpu.api import align_reads
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset

    # BENCH_W/BENCH_O select the window config: default is the reference's
    # representative long-read point (W=64 O=33, plot.py:1277-1291); the
    # short-read point is W=32 O=17 (plot.py:1304-1331).
    W = int(os.environ.get("BENCH_W", "64"))
    # tile 16384 beats 32768 on BOTH the engine-only rate (212.9k vs
    # 192.4k in a same-weather A/B; the batch-sweep family agrees:
    # 207.2k vs 190.5k) and end-to-end (10.5k vs 9.8k) — the halved
    # entries buffer relieves HBM pressure, and two tiles pipeline
    # upload under compute
    # tb_cap operating point (BENCH_TBCAP, 0 = the auto min(K, 32)): on
    # the round-5 pair-packed-result engine the default cap measures
    # FASTEST at the bench tile (247.9k vs 207.3k at cap=16, tile 16384;
    # the pre-packed engine preferred cap=16 — tools/r5_kernel_ab.py), so
    # auto stays the operating point; the knob remains for the tbcap
    # sweep axis and high-error studies.
    tb_cap = int(os.environ.get("BENCH_TBCAP", "0"))
    cfg = AlignConfig(W=W, K=W, O=int(os.environ.get("BENCH_O", str(W // 2 + 1))),
                      early_termination=True,
                      tb_cap_override=tb_cap,
                      batch_tile=int(os.environ.get("BENCH_TILE", "16384")))

    # BENCH_DECOYS > 0 switches to the chained candidate model (extra
    # wrong candidates per read) — the retry-path stress workload
    decoys = float(os.environ.get("BENCH_DECOYS", "0"))
    ds = simulate_dataset(genome_len=genome_len, num_reads=num_reads,
                          read_len=read_len, accuracy=accuracy, seed=7,
                          decoys=decoys)

    # warmup: trace + compile over the FULL dataset (multi-tile runs hit
    # data-dependent compaction-cap buckets per tile; warming only the
    # first tile leaks those compiles into the timed pass), excluded from
    # timing
    align_reads(ds.genome, ds.reads, cfg)

    import gc

    # single-tile pass: the clean kernel-only split (with one tile in
    # flight, core_ns cannot overlap transport) -> the headline metric.
    # Measured 2026-08-19: splitting the batch into 4096-lane tiles to
    # pipeline upload/compute/postprocess is 2.5x SLOWER end-to-end on
    # this rig — the tunnel's per-roundtrip latency (8 tiles x chunked
    # d2h syncs) and per-tile compaction-cap retraces swamp the overlap
    # gains — so one full tile is also the end-to-end operating point.
    #
    # Two alternating rounds per mode, best wall kept: the tunnel's
    # bandwidth drifts minute to minute (measured 8-150 MB/s), and a
    # single strings-then-packed order charges whichever runs during the
    # worse weather — alternation + best-of-2 compares the modes fairly.
    # 3 alternating rounds per mode, best wall kept: the tunnel swings
    # 20-150 MB/s minute to minute and upload+readback dominate the wall,
    # so per-mode minima over 3 samples is what makes the strings/packed
    # comparison mean anything (measured: 6 alternating runs spread
    # 4.5-8.0s with NO mode effect once each mode pays its own GC)
    wall_s = packed_wall_s = float("inf")
    stats = pstats = None
    for _ in range(3):
        gc.collect()  # each mode pays its own garbage: without this the
        t0 = time.perf_counter()  # packed round collects the strings
        results, s_stats = align_reads(ds.genome, ds.reads, cfg,  # round's
                                       return_stats=True)  # ~50MB of strs
        w = time.perf_counter() - t0
        if w < wall_s:
            wall_s, stats = w, s_stats
        n_out = len(results)
        del results
        gc.collect()
        t0 = time.perf_counter()
        packed, p_stats = align_reads(ds.genome, ds.reads, cfg,
                                      return_stats=True, return_packed=True)
        w = time.perf_counter() - t0
        if w < packed_wall_s:
            packed_wall_s, pstats = w, p_stats
        assert len(packed) == s_stats.num_pairs == n_out
        del packed

    # kernel-only pass: the engine called directly (as the reference times
    # genasm_kernel<<<>>> alone, tests.cu:386-407 / genasm_gpu.cu:939-951)
    # with one device sync for REPS invocations — the reference's single
    # sync amortizes over its whole batch the same way. The api-level
    # core_ns includes a per-tile meta readback (~50-90ms of tunnel
    # latency), which is pipeline accounting, not kernel time. Runs AFTER
    # the end-to-end rounds: its staged inputs + entry buffers otherwise
    # sit in HBM through the timed rounds (measured +0.3s of core there).
    from scrooge_tpu.profiling.kernel_time import (kernel_rate_samples,
                                                   stage_mapped)

    # The kernel-only pass runs at ITS best tile, independent of the
    # end-to-end tile: the r5 tile probe (profile/r5_kernel_ab.txt) puts
    # the engine's sweet spot at ~24576 lanes (252-254k vs 248k at
    # 16384), while end-to-end prefers two even 16384 tiles (upload
    # pipelining, no ragged tail). Short reads measured fastest at 32768
    # (r4). The reference likewise times its kernel section at the
    # kernel's own launch shape (genasm_gpu.cu:939-951).
    ktile = int(os.environ.get("BENCH_KERNEL_TILE",
                               "24576" if read_len >= 1000 else "32768"))
    import dataclasses

    kcfg = dataclasses.replace(cfg, batch_tile=min(ktile, num_reads))
    staged = stage_mapped(ds.genome.content, ds.reads, kcfg)
    kernel_samples = (sorted(kernel_rate_samples(staged, KERNEL_REPS))
                      if staged else None)
    # median of 3 independently synced groups: the headline carries an
    # error bar (kernel_aligns_min/max in the JSON) instead of a single
    # weather-dependent draw
    kernel_aligns_per_s = (kernel_samples[len(kernel_samples) // 2]
                           if kernel_samples else None)
    staged_rates = _staged_pass(staged) if staged else None
    staged = None

    # headline = the dedicated kernel-only pass (clean engine boundary);
    # the api-level core rate (includes the per-tile meta-readback
    # latency) is reported alongside
    aligns_per_s = kernel_aligns_per_s or stats.aligns_per_second
    # equivalent giga-cell-updates/s at cells_per_pair = read_len^2, the
    # cross-aligner normalization the reference sweep uses
    # (profile.py:415-434); GenASM itself touches only O(len*W) cells
    gcups = aligns_per_s * read_len * read_len / 1e9
    # measured link rates during THIS run: the tunnel's bandwidth swings
    # ~8-150 MB/s across sessions, so end-to-end numbers are only
    # interpretable next to the rates they were achieved at
    h2d = (stats.upload_bytes / max(stats.upload_ns, 1)) * 1e3
    d2h = (stats.readback_bytes / max(stats.readback_ns, 1)) * 1e3
    print(
        f"# pairs={stats.num_pairs} kernel={aligns_per_s:.1f} aligns/s "
        f"core={stats.core_ns/1e9:.3f}s "
        f"wall={wall_s:.3f}s retried={stats.retried_pairs} "
        f"end_to_end={stats.num_pairs/wall_s:.1f} aligns/s "
        f"end_to_end_packed={stats.num_pairs/packed_wall_s:.1f} aligns/s "
        f"gcups_equiv={gcups:.1f} "
        f"link[h2d={h2d:.0f}MB/s d2h={d2h:.0f}MB/s]",
        file=sys.stderr,
    )
    print(f"# {stats.breakdown()}", file=sys.stderr)
    print(f"# packed: {pstats.breakdown()}", file=sys.stderr)
    # The metric name follows the operating point (the recorded short-read
    # runs previously carried the long-read label); vs_baseline is only
    # meaningful against the reference's long-read RTX-3060 example
    # (README.md:103-108), so it is emitted only at that operating point.
    long_read = read_len >= 1000
    out = {
        "metric": ("long_read" if long_read else "short_read")
                  + "_aligns_per_second",
        "value": round(aligns_per_s, 1),
        "unit": "aligns/s",
        "gcups_equivalent": round(gcups, 2),
        # core rate as the api pipeline accounts it (includes the per-tile
        # meta-readback tunnel latency; the headline value excludes it)
        "api_core_aligns_per_second": round(stats.aligns_per_second, 1),
        "end_to_end_aligns_per_second": round(stats.num_pairs / wall_s, 1),
        "end_to_end_packed_aligns_per_second":
            round(stats.num_pairs / packed_wall_s, 1),
        "link_h2d_mb_s": round(h2d, 1),
        "link_d2h_mb_s": round(d2h, 1),
    }
    if kernel_samples:
        out["kernel_aligns_min"] = round(kernel_samples[0], 1)
        out["kernel_aligns_max"] = round(kernel_samples[-1], 1)
    if staged_rates:
        # full result pipeline with device-resident inputs (see
        # _staged_pass): the end-to-end rate with the rig's tunnel-bound
        # upload off the clock (d2h readback + host formatting included)
        out["staged_aligns_per_second"] = round(staged_rates[0], 1)
        out["staged_packed_aligns_per_second"] = round(staged_rates[1], 1)
        print(f"# staged: strings={staged_rates[0]:.1f} "
              f"packed={staged_rates[1]:.1f} aligns/s", file=sys.stderr)
    if long_read:
        out["vs_baseline"] = round(aligns_per_s / BASELINE_ALIGNS_PER_S, 4)
    print(json.dumps(out))

    # persist the stage breakdown for the pipeline figure
    # (profiling/plots.py pipeline family); best-effort side artifact —
    # the stdout JSON line above is the bench contract
    try:
        import csv as _csv

        pdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile")
        if os.path.isdir(pdir):
            with open(os.path.join(pdir, "pipeline_breakdown.csv"), "w",
                      newline="") as f:
                w = _csv.writer(f)
                w.writerow(["mode", "wall_s", "prep_s", "upload_s",
                            "upload_mb", "core_s", "compact_s",
                            "readback_s", "readback_mb", "format_s",
                            "pairs", "read_len", "h2d_mb_s", "d2h_mb_s"])
                for mode, st, wl in (("strings", stats, wall_s),
                                     ("packed", pstats, packed_wall_s)):
                    w.writerow([
                        mode, round(wl, 3),
                        round(st.prep_ns / 1e9, 3),
                        round(st.upload_ns / 1e9, 3),
                        round(st.upload_bytes / 1e6, 1),
                        round(st.core_ns / 1e9, 3),
                        round(st.compact_ns / 1e9, 3),
                        round(st.readback_ns / 1e9, 3),
                        round(st.readback_bytes / 1e6, 1),
                        round(st.format_ns / 1e9, 3),
                        st.num_pairs, read_len,
                        round(st.upload_bytes / max(st.upload_ns, 1) * 1e3,
                              1),
                        round(st.readback_bytes / max(st.readback_ns, 1)
                              * 1e3, 1)])
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"# pipeline_breakdown.csv not written: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
