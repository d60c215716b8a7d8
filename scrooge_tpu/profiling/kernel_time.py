"""Kernel-only timing: the device engine alone, like the reference times.

The reference's sweep metric is the core kernel section
(genasm_kernel<<<>>> with one sync, genasm_gpu.cu:939-951 /
scripts/profile.py:55-63). The api's ``core_ns`` is pipeline accounting —
on the predicted-cap fast path it spans engine AND compaction dispatch up
to the single fused meta readback (there is deliberately no intermediate
sync to split them), so configs with many windows (small W, large O)
absorb their compaction compute into "core" and under-read by up to 20x.
This module stages a batch once and times ONLY engine invocations, one
completion force for N reps — the apples-to-apples number for sweep rows,
bench headlines, and comparison against the reference metric.
"""

from __future__ import annotations

import time

import numpy as np


def stage_mapped(genome_content: str, reads, cfg):
    """Stage a read-mapping batch on device for engine-only timing.

    reads: datamodel.Read list, each with exactly one candidate location.
    Returns an opaque tuple for kernel_rate, or None when the shape is
    not the Pallas single-location shape (caller falls back to api-level
    accounting)."""
    import jax
    import jax.numpy as jnp

    from .. import native
    from ..api import _bucket_lin, _resolve_backend
    from ..ops import engine_pallas  # noqa: F401 (backend probe)

    engine, sk, kw, cfg = _resolve_backend(cfg, cfg.batch_tile)
    if engine != "pallas":
        return None
    reads = reads[: cfg.batch_tile]
    if not reads or len(reads) < cfg.batch_tile or any(
            len(r.locations) != 1 for r in reads):
        return None
    glen = len(genome_content)
    P = _bucket_lin(max(len(r.content) for r in reads), 1024)
    pat = native.encode_pack_strs([r.content for r in reads], P)
    if pat is None:
        return None
    gw = native.encode_pack_strs([genome_content],
                                 _bucket_lin(glen, 1 << 22))[0]
    starts = np.array([r.locations[0].start_in_reference for r in reads],
                      np.uint32)
    longest = max(len(r.content) for r in reads)
    maxw = -(-cfg.max_windows(longest) // 32) * 32  # same bound as api
    tlen = np.minimum(glen - starts.astype(np.int64),
                      maxw * cfg.tb_limit + cfg.W).astype(np.int32)
    plen = np.array([len(r.content) for r in reads], np.int32)
    dev = [jax.device_put(x) for x in (gw, starts, tlen, pat, plen)]
    np.asarray(jnp.ravel(dev[3])[:1])  # drain transfers
    return (cfg, maxw, sk, kw, dev, len(reads))


def kernel_rate_samples(staged, reps: int = 4, groups: int = 3):
    """Per-group engine-only rates: `groups` independently synced groups
    of `reps` invocations each (one completion force per group, which
    amortizes the host<->device roundtrip exactly as the reference's
    single sync amortizes over its batch).

    Returning the group rates instead of one number is what makes
    cross-round deltas interpretable: round-4 same-engine runs spread
    155-213k aligns/s on the tunneled rig with no recorded error bar.
    Callers record min/median/max of these."""
    from ..ops import engine_pallas

    cfg, maxw, sk, kw, dev, n = staged

    def run():
        return engine_pallas.align_batch_mapped(cfg, maxw, sk, kw, *dev)

    np.asarray(run().edit_distance[:1])  # compile + warm
    rates = []
    for _ in range(max(groups, 1)):
        t0 = time.perf_counter()
        res = None
        for _ in range(reps):
            res = run()
        np.asarray(res.edit_distance[:1])  # one completion force per group
        rates.append(reps * n / (time.perf_counter() - t0))
    return rates


def kernel_rate(staged, reps: int = 4):
    """Median engine-only aligns/second over 3 sample groups (see
    kernel_rate_samples)."""
    return float(np.median(kernel_rate_samples(staged, reps)))
