"""Multi-chip scaling: data parallelism over alignment pairs on a mesh.

The reference has no distributed backend at all — one process, one GPU
(genasm_gpu.cu:67), OpenMP threads on CPU (genasm_cpu.cpp:440-460). The
TPU-native scaling story replaces both concurrency axes with SPMD over a
``jax.sharding.Mesh``:

 - axis ``pairs``: alignment pairs are embarrassingly parallel, so the
   batch dimension is sharded across every chip (the analogue of OpenMP's
   dynamic pair scheduling and the GPU's persistent-block work queue —
   load balance comes from length-sorted batching instead of work
   stealing, cf. tests.cu:375-377).
 - the reference genome is *replicated* to every chip (a packed human
   genome is ~0.75 GiB of uint8 codes — comfortably within HBM), so window
   gathers are chip-local and the steady state needs **zero collectives**;
   the only cross-chip traffic is the batched early-termination reduction
   (one bool all-reduce per DP row) and result gathering.

Works identically on real TPU meshes and on the virtual CPU mesh used in
tests (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AlignConfig
from ..ops import engine_xla

try:  # jax >= 0.6 exposes shard_map at the top level
    _shard_map = jax.shard_map
    _CHECK_KW = "check_vma"
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"  # the pre-0.6 name of the same knob


def shard_map(fn, *, mesh, in_specs, out_specs, check_vma=True):
    return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **{_CHECK_KW: check_vma})

PAIR_AXIS = "pairs"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the first ``num_devices``) local devices.

    LOCAL devices deliberately: in a multi-process (jax.distributed) run
    each process feeds its own host-local batch shard (parallel/
    distributed.py owns the cross-process split), so a mesh spanning
    other processes' non-addressable devices could never receive the
    device_puts the tile loops perform."""
    if devices is None:
        devices = jax.local_devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (PAIR_AXIS,))


def pair_sharding(mesh: Mesh, batch_dim: int = 0, ndim: int = 1) -> NamedSharding:
    """Shard dimension ``batch_dim`` of an ndim-rank array over pairs."""
    spec = [None] * ndim
    spec[batch_dim] = PAIR_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _check_batch(B: int, mesh: Mesh):
    n = mesh.devices.size
    if B % (128 * n) != 0:
        raise ValueError(
            f"batch {B} must be a multiple of 128 lanes x {n} devices")


def align_batch_on_mesh(cfg: AlignConfig, max_windows: int, mesh: Mesh,
                        text, text_len, pattern, pattern_len):
    """Sharded unstructured alignment: every input batch-sharded over pairs.

    Placement-driven: inputs are device_put with pair shardings and the
    jitted engine compiles an SPMD program around them. Per-pair work is
    chip-local; XLA inserts only the ET all-reduce.
    """
    _check_batch(pattern.shape[0], mesh)
    sh2 = pair_sharding(mesh, 0, 2)
    sh1 = pair_sharding(mesh, 0, 1)
    text = jax.device_put(text, sh2)
    text_len = jax.device_put(text_len, sh1)
    pattern = jax.device_put(pattern, sh2)
    pattern_len = jax.device_put(pattern_len, sh1)
    with mesh:
        return engine_xla.align_batch(
            cfg, max_windows, text, text_len, pattern, pattern_len)


def align_batch_mapped_on_mesh(cfg: AlignConfig, max_windows: int, mesh: Mesh,
                               genome, starts, text_len,
                               pattern, pattern_len):
    """Sharded read-mapping alignment: genome replicated, pairs sharded."""
    _check_batch(pattern.shape[0], mesh)
    sh2 = pair_sharding(mesh, 0, 2)
    sh1 = pair_sharding(mesh, 0, 1)
    genome = jax.device_put(genome, replicated(mesh))
    starts = jax.device_put(starts, sh1)
    text_len = jax.device_put(text_len, sh1)
    pattern = jax.device_put(pattern, sh2)
    pattern_len = jax.device_put(pattern_len, sh1)
    with mesh:
        return engine_xla.align_batch_mapped(
            cfg, max_windows, genome, starts, text_len, pattern, pattern_len)


# ---------------------------------------------------------------------------
# Pallas engine on the mesh (the performance path).
#
# The fused window kernel is a custom call XLA cannot auto-partition, so the
# mesh integration is shard_map over the pairs axis: each device runs the
# full slab scan + kernel on its local lane tiles. Every cross-lane
# operation inside the engine (the slab-base min/max, the batched
# early-termination all, the compaction cap arithmetic) becomes SHARD-LOCAL
# under shard_map — which is exactly the semantics we want: per-device slab
# bases track only local lanes, per-device slab loops exit early
# independently, and the steady state needs ZERO collectives
# (test_parallel.py asserts the compiled HLO has none). This is the
# dispatch role of the reference GPU's persistent-block work queue
# (genasm_gpu.cu:583-629): static sharding + length-sorted batching
# replaces device-side work stealing.
# ---------------------------------------------------------------------------

_RESULT_SPECS = engine_xla.BatchResult(
    edit_distance=P(PAIR_AXIS),
    failed=P(PAIR_AXIS),
    entries=P(None, None, PAIR_AXIS),
    counts=P(None, PAIR_AXIS),
)


@functools.lru_cache(maxsize=64)
def _pallas_sharded_fn(cfg: AlignConfig, max_windows: int, sk: int, kw: int,
                       mesh: Mesh, mapped: bool):
    from ..ops import engine_pallas

    if mapped:
        in_specs = (P(), P(PAIR_AXIS), P(PAIR_AXIS),
                    P(PAIR_AXIS, None), P(PAIR_AXIS))

        def fn(genome, starts, text_len, pattern, pattern_len):
            return engine_pallas.align_batch_mapped(
                cfg, max_windows, sk, kw, genome, starts, text_len,
                pattern, pattern_len)
    else:
        in_specs = (P(PAIR_AXIS, None), P(PAIR_AXIS),
                    P(PAIR_AXIS, None), P(PAIR_AXIS))

        def fn(text, text_len, pattern, pattern_len):
            return engine_pallas.align_batch(
                cfg, max_windows, sk, kw, text, text_len,
                pattern, pattern_len)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata, and the engine is purely per-lane anyway
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=_RESULT_SPECS, check_vma=False))


def pallas_align_on_mesh(cfg: AlignConfig, max_windows: int, sk: int,
                         kw: int, mesh: Mesh, text_words, text_len,
                         pattern_words, pattern_len):
    """Sharded Pallas-engine unstructured alignment. sk must tile the
    PER-DEVICE sublane count (use choose_kernel_shape on S // n_devices)."""
    _check_batch(pattern_words.shape[0], mesh)
    sh2 = pair_sharding(mesh, 0, 2)
    sh1 = pair_sharding(mesh, 0, 1)
    args = (jax.device_put(text_words, sh2),
            jax.device_put(text_len, sh1),
            jax.device_put(pattern_words, sh2),
            jax.device_put(pattern_len, sh1))
    return _pallas_sharded_fn(cfg, max_windows, sk, kw, mesh, False)(*args)


def pallas_align_mapped_on_mesh(cfg: AlignConfig, max_windows: int, sk: int,
                                kw: int, mesh: Mesh, genome_words, starts,
                                text_len, pattern_words, pattern_len):
    """Sharded Pallas-engine read-mapping: packed genome replicated in
    every device's HBM (SURVEY §5: a packed human genome is ~0.75 GiB),
    pairs sharded, per-pair segment gathers device-local."""
    _check_batch(pattern_words.shape[0], mesh)
    sh2 = pair_sharding(mesh, 0, 2)
    sh1 = pair_sharding(mesh, 0, 1)
    args = (jax.device_put(genome_words, replicated(mesh)),
            jax.device_put(starts, sh1),
            jax.device_put(text_len, sh1),
            jax.device_put(pattern_words, sh2),
            jax.device_put(pattern_len, sh1))
    return _pallas_sharded_fn(cfg, max_windows, sk, kw, mesh, True)(*args)


@functools.lru_cache(maxsize=64)
def _compact_sharded_fn(mesh: Mesh, cap: int, u8: bool, sparse: bool):
    from ..ops import engine_pallas, engine_xla as ex

    if sparse:
        inner = (engine_pallas.compact_entries_sparse_u8 if u8
                 else engine_pallas.compact_entries_sparse)
    else:
        inner = ex.compact_entries_u8 if u8 else ex.compact_entries

    def fn(entries, counts):
        return inner(entries, counts, cap)

    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, PAIR_AXIS), P(None, PAIR_AXIS)),
        out_specs=(P(None, PAIR_AXIS), P(PAIR_AXIS)), check_vma=False))


def compact_on_mesh(mesh: Mesh, entries, counts, cap: int, u8: bool,
                    sparse: bool):
    """Device-local CIGAR-run compaction of sharded engine output (the
    flat-index binary searches must not become cross-device gathers)."""
    return _compact_sharded_fn(mesh, cap, u8, sparse)(entries, counts)
