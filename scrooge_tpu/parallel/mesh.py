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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AlignConfig
from ..ops import engine_xla

PAIR_AXIS = "pairs"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the first ``num_devices``) local devices."""
    if devices is None:
        devices = jax.devices()
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
