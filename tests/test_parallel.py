"""Multi-chip sharding tests.

Runs the graft entry's dryrun in a subprocess with a genuinely multi-device
virtual CPU platform (the axon TPU plugin, when present, pins the in-process
backend to one real chip, so the mesh check needs a clean interpreter).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                        "--xla_llvm_disable_expensive_passes=true")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return env


def test_dryrun_multichip_8_virtual_devices():
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK" in proc.stdout


def test_sharded_matches_single_device():
    """Sharded results must equal single-device results bit-for-bit."""
    code = """
import numpy as np
import jax
import __graft_entry__ as g
from scrooge_tpu.config import AlignConfig
from scrooge_tpu.ops.engine_xla import align_batch
from scrooge_tpu.parallel import make_mesh, align_batch_on_mesh

cfg = AlignConfig(W=16, K=16, O=9)
B = 1024
args = g._example_batch(B, 20, 32, seed=3)
maxw = cfg.max_windows(20)
mesh = make_mesh(8)
sharded = align_batch_on_mesh(cfg, maxw, mesh, *args)
single = align_batch(cfg, maxw, *map(jax.device_put, args))
assert np.array_equal(np.asarray(sharded.edit_distance), np.asarray(single.edit_distance))
assert np.array_equal(np.asarray(sharded.entries), np.asarray(single.entries))
assert np.array_equal(np.asarray(sharded.counts), np.asarray(single.counts))
print('MATCH')
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MATCH" in proc.stdout
