"""XLA workarounds applied at import time (before backend init).

XLA:CPU's LLVM pipeline exhibits a pathological superlinear blowup
(minutes per kernel) compiling this engine's nested while/fori loops over
multi-dim uint32 arrays; ``--xla_llvm_disable_expensive_passes=true``
reduces a ~290s compile to ~4s with no measurable runtime difference.
The flag only affects the CPU LLVM pipeline — TPU (Mosaic) compilation is
untouched — so it is safe to set unconditionally.
"""

import os


def apply():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_llvm_disable_expensive_passes" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_llvm_disable_expensive_passes=true"
        ).strip()
