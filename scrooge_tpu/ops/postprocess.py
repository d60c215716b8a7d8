"""Host-side post-processing: packed run entries -> CIGAR strings.

The device emits per-pair sequences of packed uint16 runs
(op << 12 | count, op in {0:'=', 1:'X', 2:'I', 3:'D'}); this module turns
them into the reference-format extended CIGAR strings (the analogue of
cigarlist_to_cigar, genasm_gpu.cu:881-888 — outside the timed kernel there
as here).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .engine_xla import ENTRY_CNT_MASK, ENTRY_OP_SHIFT

_OPS = np.array(["=", "X", "I", "D"], dtype="U1")

# Precomputed string fragments for every possible packed entry value are
# overkill; counts are small ints so formatted via a lookup of count
# strings (counts < 4096).
_COUNT_STRS = None


def _count_strs():
    global _COUNT_STRS
    if _COUNT_STRS is None:
        _COUNT_STRS = np.array([str(i) for i in range(4096)], dtype="U4")
    return _COUNT_STRS


def entries_to_cigars(entries: np.ndarray, totals: np.ndarray) -> List[str]:
    """entries: (CAP, B) uint16 packed runs; totals: (B,) valid counts."""
    entries = np.asarray(entries)
    totals = np.asarray(totals)
    cap, b = entries.shape
    ops = _OPS[(entries >> ENTRY_OP_SHIFT).astype(np.int32)]
    cnts = _count_strs()[(entries & ENTRY_CNT_MASK).astype(np.int32)]
    # fuse count+op per entry, then join per lane
    frags = np.char.add(cnts, ops)  # (CAP, B) U5
    out = []
    for lane in range(b):
        t = int(totals[lane])
        out.append("".join(frags[:t, lane]))
    return out
