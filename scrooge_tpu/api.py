"""Library API: the two align_all interfaces (placeholder, pyref backend).

Will be replaced by the batched device path; kept minimal so the package
imports while the engine is under construction.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from .config import AlignConfig
from .datamodel import Alignment, Genome, Read
from . import pyref


def align_pairs(texts: Sequence[str], queries: Sequence[str],
                config: Optional[AlignConfig] = None) -> List[Alignment]:
    cfg = config or AlignConfig()
    if len(texts) != len(queries):
        raise ValueError("texts and queries must have equal length")
    out = []
    for t, q in zip(texts, queries):
        ed, cigar = pyref.align_pair(t, q, cfg)
        out.append(Alignment(cigar=cigar, edit_distance=ed))
    return out


def align_reads(reference: Genome, reads: Sequence[Read],
                config: Optional[AlignConfig] = None) -> List[Alignment]:
    cfg = config or AlignConfig()
    out = []
    for read in reads:
        for loc in read.locations:
            text = reference.content[loc.start_in_reference:]
            ed, cigar = pyref.align_pair(text, read.content, cfg)
            out.append(Alignment(cigar=cigar, edit_distance=ed))
    return out


def align_all(*args, **kwargs) -> List[Alignment]:
    """Dispatch between the two interfaces by argument types, mirroring the
    reference's overload pair (genasm_cpu.hpp:6-7)."""
    first = args[0] if args else kwargs.get("reference", kwargs.get("texts"))
    if isinstance(first, Genome):
        return align_reads(*args, **kwargs)
    return align_pairs(*args, **kwargs)
