"""Data model: Python equivalents of the reference's core types.

Mirrors /root/reference/src/util.hpp:11-46 (Sequence_t, Genome_t,
CandidateLocation_t, Read_t, Alignment_t).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class Sequence:
    description: str
    content: str


@dataclass
class Genome:
    """Concatenated multi-chromosome reference (util.hpp:16-19).

    ``chromosome_starts`` maps chromosome description -> offset of that
    chromosome within ``content`` (util.cpp:96-108).
    """

    content: str = ""
    chromosome_starts: Dict[str, int] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.content)


@dataclass
class CandidateLocation:
    """A seed hit: where a read may align in the reference (util.hpp:22-30)."""

    read_description: str = ""
    chromosome: str = ""
    start_in_chromosome: int = 0
    start_in_reference: int = 0
    start_of_aligned_region: int = 0
    size_of_aligned_region: int = 0
    strand: bool = True


@dataclass
class Read:
    description: str
    content: str
    locations: List[CandidateLocation] = field(default_factory=list)


@dataclass
class Alignment:
    """Result type (util.hpp:38-41): extended CIGAR + semiglobal edit distance."""

    cigar: str
    edit_distance: int
