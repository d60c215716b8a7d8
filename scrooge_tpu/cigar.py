"""CIGAR utilities: parsing, semantic validation oracle, affine rescoring.

Ports the *semantics* of the reference test oracle
(/root/reference/src/tests.cu:27-169) and the affine-gap rescoring used for
accuracy comparisons (/root/reference/src/cpu_baseline.cpp:694-725).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List, Tuple

_RUN_RE = re.compile(r"(\d+)([=XIDM])")

VALID_OPS = "=XIDM"


@dataclass
class CigarError(Exception):
    message: str

    def __str__(self):
        return self.message


def parse_cigar(cigar: str) -> List[Tuple[int, str]]:
    """Parse an extended-CIGAR string to (count, op) runs; validates format.

    Mirrors cigarFormatCorrect (tests.cu:27-60): every run must be a
    positive count followed by one of = X I D M, with no other characters.
    """
    runs: List[Tuple[int, str]] = []
    pos = 0
    for match in _RUN_RE.finditer(cigar):
        if match.start() != pos:
            raise CigarError(f"CIGAR had bad format at offset {pos}: {cigar!r}")
        count = int(match.group(1))
        if count == 0:
            raise CigarError("CIGAR cannot contain edits with count 0")
        runs.append((count, match.group(2)))
        pos = match.end()
    if pos != len(cigar):
        raise CigarError(f"CIGAR had bad format at offset {pos}: {cigar!r}")
    return runs


def runs_to_cigar(runs: List[Tuple[int, str]]) -> str:
    return "".join(f"{c}{op}" for c, op in runs)


def merge_runs(runs: List[Tuple[int, str]]) -> List[Tuple[int, str]]:
    """Merge adjacent runs of the same op (note: the reference does NOT do
    this across window boundaries; only use for normalized comparisons)."""
    out: List[Tuple[int, str]] = []
    for count, op in runs:
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + count, op)
        else:
            out.append((count, op))
    return out


def _base_equals(a: str, b: str) -> bool:
    """Case-insensitive ACGT comparison (util.cpp:338-361)."""
    return a.upper() == b.upper()


def validate_cigar(
    cigar: str,
    edit_distance: int,
    reference: str,
    read: str,
    start_in_reference: int = 0,
) -> None:
    """Semantic CIGAR oracle; raises CigarError on any violation.

    Port of validateCigarString (tests.cu:106-169):
      1. well-formed runs,
      2. the read is fully and exactly covered; reference stays in bounds,
      3. 'X' and '=' runs verified against the actual sequences,
      4. edits counted from the CIGAR equal the reported edit distance
         ('M' runs count mismatching positions as edits).
    """
    runs = parse_cigar(cigar)

    # bounds / coverage (tests.cu:62-104)
    i = start_in_reference
    j = 0
    for count, op in runs:
        if op == "I":
            j += count
        elif op == "D":
            i += count
        else:
            i += count
            j += count
    if j < len(read):
        raise CigarError("CIGAR didn't cover entire read")
    if j > len(read):
        raise CigarError("CIGAR went out of bounds of read")
    if i > len(reference):
        raise CigarError("CIGAR went out of bounds of reference")

    # semantic check against the sequences (tests.cu:120-161)
    i = start_in_reference
    j = 0
    edits = 0
    for count, op in runs:
        if op == "I":
            j += count
            edits += count
        elif op == "D":
            i += count
            edits += count
        else:
            for _ in range(count):
                if op == "X" and _base_equals(reference[i], read[j]):
                    raise CigarError(
                        f"CIGAR contains 'X' but reference[{i}] and read[{j}] match"
                    )
                if op == "=" and not _base_equals(reference[i], read[j]):
                    raise CigarError(
                        f"CIGAR contains '=' but reference[{i}] and read[{j}] mismatch"
                    )
                if op == "M" and reference[i] != read[j]:
                    edits += 1
                i += 1
                j += 1
            if op == "X":
                edits += count

    if edits != edit_distance:
        raise CigarError(
            f"CIGAR has {edits} edits, while the reported edit distance is "
            f"{edit_distance}"
        )


def is_valid_cigar(cigar: str, edit_distance: int, reference: str, read: str,
                   start_in_reference: int = 0) -> bool:
    try:
        validate_cigar(cigar, edit_distance, reference, read, start_in_reference)
        return True
    except CigarError:
        return False


def affine_score(
    cigar: str,
    match: int = 2,
    mismatch: int = 4,
    gap_open: int = 4,
    gap_extend: int = 2,
) -> int:
    """Affine-gap score of an extended CIGAR.

    Port of get_alignment_score (cpu_baseline.cpp:694-725) with its default
    scoring (2, 4, 4, 2; cpu_baseline.cpp:885): matches add +match per base,
    mismatches subtract mismatch per base, each gap run subtracts
    gap_open + gap_extend*len. Used for accuracy comparison across
    aligners whose CIGARs are not directly comparable.
    """
    score = 0
    for count, op in parse_cigar(cigar):
        if op == "=":
            score += match * count
        elif op == "X":
            score -= mismatch * count
        elif op in ("I", "D"):
            score -= gap_open + gap_extend * count
        else:  # 'M' is ambiguous without sequences; treat as match like ksw2 ext
            score += match * count
    return score


def edits_in_cigar(cigar: str) -> int:
    """Total I+D+X count (assumes extended CIGAR, no ambiguous 'M')."""
    return sum(c for c, op in parse_cigar(cigar) if op in "IDX")


def aligned_pairs(cigar: str, start_in_reference: int = 0) -> Iterator[Tuple[int, int]]:
    """Yield (ref_pos, read_pos) for every aligned (=/X/M) base.

    Used by the accuracy tooling to compute fraction-of-correctly-aligned
    bases against MAF ground truth (plot.py:2724-2952 analogue).
    """
    i = start_in_reference
    j = 0
    for count, op in parse_cigar(cigar):
        if op == "I":
            j += count
        elif op == "D":
            i += count
        else:
            for _ in range(count):
                yield (i, j)
                i += 1
                j += 1
