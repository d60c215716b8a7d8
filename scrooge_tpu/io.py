"""File I/O: FASTA/FASTQ/MAF/PAF parsing and seed-location joining.

Python equivalents of /root/reference/src/util.cpp with the same observable
semantics (same fields populated, same coordinate transforms, same join
behavior), vectorized where it matters:

 - read_fasta / read_genome: util.cpp:45-108 (multi-chromosome concatenation
   with a description -> global-offset map).
 - read_fastq: util.cpp:110-157. Like the reference, descriptions drop
   spaces and CRs (the seed join matches on this stripped form). Unlike the
   reference's scan-for-'@' (which can mis-sync on quality lines that begin
   with '@'), this parser consumes proper 4-line records.
 - read_maf: util.cpp:178-234. MAF 'a' blocks; the 's ref' line gives the
   chromosome-local start, the other 's' line gives read description,
   strand, and aligned-region offset/size. (The reference also computes a
   per-location edit distance it never uses — util.cpp:223-229 — omitted.)
 - read_paf: util.cpp:236-276.
 - left_extend_locations: util.cpp:284-290 (shift candidate start left so
   the alignment can start at read position 0).
 - get_global_seeds: util.cpp:292-301 (chromosome -> global coordinates;
   single-chromosome genomes use the chromosome-local start directly).
 - read_fastq_and_seed_locations: util.cpp:303-336 (join by description;
   unknown read descriptions raise instead of exit(1)).

Native C++ FASTA/FASTQ parsers exist too (native/io_parsers.cpp, the
reference's C++ I/O role), byte-identical to the parsers below
(tests/test_native.py) and opt-in via SCROOGE_NATIVE_IO=1. They are NOT
the default on purpose, with measurements: the raw native scan runs at
~1 GB/s, but CPython's readline loop already parses at 0.1-0.8 GB/s and
the List[Read]/List[Sequence] object contract dominates wall time either
way (~2.6 us/record), so the native path ties at best on this contract
(60 MB, 190k 150 bp reads: python 0.55 s vs native 0.62 s end-to-end).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence as Seq

from .datamodel import CandidateLocation, Genome, Read, Sequence


def _native_io_enabled() -> bool:
    return os.environ.get("SCROOGE_NATIVE_IO", "0") == "1"


def read_fasta(path: str | os.PathLike) -> List[Sequence]:
    if _native_io_enabled():
        from . import native

        out = native.parse_fasta(path)
        if out is not None:
            return out
    sequences: List[Sequence] = []
    desc: Optional[str] = None
    parts: List[str] = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if line.startswith(">"):
                if desc is not None:
                    sequences.append(Sequence(desc, "".join(parts)))
                desc = line[1:]
                parts = []
            elif desc is not None:
                parts.append(line.replace(" ", ""))
    if desc is not None:
        sequences.append(Sequence(desc, "".join(parts)))
    return sequences


def read_genome(path: str | os.PathLike) -> Genome:
    genome = Genome()
    offset = 0
    content: List[str] = []
    for chrom in read_fasta(path):
        genome.chromosome_starts[chrom.description] = offset
        content.append(chrom.content)
        offset += len(chrom.content)
    genome.content = "".join(content)
    return genome


def read_fastq(path: str | os.PathLike) -> List[Read]:
    if _native_io_enabled():
        from . import native

        out = native.parse_fastq(path)
        if out is not None:
            return out
    reads: List[Read] = []
    with open(path, "r") as f:
        while True:
            header = f.readline()
            if not header:
                break
            header = header.strip()
            if not header.startswith("@"):
                continue
            content = f.readline().strip()
            plus = f.readline()
            if plus.startswith("+"):
                f.readline()  # quality line
            desc = header[1:].replace(" ", "").replace("\r", "")
            reads.append(Read(description=desc, content=content))
    return reads


def read_maf(path: str | os.PathLike) -> List[CandidateLocation]:
    locations: List[CandidateLocation] = []
    with open(path, "r") as f:
        lines = f.read().splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        i += 1
        if not line or line[0] != "a":
            continue
        loc = CandidateLocation()
        while i < n:
            line = lines[i]
            i += 1
            if not line.strip():
                break
            if line[0] != "s":
                continue
            fields = line[1:].split()
            src, start, size, strand = (fields[0], int(fields[1]),
                                        int(fields[2]), fields[3])
            if src == "ref":
                loc.start_in_chromosome = start
                loc.chromosome = "ref"
            else:
                loc.read_description = src
                loc.strand = strand == "+"
                loc.start_of_aligned_region = start
                loc.size_of_aligned_region = size
        locations.append(loc)
    return locations


def read_paf(path: str | os.PathLike) -> List[CandidateLocation]:
    locations: List[CandidateLocation] = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if not line:
                continue
            fields = line.split("\t")
            loc = CandidateLocation(
                read_description=fields[0],
                chromosome=fields[5],
                start_in_chromosome=int(fields[7]),
                strand=fields[4] == "+",
                start_of_aligned_region=int(fields[2]),
                size_of_aligned_region=int(fields[3]) - int(fields[2]),
            )
            locations.append(loc)
    return locations


def left_extend_locations(locations: Seq[CandidateLocation]) -> None:
    for loc in locations:
        loc.start_in_chromosome = max(
            0, loc.start_in_chromosome - loc.start_of_aligned_region)
        loc.size_of_aligned_region += loc.start_of_aligned_region
        loc.start_of_aligned_region = 0


def get_global_seeds(genome: Genome,
                     locations: Seq[CandidateLocation]) -> None:
    multi = len(genome.chromosome_starts) > 1
    for loc in locations:
        if multi:
            loc.start_in_reference = (
                genome.chromosome_starts.get(loc.chromosome, 0)
                + loc.start_in_chromosome)
        else:
            loc.start_in_reference = loc.start_in_chromosome


def read_fastq_and_seed_locations(
    genome: Genome,
    fastq_path: str | os.PathLike,
    seed_path: str | os.PathLike,
) -> List[Read]:
    seed_path_s = str(seed_path)
    if seed_path_s.endswith(".paf"):
        locations = read_paf(seed_path)
    elif seed_path_s.endswith(".maf"):
        locations = read_maf(seed_path)
    else:
        raise ValueError(f"unknown seed file ending: {seed_path_s}")
    left_extend_locations(locations)
    get_global_seeds(genome, locations)

    reads = read_fastq(fastq_path)
    desc_to_idx: Dict[str, int] = {
        r.description: i for i, r in enumerate(reads)}
    for loc in locations:
        idx = desc_to_idx.get(loc.read_description)
        if idx is None:
            raise ValueError(
                f'candidate location specified unknown read '
                f'"{loc.read_description}"')
        reads[idx].locations.append(loc)
    return reads


def load_dataset(dataset_dir: str | os.PathLike):
    """Load the reference's dataset layout contract
    (profile.py:650,675-695): ``<dir>/{reference.fasta, reads.fastq,
    candidates.maf|paf}`` -> (Genome, reads-with-locations)."""
    ref = os.path.join(dataset_dir, "reference.fasta")
    fastq = os.path.join(dataset_dir, "reads.fastq")
    genome = read_genome(ref)
    for ext in ("maf", "paf"):
        seeds = os.path.join(dataset_dir, f"candidates.{ext}")
        if os.path.exists(seeds):
            return genome, read_fastq_and_seed_locations(genome, fastq, seeds)
    raise FileNotFoundError(f"no candidates.maf/.paf in {dataset_dir}")
