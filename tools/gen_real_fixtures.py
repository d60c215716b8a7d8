"""Generate the committed real-format fixtures (tests/data/real_format/).

The rig is air-gapped, so genuine downloaded datasets (DATASETS.md:45-125)
cannot be fetched; these fixtures reproduce the FORMATS of the real files
byte-faithfully instead — the ingestion path must survive everything the
reference's datasets contain (profile.py:650 layout contract):

 - GRCh38-style FASTA headers with tags, 60-column wrapping, soft-masked
   lowercase regions, leading/internal N runs (telomere/gap style), CRLF
   line endings on one chromosome;
 - SRA/ONT-style FASTQ headers (``@SRR... length=N``), a CRLF record, a
   lowercase read, and a quality line that begins with '@' (the classic
   4-line-parser trap, util.cpp:110-157 mis-syncs on it);
 - PBSIM2-style MAF blocks (``a`` / ``s ref`` / ``s <read>``) including a
   reverse-strand record and nonzero aligned-region offsets
   (left_extend_locations, util.cpp:284-290);
 - minimap2-style PAF rows with mandatory columns + typed tags, against a
   multi-chromosome reference (global-coordinate join,
   util.cpp:292-301).

Deterministic (seeded); rerunning must reproduce the committed bytes.
Reads are genome extracts with injected errors so every kept candidate
aligns with a small edit distance.
"""

from __future__ import annotations

import os
import random

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "real_format")


def wrap(seq: str, width: int, eol: str = "\n") -> str:
    return eol.join(seq[i : i + width] for i in range(0, len(seq), width)) + eol


def rand_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng: random.Random, seq: str, rate: float) -> str:
    """PBSIM2-ish 6:55:39-ratio-free simple mutator (sub/ins/del mix)."""
    out = []
    for c in seq:
        r = rng.random()
        if r < rate * 0.55:  # substitution
            out.append(rng.choice([x for x in "ACGT" if x != c]))
        elif r < rate * 0.8:  # insertion
            out.append(c)
            out.append(rng.choice("ACGT"))
        elif r < rate:  # deletion
            continue
        else:
            out.append(c)
    return "".join(out)


def gen_ont_maf(rng: random.Random):
    d = os.path.join(OUT, "ont_maf")
    os.makedirs(d, exist_ok=True)
    glen = 6000
    genome = rand_seq(rng, glen)
    # soft-mask a region (real FASTA excerpts carry them); content is
    # case-preserved by the parsers and encode accepts lowercase
    genome = genome[:2000] + genome[2000:2400].lower() + genome[2400:]
    hdr = (">chr21  AC:CM000683.2  gi:568336021  LN:6000  "
           "rl:Chromosome  M5:2979a6085bfe28e3ad6f552f361ed74d")
    with open(os.path.join(d, "reference.fasta"), "w", newline="") as f:
        f.write(hdr + "\n" + wrap(genome, 60))

    fastq_recs = []
    maf_blocks = ["##maf version=1 scoring=none", ""]
    for i in range(8):
        start = rng.randrange(0, glen - 1200)
        span = rng.randrange(400, 1000)
        read = mutate(rng, genome[start : start + span].upper(), 0.05)
        # PBSIM2-style: some reads carry unaligned head bases -> nonzero
        # aligned-region offset (left_extend_locations must shift)
        head = rand_seq(rng, rng.choice([0, 0, 0, 7, 13]))
        full = head + read
        # PBSIM2 emits bare single-token read names (@S1_N); the seed join
        # matches candidate names against the space-stripped description
        # (util.cpp:303-336), so joinable records must be single-token
        name = f"S1_{i + 1}"
        qual = "".join(chr(33 + rng.randrange(1, 41)) for _ in full)
        if i == 3:  # quality line beginning with '@' (parser trap)
            qual = "@" + qual[1:]
        eol = "\r\n" if i == 5 else "\n"  # one CRLF record
        seq_out = full.lower() if i == 6 else full  # one lowercase read
        fastq_recs.append(f"@{name}{eol}{seq_out}{eol}+{eol}{qual}{eol}")
        strand = "-" if i == 7 else "+"  # one reverse-strand record
        maf_blocks += [
            "a",
            f"s ref {start:>8} {span:>6} + {glen} "
            + genome[start : start + span].upper(),
            f"s {name} {len(head):>4} {len(read):>6} {strand} {len(full)} "
            + read,
            "",
        ]
    with open(os.path.join(d, "reads.fastq"), "w", newline="") as f:
        f.write("".join(fastq_recs))
    with open(os.path.join(d, "candidates.maf"), "w", newline="") as f:
        f.write("\n".join(maf_blocks))


def gen_ilmn_paf(rng: random.Random):
    d = os.path.join(OUT, "ilmn_paf")
    os.makedirs(d, exist_ok=True)
    # post-GenConverter --prune_titles headers: PAF target names are the
    # first FASTA token, and the global-coordinate join keys on the FULL
    # description (util.cpp:292-301) — the reference's chained datasets
    # are pruned for exactly this reason (rich headers are exercised by
    # the ont_maf + raw_reference fixtures, whose paths never join on
    # chromosome names)
    chroms = [("chr1", 4200), ("chr2", 3000)]
    seqs = {}
    with open(os.path.join(d, "reference.fasta"), "w", newline="") as f:
        for j, (hdr, n) in enumerate(chroms):
            seq = rand_seq(rng, n)
            seqs[hdr] = seq
            # second chromosome written with CRLF + 70-col wrapping
            eol = "\r\n" if j == 1 else "\n"
            f.write(f">{hdr}{eol}" + wrap(seq, 70 if j else 60, eol))
    starts = {hdr: off for hdr, off in
              zip([h for h, _ in chroms], [0, chroms[0][1]])}

    fastq, paf = [], []
    for i in range(10):
        hdr, clen = chroms[i % 2]
        start = rng.randrange(0, clen - 200)
        span = 150
        read = mutate(rng, seqs[hdr][start : start + span], 0.01)
        # post-GenConverter --prune_titles form of SRA headers (the real
        # chained datasets prune before seeding; joins need single tokens)
        name = f"SRR13278681.{i + 1}"
        qual = "".join(chr(33 + rng.randrange(2, 40)) for _ in read)
        fastq.append(f"@{name}\n{read}\n+{name}\n{qual}\n")
        strand = "-" if i == 9 else "+"
        tname = hdr.split()[0]
        paf.append("\t".join(map(str, [
            name, len(read), 0, len(read), strand, tname, clen,
            start, start + span, span - 5, span, 60,
            "tp:A:P", "cm:i:25", "s1:i:140", "dv:f:0.0105", "rl:i:0"])))
    with open(os.path.join(d, "reads.fastq"), "w", newline="") as f:
        f.write("".join(fastq))
    with open(os.path.join(d, "candidates.paf"), "w", newline="") as f:
        f.write("\n".join(paf) + "\n")


def gen_raw_for_convert(rng: random.Random):
    """A raw genome with leading N-run, internal N gap, and a trailing
    clean part — the convert --restrict --genome split fixture."""
    seq = ("N" * 120 + rand_seq(rng, 900) + "N" * 35 + rand_seq(rng, 700))
    hdr = ">chrUn_KI270752v1 unplaced genomic contig, GRCh38 reference"
    with open(os.path.join(OUT, "raw_reference.fasta"), "w", newline="") as f:
        f.write(hdr + "\n" + wrap(seq, 60))


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260820)
    gen_ont_maf(rng)
    gen_ilmn_paf(rng)
    gen_raw_for_convert(rng)
    print(f"fixtures written under {OUT}")


if __name__ == "__main__":
    main()
