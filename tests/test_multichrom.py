"""Multi-chromosome genome + larger-scale read-mapping path.

Covers the BASELINE config rows: multi-chromosome reference with
chromosome->global coordinate translation through the full I/O + API stack,
and candidate locations deep into a multi-megabase genome (exercising the
uint32 global-offset window gathers)."""

import numpy as np
import pytest

import scrooge_tpu
from scrooge_tpu import AlignConfig, CandidateLocation, Genome, Read
from scrooge_tpu import io as sio
from scrooge_tpu import pyref
from scrooge_tpu.cigar import validate_cigar


def test_multichromosome_seed_join_to_alignment(tmp_path):
    rng = np.random.default_rng(4)
    bases = np.frombuffer(b"ACGT", np.uint8)
    chr1 = bases[rng.integers(0, 4, 3000)].tobytes().decode()
    chr2 = bases[rng.integers(0, 4, 2000)].tobytes().decode()
    with open(tmp_path / "reference.fasta", "w") as f:
        f.write(f">chr1\n{chr1}\n>chr2\n{chr2}\n")

    # read sampled from chr2 at local offset 500 -> global 3500
    read_seq = chr2[500:700]
    with open(tmp_path / "reads.fastq", "w") as f:
        f.write(f"@r0\n{read_seq}\n+\n{'I' * len(read_seq)}\n")
    with open(tmp_path / "candidates.paf", "w") as f:
        f.write(f"r0\t200\t0\t200\t+\tchr2\t2000\t500\t700\t200\t200\t60\n")

    genome, reads = sio.load_dataset(tmp_path)
    assert reads[0].locations[0].start_in_reference == 3500

    cfg = AlignConfig(backend="xla", batch_tile=128)
    a = scrooge_tpu.align_all(genome, reads, config=cfg)[0]
    assert a.edit_distance == 0
    validate_cigar(a.cigar, 0, genome.content, read_seq, 3500)


def test_deep_genome_offsets():
    """Candidates far into a multi-Mbp genome: global uint32 offsets must
    reach past small-int ranges and produce oracle-exact results."""
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    glen = 6_000_000
    gcodes = rng.integers(0, 4, glen).astype(np.uint8)
    genome = Genome(content=bases[gcodes].tobytes().decode(),
                    chromosome_starts={"chr1": 0})

    reads = []
    starts = [0, 2_500_000, glen - 400]
    for k, st in enumerate(starts):
        seg = genome.content[st : st + 300]
        # plant a couple of mismatches
        seg = seg[:50] + ("A" if seg[50] != "A" else "C") + seg[51:]
        reads.append(Read(description=f"r{k}", content=seg,
                          locations=[CandidateLocation(
                              start_in_reference=st)]))

    cfg = AlignConfig(backend="xla", batch_tile=128)
    alns = scrooge_tpu.align_all(genome, reads, config=cfg)
    for read, st, a in zip(reads, starts, alns):
        ed, cigar = pyref.align_pair(genome.content[st : st + 700],
                                     read.content, AlignConfig())
        assert (a.edit_distance, a.cigar) == (ed, cigar)
        validate_cigar(a.cigar, a.edit_distance, genome.content,
                       read.content, st)


def test_config4_streamed_scaled():
    """Scaled-down CI version of the BASELINE config-4 run
    (tools/config4_run.py): a multi-chromosome genome prepared ONCE on
    device (PreparedGenome), read chunks streamed against it with packed
    output. Pins (a) chromosome attribution of the simulator, (b) genome
    reuse across calls, (c) result correctness vs the direct string
    path."""
    from scrooge_tpu.api import align_reads, prepare_genome
    from scrooge_tpu.utils.simulate import (random_multichrom_genome,
                                            simulate_reads)

    genome = random_multichrom_genome(2_000_000, 6, seed=11)
    starts = list(genome.chromosome_starts.values())
    assert starts == sorted(starts) and len(starts) == 6
    assert len(genome.content) == 2_000_000

    cfg = AlignConfig(backend="xla", batch_tile=256)
    pg = prepare_genome(genome)
    pairs = 0
    prep_after_first = None
    for chunk_no in range(2):
        reads = simulate_reads(genome, 256, 900, 0.95,
                               seed=100 + chunk_no)
        # chromosome attribution matches the global offset
        for r in reads[:8]:
            loc = r.locations[0]
            assert (genome.chromosome_starts[loc.chromosome]
                    + loc.start_in_chromosome == loc.start_in_reference)
        packed, stats = align_reads(pg, reads, cfg, return_stats=True,
                                    return_packed=True)
        pairs += len(packed)
        if chunk_no > 0:
            prep_after_first = stats.prep_ns
        # spot-check vs the string path on the same prepared genome
        direct = align_reads(pg, reads[:4], cfg)
        for i, a in enumerate(direct):
            assert packed.cigar(i) == a.cigar
            assert int(packed.edit_distances[i]) == a.edit_distance
            validate_cigar(a.cigar, a.edit_distance, genome.content,
                           reads[i].content,
                           reads[i].locations[0].start_in_reference)
    assert pairs == 512
    # the genome was NOT re-encoded/re-uploaded on later chunks
    assert prep_after_first < 50_000_000  # < 50 ms
