"""I/O layer tests: parsers + seed joining (util.cpp semantics)."""

import os
import textwrap

import pytest

from scrooge_tpu import io as sio


@pytest.fixture
def dataset(tmp_path):
    (tmp_path / "reference.fasta").write_text(
        ">chr1\nACGTACGTAC\nGTACGT\n>chr2\nTTTTCCCC\n")
    (tmp_path / "reads.fastq").write_text(
        "@read1 extra\nACGTAC\n+\nIIIIII\n@read2\nTTTTCC\n+\n@IIIII\n")
    return tmp_path


def test_read_fasta_multi(dataset):
    seqs = sio.read_fasta(dataset / "reference.fasta")
    assert [s.description for s in seqs] == ["chr1", "chr2"]
    assert seqs[0].content == "ACGTACGTACGTACGT"
    assert seqs[1].content == "TTTTCCCC"


def test_read_genome_concatenates(dataset):
    g = sio.read_genome(dataset / "reference.fasta")
    assert g.content == "ACGTACGTACGTACGT" + "TTTTCCCC"
    assert g.chromosome_starts == {"chr1": 0, "chr2": 16}


def test_read_fastq_strips_spaces_and_survives_at_quality(dataset):
    reads = sio.read_fastq(dataset / "reads.fastq")
    assert [r.description for r in reads] == ["read1extra", "read2"]
    assert [r.content for r in reads] == ["ACGTAC", "TTTTCC"]


def test_read_maf_and_join(dataset):
    maf = textwrap.dedent("""\
        ##maf version=1
        a
        s ref 4 6 + 16 ACGTAC
        s read1extra 2 4 + 6 GTAC

        a
        s ref 0 6 + 8 TTTTCC
        s read2 0 6 + 6 TTTTCC
    """)
    (dataset / "candidates.maf").write_text(maf)
    genome = sio.read_genome(dataset / "reference.fasta")
    reads = sio.read_fastq_and_seed_locations(
        genome, dataset / "reads.fastq", dataset / "candidates.maf")
    # left-extend: start 4 - aligned-region offset 2 = 2
    loc1 = reads[0].locations[0]
    assert loc1.start_in_chromosome == 2
    assert loc1.start_of_aligned_region == 0
    assert loc1.size_of_aligned_region == 6
    # multi-chromosome genomes: MAF uses chromosome "ref" which is absent
    # from chromosome_starts -> offset 0 (reference uses operator[] which
    # inserts 0 likewise, util.cpp:296)
    assert loc1.start_in_reference == 2


def test_read_paf_and_join(dataset):
    paf = ("read1extra\t6\t1\t5\t+\tchr2\t8\t3\t7\t4\t4\t60\n")
    (dataset / "candidates.paf").write_text(paf)
    genome = sio.read_genome(dataset / "reference.fasta")
    reads = sio.read_fastq_and_seed_locations(
        genome, dataset / "reads.fastq", dataset / "candidates.paf")
    loc = reads[0].locations[0]
    # tstart 3 left-extended by qstart 1 -> 2; chr2 global offset 16
    assert loc.start_in_chromosome == 2
    assert loc.start_in_reference == 18
    assert loc.strand is True


def test_unknown_read_raises(dataset):
    (dataset / "candidates.paf").write_text(
        "ghost\t6\t0\t6\t+\tchr1\t16\t0\t6\t6\t6\t60\n")
    genome = sio.read_genome(dataset / "reference.fasta")
    with pytest.raises(ValueError, match="unknown read"):
        sio.read_fastq_and_seed_locations(
            genome, dataset / "reads.fastq", dataset / "candidates.paf")


def test_load_dataset(dataset):
    (dataset / "candidates.paf").write_text(
        "read2\t6\t0\t6\t+\tchr2\t8\t0\t6\t6\t6\t60\n")
    genome, reads = sio.load_dataset(dataset)
    assert len(genome.content) == 24
    assert reads[1].locations[0].start_in_reference == 16


def test_simulate_roundtrip():
    from scrooge_tpu.utils.simulate import simulate_dataset

    ds = simulate_dataset(genome_len=2000, num_reads=8, read_len=200,
                          accuracy=0.95, seed=1)
    assert len(ds.reads) == 8
    for r in ds.reads:
        assert r.locations and set(r.content) <= set("ACGT")
        # ~5% edits: length stays within a loose band
        assert 150 <= len(r.content) <= 250
