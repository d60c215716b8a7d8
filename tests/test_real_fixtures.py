"""Ingestion + alignment over committed real-format fixtures.

The reference's accuracy story runs on downloaded human datasets
(DATASETS.md:45-125; profile.py:650 layout contract); this rig is
air-gapped, so tests/data/real_format/ holds byte-faithful format
excerpts instead (GRCh38-style FASTA with soft-masking and CRLF,
SRA/ONT-style FASTQ incl. a '@'-leading quality line, PBSIM2-style MAF
with strands and aligned-region offsets, minimap2-style PAF with typed
tags). Regenerate with tools/gen_real_fixtures.py (seeded; byte-stable).
"""

import os
import subprocess
import sys

import pytest

from scrooge_tpu import api, cigar, io
from scrooge_tpu.config import AlignConfig

DATA = os.path.join(os.path.dirname(__file__), "data", "real_format")


def _aligned_dataset(name):
    genome, reads = io.load_dataset(os.path.join(DATA, name))
    # reverse-strand filter: tests.cu:346-358 behavior (cli.tests_cli:278)
    for read in reads:
        read.locations = [l for l in read.locations if l.strand]
    reads = [r for r in reads if r.locations]
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    alns, stats = api.align_reads(genome, reads, cfg, return_stats=True)
    return genome, reads, alns, stats


def test_ont_maf_dataset_aligns():
    genome, reads, alns, stats = _aligned_dataset("ont_maf")
    # 8 records, one reverse-strand -> 7 aligned pairs
    assert stats.num_pairs == 7
    k = 0
    for read in reads:
        for loc in read.locations:
            a = alns[k]
            k += 1
            # the full oracle: well-formed, covers the read, matches the
            # actual sequences, edit count == reported distance
            cigar.validate_cigar(a.cigar, a.edit_distance,
                                 genome.content.upper(),
                                 read.content.upper(),
                                 loc.start_in_reference)
            # ~5%-error extracts must align with a small distance
            assert a.edit_distance < 0.2 * len(read.content)


def test_ont_maf_left_extension_and_join():
    genome, reads = io.load_dataset(os.path.join(DATA, "ont_maf"))
    assert len(reads) == 8
    by_desc = {r.description.split("length=")[0]: r for r in reads}
    # S1_1 has a 13-base unaligned head; left_extend shifts the candidate
    # 13 left of the MAF ref start (3990 -> 3977)
    (loc,) = by_desc["S1_1"].locations
    assert loc.start_in_reference == 3990 - 13
    assert loc.start_of_aligned_region == 0
    # the reverse-strand record keeps strand=False through the join
    (loc8,) = by_desc["S1_8"].locations
    assert loc8.strand is False


def test_ilmn_paf_dataset_aligns():
    genome, reads, alns, stats = _aligned_dataset("ilmn_paf")
    assert stats.num_pairs == 9  # 10 rows, one reverse-strand
    assert len(genome.chromosome_starts) == 2
    k = 0
    for read in reads:
        for loc in read.locations:
            a = alns[k]
            k += 1
            cigar.validate_cigar(a.cigar, a.edit_distance, genome.content,
                                 read.content, loc.start_in_reference)
            assert a.edit_distance < 0.1 * len(read.content)


def test_ilmn_paf_global_coordinates():
    """chr2 candidates must land at chromosome_start + local offset
    (get_global_seeds multi-chromosome path, util.cpp:292-301)."""
    genome, reads = io.load_dataset(os.path.join(DATA, "ilmn_paf"))
    chr2_start = genome.chromosome_starts[
        [d for d in genome.chromosome_starts if d.startswith("chr2")][0]]
    assert chr2_start == 4200
    r2 = [r for r in reads if r.description.startswith("SRR13278681.2")][0]
    assert r2.locations[0].start_in_reference == chr2_start + 103


def test_fastq_parser_traps():
    """CRLF records, lowercase content, and '@'-leading quality lines must
    all parse as exactly one record each."""
    reads = io.read_fastq(os.path.join(DATA, "ont_maf", "reads.fastq"))
    assert len(reads) == 8
    assert any(r.content == r.content.lower() for r in reads)  # lc read
    assert all("\r" not in r.description and " " not in r.description
               for r in reads)


def test_fasta_softmask_and_crlf():
    seqs = io.read_fasta(os.path.join(DATA, "ont_maf", "reference.fasta"))
    assert len(seqs) == 1
    assert seqs[0].description.startswith("chr21")
    s = seqs[0].content
    assert s[2000:2400] == s[2000:2400].lower()  # soft-mask preserved
    seqs2 = io.read_fasta(os.path.join(DATA, "ilmn_paf", "reference.fasta"))
    assert [len(x.content) for x in seqs2] == [4200, 3000]  # CRLF chrom ok


def test_convert_restrict_splits_n_runs(tmp_path):
    """GenConverter --restrict ACGT --genome behavior on an N-gapped
    contig: leading N-run dropped, internal run splits into _partN."""
    out = tmp_path / "restricted.fasta"
    rc = subprocess.run(
        [sys.executable, "-m", "scrooge_tpu.tools.convert",
         f"--input={os.path.join(DATA, 'raw_reference.fasta')}",
         f"--output={out}", "--source_format=FASTA",
         "--target_format=FASTA", "--restrict=ACGT", "--genome",
         "--prune_titles"],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    parts = io.read_fasta(out)
    assert [p.description for p in parts] == [
        "chrUn_KI270752v1_part0", "chrUn_KI270752v1_part1"]
    assert [len(p.content) for p in parts] == [900, 700]
    assert not any("N" in p.content for p in parts)
    # the restricted output is alignable end-to-end
    g = io.read_genome(out)
    alns = api.align_pairs([g.content[:150]], [g.content[:150]],
                           AlignConfig(backend="pyref"))
    assert alns[0].edit_distance == 0


def test_fixtures_are_reproducible(tmp_path):
    """The committed fixtures must match the seeded generator exactly."""
    import shutil

    gen = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "gen_real_fixtures.py")
    env = dict(os.environ)
    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    shutil.copy(gen, work / "tools" / "gen_real_fixtures.py")
    rc = subprocess.run([sys.executable, str(work / "tools" /
                                             "gen_real_fixtures.py")],
                        capture_output=True, text=True, env=env)
    assert rc.returncode == 0, rc.stderr
    regen = work / "tests" / "data" / "real_format"
    for root, _, files in os.walk(DATA):
        rel = os.path.relpath(root, DATA)
        for fn in files:
            a = os.path.join(root, fn)
            b = os.path.join(regen, rel, fn)
            with open(a, "rb") as fa, open(b, "rb") as fb:
                assert fa.read() == fb.read(), f"{rel}/{fn} drifted"
