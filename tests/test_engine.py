"""Batched XLA engine parity tests (runs on the virtual CPU backend).

The device engine must match the scalar oracle bit-exactly, through the
public API, on both interfaces — the analogue of the reference's
library_interface_correctness_test (tests.cu:273-333), plus golden values
and the frozen reference corpus.
"""

import gzip
import os
import random

import numpy as np
import pytest

import scrooge_tpu
from scrooge_tpu import AlignConfig, CandidateLocation, Genome, Read
from scrooge_tpu import pyref
from scrooge_tpu.cigar import validate_cigar

CORPUS = os.path.join(os.path.dirname(__file__), "data", "parity_corpus.tsv.gz")

XLA_CFG = AlignConfig(backend="xla", batch_tile=128)


def _mutate(seq, rng, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))
            continue
        if r < rate:
            out.append(rng.choice("ACGT"))
        out.append(c)
    return "".join(out)


def _random_cases(seed, count, max_len=300):
    rng = random.Random(seed)
    cases = []
    while len(cases) < count:
        n = rng.randint(1, max_len)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = _mutate(t, rng, rng.choice([0.0, 0.05, 0.2]))
        if q:
            cases.append((t, q))
    return cases


def test_engine_matches_oracle_random():
    cases = _random_cases(11, 100)
    cases.append(("ACGT" * 100, ""))  # empty read lane
    cases.append(("ACGT", "ACGTACGT" * 10))  # text exhausted
    texts = [t for t, _ in cases]
    queries = [q for _, q in cases]
    got = scrooge_tpu.align_all(texts, queries, config=XLA_CFG)
    for (t, q), a in zip(cases, got):
        ed, cigar = pyref.align_pair(t, q, AlignConfig())
        assert a.edit_distance == ed
        assert a.cigar == cigar


def test_engine_corpus_parity_default_config():
    """Every default-config corpus row through the batched engine."""
    cases = []
    with gzip.open(CORPUS, "rt") as f:
        for line in f:
            W, K, O, text, query, ed, cigar = line.rstrip("\n").split("\t")
            if (int(W), int(K), int(O)) == (64, 64, 33) and len(query) <= 3000:
                cases.append((text, query, int(ed), cigar))
    assert len(cases) > 50
    got = scrooge_tpu.align_all([c[0] for c in cases], [c[1] for c in cases],
                                config=XLA_CFG)
    for (text, query, ed, cigar), a in zip(cases, got):
        assert a.edit_distance == ed
        assert a.cigar == cigar


@pytest.mark.parametrize("wko", [(32, 32, 17), (16, 16, 9), (64, 48, 33)])
def test_engine_corpus_parity_other_configs(wko):
    """(64, 48, 33) is the asymmetric K<W corpus config: K=48 sits above
    the device tb_cap (min(K, 32) = 32), so rows whose window edit
    distance lands in (32, 48] pin the Pallas-fail -> full-K-XLA retry
    path against the reference C++ outputs."""
    W, K, O = wko
    cfg = AlignConfig(W=W, K=K, O=O, backend="xla", batch_tile=128)
    cases = []
    with gzip.open(CORPUS, "rt") as f:
        for line in f:
            w, k, o, text, query, ed, cigar = line.rstrip("\n").split("\t")
            if (int(w), int(k), int(o)) == wko and len(query) <= 1500:
                cases.append((text, query, int(ed), cigar))
    assert cases
    got = scrooge_tpu.align_all([c[0] for c in cases], [c[1] for c in cases],
                                config=cfg)
    for (text, query, ed, cigar), a in zip(cases, got):
        assert a.edit_distance == ed
        assert a.cigar == cigar


def test_four_way_interface_equivalence():
    """All interface x backend combinations must produce identical results
    (tests.cu:273-333 analogue, with the backend axis replacing CPU/GPU)."""
    cases = _random_cases(23, 24, max_len=200)
    texts = [t for t, _ in cases]
    queries = [q for _, q in cases]

    # pairwise, both backends
    a_pyref = scrooge_tpu.align_all(texts, queries,
                                    config=AlignConfig(backend="pyref"))
    a_xla = scrooge_tpu.align_all(texts, queries, config=XLA_CFG)

    # read-mapping: each text becomes its own genome at offset 0
    for i, (t, q) in enumerate(cases):
        genome = Genome(content=t)
        read = Read(description=f"r{i}", content=q,
                    locations=[CandidateLocation(start_in_reference=0)])
        m_pyref = scrooge_tpu.align_all(
            genome, [read], config=AlignConfig(backend="pyref"))[0]
        m_xla = scrooge_tpu.align_all(genome, [read], config=XLA_CFG)[0]
        assert (a_pyref[i].edit_distance == a_xla[i].edit_distance
                == m_pyref.edit_distance == m_xla.edit_distance)
        assert (a_pyref[i].cigar == a_xla[i].cigar
                == m_pyref.cigar == m_xla.cigar)


def test_read_mapping_shared_genome_offsets():
    """Multiple candidate locations into one genome; CIGARs must validate
    at their respective offsets."""
    rng = random.Random(3)
    genome_str = "".join(rng.choice("ACGT") for _ in range(5000))
    genome = Genome(content=genome_str, chromosome_starts={"chr1": 0})
    reads = []
    expected = []
    for i in range(20):
        start = rng.randint(0, 4000)
        length = rng.randint(50, 400)
        content = _mutate(genome_str[start : start + length], rng, 0.08)
        if not content:
            continue
        reads.append(Read(
            description=f"r{i}", content=content,
            locations=[CandidateLocation(read_description=f"r{i}",
                                         start_in_reference=start)]))
        expected.append(start)

    alns = scrooge_tpu.align_all(genome, reads, config=XLA_CFG)
    assert len(alns) == len(reads)
    for read, start, a in zip(reads, expected, alns):
        validate_cigar(a.cigar, a.edit_distance, genome_str, read.content,
                       start_in_reference=start)
        ed, cigar = pyref.align_pair(genome_str[start:], read.content,
                                     AlignConfig())
        assert (a.edit_distance, a.cigar) == (ed, cigar)


def test_stats_and_log_format(capsys):
    """The aligns/second stderr line is scraped by profiling tooling;
    its format is API (genasm_cpu.cpp:539)."""
    from scrooge_tpu import api

    alns, stats = scrooge_tpu.align_all(
        ["ACGTACGT"], ["ACGTACGT"], config=XLA_CFG, return_stats=True)
    assert stats.num_pairs == 1
    assert stats.core_ns > 0
    assert alns[0].edit_distance == 0

    api.enabled_algorithm_log = True
    try:
        scrooge_tpu.align_all(["ACGT"], ["ACGT"], config=XLA_CFG)
    finally:
        api.enabled_algorithm_log = False
    err = capsys.readouterr().err
    assert "aligns/second" in err and "core algorithm ran at" in err


def test_unalignable_raises():
    cfg = AlignConfig(W=8, K=2, O=3, backend="xla", batch_tile=128)
    with pytest.raises(Exception) as exc_info:
        scrooge_tpu.align_all(["AAAAAAAA"], ["TTTTTTTT"], config=cfg)
    assert "no alignment within" in str(exc_info.value)


def test_multi_tile_pipeline_parity():
    """More pairs than one batch tile: the pipelined tile loop (H2D of
    tile n+1 overlapped with device compute of tile n and postprocess of
    n-1) must produce exactly the single-tile results, in input order,
    through both interfaces."""
    cases = _random_cases(29, 300, max_len=120)  # 3 tiles at tile=128
    texts = [t for t, _ in cases]
    queries = [q for _, q in cases]
    got = scrooge_tpu.align_all(texts, queries, config=XLA_CFG)
    one = scrooge_tpu.align_all(
        texts, queries, config=AlignConfig(backend="xla", batch_tile=512))
    assert [(a.edit_distance, a.cigar) for a in got] == \
        [(a.edit_distance, a.cigar) for a in one]

    rng = random.Random(31)
    genome_str = "".join(rng.choice("ACGT") for _ in range(8000))
    genome = Genome(content=genome_str)
    reads = []
    for i in range(300):
        start = rng.randint(0, 7000)
        seg = genome_str[start : start + 150]
        content = "".join(c for c in seg if rng.random() > 0.05)
        reads.append(Read(description=f"r{i}", content=content,
                          locations=[CandidateLocation(
                              start_in_reference=start)]))
    got_r = scrooge_tpu.align_all(genome, reads, config=XLA_CFG)
    one_r = scrooge_tpu.align_all(
        genome, reads, config=AlignConfig(backend="xla", batch_tile=512))
    assert [(a.edit_distance, a.cigar) for a in got_r] == \
        [(a.edit_distance, a.cigar) for a in one_r]


@pytest.mark.parametrize("wko", [(192, 192, 97), (256, 256, 129)])
def test_engine_corpus_parity_large_w(wko):
    """The large-W corpus configs (the top of the reference W-sweep,
    profile.py:65-82) through the batched engine, bit-exact vs the
    reference C++ outputs."""
    W, K, O = wko
    cfg = AlignConfig(W=W, K=K, O=O, backend="xla", batch_tile=128)
    cases = []
    with gzip.open(CORPUS, "rt") as f:
        for line in f:
            w, k, o, text, query, ed, cigar = line.rstrip("\n").split("\t")
            if (int(w), int(k), int(o)) == wko and len(query) <= 800:
                cases.append((text, query, int(ed), cigar))
    assert len(cases) > 20
    got = scrooge_tpu.align_all([c[0] for c in cases], [c[1] for c in cases],
                                config=cfg)
    for (text, query, ed, cigar), a in zip(cases, got):
        assert a.edit_distance == ed, (W, len(text), len(query))
        assert a.cigar == cigar, (W, len(text), len(query))


def test_pyref_backend_semantics_match_device_backends():
    """The oracle backend raises the same errors as the device backends:
    AlignmentError for unalignable pairs (not bare ValueError) and a
    bounds ValueError for out-of-genome candidate locations (Python
    slicing must not wrap negative starts to the genome tail)."""
    from scrooge_tpu.api import AlignmentError

    cfg = AlignConfig(backend="pyref", W=32, K=8, O=17)
    with pytest.raises(AlignmentError):
        scrooge_tpu.align_all(["C" * 32], ["A" * 32], config=cfg)

    genome = Genome(content="ACGT" * 50)
    for bad_start in (-5, 10_000):
        read = Read(description="r", content="ACGTACGT",
                    locations=[CandidateLocation(
                        start_in_reference=bad_start)])
        with pytest.raises(ValueError, match="out of genome bounds"):
            scrooge_tpu.align_all(genome, [read],
                                  config=AlignConfig(backend="pyref"))

    # stats: the oracle backend reports a real core time (the scraped
    # aligns/second line must not be garbage)
    _, stats = scrooge_tpu.api.align_pairs(
        ["ACGTACGTACGT"], ["ACGTACGTACGT"],
        config=AlignConfig(backend="pyref"), return_stats=True)
    assert stats.core_ns > 0


def test_engine_odd_k_parity_with_oracle():
    """Odd K exercises the two-row wavefront's scratch-row parity logic
    (the d+1 <= K gate and the final odd row): the committed corpus and
    the other engine tests all use even K, so this pins the odd path."""
    for K in (7, 15):
        cfg = AlignConfig(W=16, K=K, O=9, backend="xla", batch_tile=128)
        ref_cfg = AlignConfig(W=16, K=K, O=9)
        cases, wants = [], []
        for t, q in _random_cases(31 + K, 16, max_len=60):
            try:
                wants.append(pyref.align_pair(t, q, ref_cfg))
            except ValueError:
                continue  # unalignable under this small K: skip
            cases.append((t, q))
        assert len(cases) >= 8, f"K={K}: too few alignable cases"
        got = scrooge_tpu.align_all([t for t, _ in cases],
                                    [q for _, q in cases], config=cfg)
        for (t, q), a, want in zip(cases, got, wants):
            assert (a.edit_distance, a.cigar) == want, (K, t, q)


def test_return_packed_matches_strings():
    """return_packed=True must be run-for-run identical to the string
    path (same CIGAR content, same edit distances), on both the device
    engine and the scalar backend."""
    import random

    from scrooge_tpu import api
    from scrooge_tpu.datamodel import PackedAlignments

    rng = random.Random(29)
    texts, queries = [], []
    for _ in range(24):
        t = "".join(rng.choice("ACGT") for _ in range(300))
        q = "".join(c for c in t if rng.random() > 0.05)[:260]
        texts.append(t)
        queries.append(q)
    for backend in ("xla", "pyref"):
        cfg = AlignConfig(W=64, K=64, O=33, backend=backend,
                          batch_tile=128)
        strs = api.align_pairs(texts, queries, cfg)
        packed = api.align_pairs(texts, queries, cfg, return_packed=True)
        assert isinstance(packed, PackedAlignments)
        assert len(packed) == len(strs)
        for i, a in enumerate(strs):
            assert int(packed.edit_distances[i]) == a.edit_distance
            assert packed.cigar(i) == a.cigar
        back = packed.to_alignments()
        assert [x.cigar for x in back] == [x.cigar for x in strs]


def test_return_packed_read_mapping():
    from scrooge_tpu import api
    from scrooge_tpu.utils.simulate import simulate_dataset

    ds = simulate_dataset(genome_len=40_000, num_reads=16, read_len=900,
                          accuracy=0.95, seed=5)
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    strs = api.align_reads(ds.genome, ds.reads, cfg)
    packed, stats = api.align_reads(ds.genome, ds.reads, cfg,
                                    return_packed=True, return_stats=True)
    assert stats.format_ns == 0  # stringification skipped entirely
    for i, a in enumerate(strs):
        assert int(packed.edit_distances[i]) == a.edit_distance
        assert packed.cigar(i) == a.cigar


def test_return_packed_multi_tile_identity():
    """Equal-length reads over MULTIPLE tiles (the bench's tile-16384
    operating point is two tiles): the stable length sort is the
    identity, so packed assembly takes the multi-tile stitch fast path —
    outputs must still match the string path pair for pair."""
    from scrooge_tpu import api
    from scrooge_tpu.utils.simulate import simulate_dataset

    ds = simulate_dataset(genome_len=60_000, num_reads=384, read_len=200,
                          accuracy=0.95, seed=13)
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    strs, s_stats = api.align_reads(ds.genome, ds.reads, cfg,
                                    return_stats=True)
    packed = api.align_reads(ds.genome, ds.reads, cfg, return_packed=True)
    assert len(packed) == len(strs) == 384
    for i, a in enumerate(strs):
        assert int(packed.edit_distances[i]) == a.edit_distance
        assert packed.cigar(i) == a.cigar


def test_tail_tile_shrinks_to_pow2_bucket():
    """A trailing partial tile must shrink to a pow2 bucket (>=1024), not
    pad to the full tile — pad lanes are real device time (api._tile_B).
    Results must be identical to a single-tile run."""
    from scrooge_tpu.api import _tile_B

    # unit: full tiles / mesh / small tiles keep tile_size; tails bucket
    assert _tile_B(2048, 2048, None) == 2048
    assert _tile_B(5, 128, None) == 128          # tile_size <= 1024 unchanged
    assert _tile_B(152, 2048, object()) == 2048  # mesh keeps full size
    assert _tile_B(152, 2048, None) == 1024
    assert _tile_B(1500, 2048, None) == 2048     # pow2 clamped to tile
    assert _tile_B(1030, 4096, None) == 2048
    assert _tile_B(1, 2048, None) == 1024

    # integration: 2200 pairs at tile 2048 -> tiles of 2048 + 1024(152 real)
    cases = _random_cases(47, 2200, max_len=60)
    texts = [t for t, _ in cases]
    queries = [q for _, q in cases]
    cfg = AlignConfig(W=16, K=16, O=9, backend="xla", batch_tile=2048)
    got = scrooge_tpu.align_pairs(texts, queries, config=cfg)
    one = scrooge_tpu.align_pairs(
        texts, queries,
        config=AlignConfig(W=16, K=16, O=9, backend="xla", batch_tile=4096))
    assert [(a.edit_distance, a.cigar) for a in got] == \
        [(a.edit_distance, a.cigar) for a in one]
