"""Native post-processing parity with the pure-Python implementations."""

import numpy as np
import pytest

from scrooge_tpu import native
from scrooge_tpu.cigar import affine_score
from scrooge_tpu.ops.postprocess import entries_to_cigars


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native compiler available")
    return lib


def _random_entries(seed, cap=40, B=64):
    rng = np.random.default_rng(seed)
    ops = rng.integers(0, 4, (cap, B), dtype=np.uint16)
    cnts = rng.integers(1, 4096, (cap, B), dtype=np.uint16)
    entries = (ops << 12) | cnts
    totals = rng.integers(0, cap + 1, B, dtype=np.int32)
    slot = np.arange(cap)[:, None]
    entries = np.where(slot < totals[None, :], entries, 0).astype(np.uint16)
    return entries, totals


def test_format_cigars_matches_numpy(lib):
    entries, totals = _random_entries(0)
    got = native.format_cigars(entries, totals)
    want = entries_to_cigars(entries, totals)
    assert got == want


def test_format_cigars_empty(lib):
    entries = np.zeros((4, 8), np.uint16)
    totals = np.zeros(8, np.int32)
    assert native.format_cigars(entries, totals) == [""] * 8


def test_affine_scores_matches_python(lib):
    entries, totals = _random_entries(3)
    got = native.affine_scores(entries, totals)
    want = []
    for cigars in entries_to_cigars(entries, totals):
        want.append(affine_score(cigars) if cigars else 0)
    assert got.tolist() == want


@pytest.fixture
def io_lib():
    lib = native.get_io_lib()
    if lib is None:
        pytest.skip("no C++ compiler for the native io parsers")
    return lib


_FASTA = (
    "junk before header\n"
    ">chr1 with spaces in desc\r\n"
    "ACGT ACGT\n"
    "\n"
    "TT\r\n"
    ">chr2\n"
    "GG GG"  # no trailing newline
)
_FASTQ = (
    "@read1 x\r\n"
    "ACGTACGT\r\n"
    "+\n"
    "@@@@@@@@\n"  # quality line starting with '@' must not resync
    "stray line\n"
    "  @read2\n"  # header with leading whitespace
    " ACGT \n"    # content with surrounding whitespace
    "+\n"
    "!!!!\n"
    "@read3\n"
    "AC"          # truncated record at EOF
)


def test_native_fasta_parser_matches_python(io_lib, tmp_path, monkeypatch):
    """native/io_parsers.cpp (the reference's C++ I/O role,
    util.cpp:45-108) is byte-identical to the Python parser on
    adversarial input: CRLF, in-line spaces, leading junk, empty lines,
    missing trailing newline."""
    monkeypatch.setenv("SCROOGE_NATIVE_IO", "0")
    from scrooge_tpu import io as sio

    p = tmp_path / "t.fasta"
    p.write_text(_FASTA)
    py = [(s.description, s.content) for s in sio.read_fasta(p)]
    nat = [(s.description, s.content) for s in native.parse_fasta(p)]
    assert py == nat
    assert py[0] == ("chr1 with spaces in desc", "ACGTACGTTT")
    # empty file
    p2 = tmp_path / "e.fasta"
    p2.write_text("")
    assert native.parse_fasta(p2) == []


def test_native_fastq_parser_matches_python(io_lib, tmp_path, monkeypatch):
    """util.cpp:110-157 role: 4-line records, '@'-leading quality lines,
    stray lines, whitespace trims, truncated tail record."""
    monkeypatch.setenv("SCROOGE_NATIVE_IO", "0")
    from scrooge_tpu import io as sio

    p = tmp_path / "t.fastq"
    p.write_text(_FASTQ)
    py = [(r.description, r.content) for r in sio.read_fastq(p)]
    nat = [(r.description, r.content) for r in native.parse_fastq(p)]
    assert py == nat
    assert nat == [("read1x", "ACGTACGT"), ("read2", "ACGT"),
                   ("read3", "AC")]


def test_native_io_end_to_end_on_dataset(io_lib, tmp_path, monkeypatch):
    """Opt-in native IO (SCROOGE_NATIVE_IO=1) loads a written dataset
    identically to the Python parsers."""
    from scrooge_tpu import io as sio
    from scrooge_tpu.utils.simulate import simulate_dataset, write_dataset

    ds = simulate_dataset(genome_len=20_000, num_reads=12, read_len=300,
                          accuracy=0.95, seed=5)
    write_dataset(ds, tmp_path / "ds")

    monkeypatch.setenv("SCROOGE_NATIVE_IO", "0")
    g_py, reads_py = sio.load_dataset(tmp_path / "ds")
    monkeypatch.setenv("SCROOGE_NATIVE_IO", "1")
    g_nat, reads_nat = sio.load_dataset(tmp_path / "ds")
    assert g_py.content == g_nat.content
    assert g_py.chromosome_starts == g_nat.chromosome_starts
    assert [(r.description, r.content) for r in reads_py] == \
           [(r.description, r.content) for r in reads_nat]
    assert all(len(r.locations) == len(p.locations)
               for r, p in zip(reads_nat, reads_py))


def test_native_parsers_universal_newlines_and_nonascii(io_lib, tmp_path,
                                                        monkeypatch):
    """Lone-'\\r' line endings parse like Python's universal newlines
    (a CR byte must never enter genome content), and non-ASCII files
    fall back to the Python parser instead of crashing."""
    monkeypatch.setenv("SCROOGE_NATIVE_IO", "0")
    from scrooge_tpu import io as sio

    fa = tmp_path / "cr.fasta"
    fa.write_bytes(b">c\nAC\rGT\n>d\rTTTT\r")
    py = [(s.description, s.content) for s in sio.read_fasta(fa)]
    nat = [(s.description, s.content) for s in native.parse_fasta(fa)]
    assert py == nat == [("c", "ACGT"), ("d", "TTTT")]

    fq = tmp_path / "cr.fastq"
    fq.write_bytes(b"@r1\rACGT\r+\r!!!!\r@r2\rGG\r+\r!!\r")
    py = [(r.description, r.content) for r in sio.read_fastq(fq)]
    nat = [(r.description, r.content) for r in native.parse_fastq(fq)]
    assert py == nat == [("r1", "ACGT"), ("r2", "GG")]

    # non-ASCII: native returns None (caller falls back), io dispatch
    # under SCROOGE_NATIVE_IO=1 still produces the Python result
    ua = tmp_path / "u.fasta"
    ua.write_bytes(b">s\xc3\xa9q\nACGT\n")
    assert native.parse_fasta(ua) is None
    monkeypatch.setenv("SCROOGE_NATIVE_IO", "1")
    seqs = sio.read_fasta(ua)
    assert [(s.description, s.content) for s in seqs] == [("séq", "ACGT")]


def test_encode_pack_strs_matches_oracle():
    """Fused C++ ASCII->2-bit(->packed) encode vs the numpy reference
    (encode_np + pack_2bit_host)."""
    import random

    from scrooge_tpu.api import encode_np
    from scrooge_tpu.ops.engine_pallas import pack_2bit_host

    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = random.Random(3)
    seqs = ["".join(rng.choice("ACGTacgt") for _ in range(n))
            for n in (0, 1, 15, 16, 17, 31, 33, 200, 1000)]
    width = 1024
    rows = np.zeros((len(seqs), width), np.uint8)
    for i, s in enumerate(seqs):
        if s:
            rows[i, : len(s)] = encode_np(s)
    got8 = native.encode_strs(seqs, width)
    assert (got8 == rows).all()
    gotw = native.encode_pack_strs(seqs, width)
    assert (gotw == pack_2bit_host(rows)).all()

    with pytest.raises(ValueError, match="non-ACGT"):
        native.encode_strs(["ACGTN"], 16)
    with pytest.raises(ValueError, match="non-ACGT"):
        native.encode_pack_strs(["ACG", "TtNA"], 16)
    # non-ASCII raises a ValueError subclass too (UnicodeEncodeError)
    with pytest.raises(ValueError):
        native.encode_pack_strs(["ACGТ"], 16)  # Cyrillic Т


def test_extract_runs_matches_numpy_gather(lib):
    """extract_runs[8] (the return_packed fast path) must equal the numpy
    transpose+mask gather it replaces, including the u8 -> u16 layout
    conversion and empty lanes."""
    entries, totals = _random_entries(11, cap=33, B=96)
    totals[0] = 0
    totals[-1] = 33

    def oracle_u16(e, t):
        lane_major = np.ascontiguousarray(e.T)
        m = np.arange(e.shape[0])[None, :] < t[:, None]
        return lane_major[m]

    got = native.extract_runs(entries, totals)
    np.testing.assert_array_equal(got, oracle_u16(entries, totals))

    # u8 layout: op << 6 | count, count <= 63 -> canonical u16 out
    rng = np.random.default_rng(12)
    ops = rng.integers(0, 4, (20, 48), dtype=np.uint8)
    cnts = rng.integers(1, 64, (20, 48), dtype=np.uint8)
    e8 = ((ops << 6) | cnts).astype(np.uint8)
    t8 = rng.integers(0, 21, 48, dtype=np.int32)
    got8 = native.extract_runs(e8, t8)
    u16 = ((e8.astype(np.uint16) >> 6) << 12) | (e8 & 0x3F)
    np.testing.assert_array_equal(got8, oracle_u16(u16, t8))

    # unsupported dtype falls back to None (caller uses numpy)
    assert native.extract_runs(u16.astype(np.uint32), t8) is None
