"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/Pallas; host-side post-processing that Python is
too slow for lives here. The shared library is compiled on demand with g++
(cached next to the source, keyed on source mtime) and loaded with ctypes;
callers fall back to the pure-Python implementations if no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cigar_strings.cpp")
_SO = os.path.join(_DIR, "_cigar_strings.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build_one(src: str, so: str, extra=()) -> Optional[str]:
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra, src,
            "-o", so + ".tmp"]
    # -march=native first (the SWAR/BMI2 fast paths), plain second
    for cmd in ([*base[:2], "-march=native", *base[2:]], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
            return so
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _build() -> Optional[str]:
    return _build_one(_SRC, _SO)


# ---------------------------------------------------------------------------
# CPython extension (_scroogext): zero-copy str encoding + token decoding.
# Built on demand like the ctypes library; loaded as a real extension
# module so it can touch PyUnicode internals and build result strings
# directly (no pybind11 in the image — plain CPython C API).

_SRC_EXT = os.path.join(_DIR, "scroogext.cpp")
_ext = None
_ext_tried = False


def get_ext():
    """The loaded _scroogext extension module, or None if unavailable."""
    global _ext, _ext_tried
    with _lock:
        if _ext_tried:
            return _ext
        _ext_tried = True
        import sysconfig

        inc = sysconfig.get_paths().get("include")
        if not inc or not os.path.exists(os.path.join(inc, "Python.h")):
            return None
        so = os.path.join(_DIR, "_scroogext.so")
        path = _build_one(_SRC_EXT, so, extra=(f"-I{inc}",))
        if path is None:
            return None
        try:
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader(
                "_scroogext", path)
            spec = importlib.util.spec_from_loader("_scroogext", loader)
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
        except ImportError:
            return None
        _ext = mod
        return _ext


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.format_cigars.restype = ctypes.c_int
        lib.format_cigars.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.affine_scores.restype = None
        lib.affine_scores.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p]
        lib.format_cigars_windows.restype = ctypes.c_int
        lib.format_cigars_windows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.pack_2bit_rows.restype = None
        lib.pack_2bit_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.format_cigars8.restype = ctypes.c_int
        lib.format_cigars8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.encode_pack_rows.restype = ctypes.c_int
        lib.encode_pack_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.encode_rows.restype = ctypes.c_int
        lib.encode_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        for fn in (lib.extract_runs, lib.extract_runs8):
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return _lib


def format_cigars(entries: np.ndarray, totals: np.ndarray) -> Optional[List[str]]:
    """entries: (cap, B) uint16 packed runs (C-contiguous); totals: (B,).

    Returns the CIGAR strings, or None if the native library is unavailable
    (caller falls back to the numpy path).
    """
    lib = get_lib()
    if lib is None:
        return None
    entries = np.ascontiguousarray(entries, np.uint16)
    totals = np.ascontiguousarray(totals, np.int32)
    cap, B = entries.shape
    # worst case 5 chars/run ("4095=")
    stride = max(int(totals.max(initial=0)), 1) * 5
    out = np.empty((B, stride), np.uint8)
    lens = np.empty(B, np.int32)
    rc = lib.format_cigars(
        entries.ctypes.data, cap, B, totals.ctypes.data,
        out.ctypes.data, stride, lens.ctypes.data)
    if rc != 0:
        return None
    flat = out.tobytes()
    return [flat[b * stride : b * stride + int(lens[b])].decode("ascii")
            for b in range(B)]


def format_cigars_u8(entries: np.ndarray,
                     totals: np.ndarray) -> Optional[List[str]]:
    """entries: (cap, B) uint8 packed runs (op << 6 | count, count <= 63);
    totals: (B,). None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    entries = np.ascontiguousarray(entries, np.uint8)
    totals = np.ascontiguousarray(totals, np.int32)
    cap, B = entries.shape
    stride = max(int(totals.max(initial=0)), 1) * 3  # "63=" is 3 chars
    out = np.empty((B, stride), np.uint8)
    lens = np.empty(B, np.int32)
    rc = lib.format_cigars8(
        entries.ctypes.data, cap, B, totals.ctypes.data,
        out.ctypes.data, stride, lens.ctypes.data)
    if rc != 0:
        return None
    flat = out.tobytes()
    return [flat[b * stride : b * stride + int(lens[b])].decode("ascii")
            for b in range(B)]


def format_cigars_windows(entries: np.ndarray,
                          counts: np.ndarray) -> Optional[List[str]]:
    """Format CIGARs straight from the engine's raw per-window layout.

    entries: (maxw, ne, B) uint16 packed runs; counts: (maxw, B) int32
    valid runs per window. Returns None if the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    entries = np.ascontiguousarray(entries, np.uint16)
    counts = np.ascontiguousarray(counts, np.int32)
    maxw, ne, B = entries.shape
    totals = counts.sum(axis=0)
    stride = max(int(totals.max(initial=0)), 1) * 5
    out = np.empty((B, stride), np.uint8)
    lens = np.empty(B, np.int32)
    rc = lib.format_cigars_windows(
        entries.ctypes.data, maxw, ne, B, counts.ctypes.data,
        out.ctypes.data, stride, lens.ctypes.data)
    if rc != 0:
        return None
    flat = out.tobytes()
    return [flat[b * stride : b * stride + int(lens[b])].decode("ascii")
            for b in range(B)]


def pack_2bit_rows(codes: np.ndarray) -> Optional[np.ndarray]:
    """2-bit pack (rows, T) uint8 -> (rows, ceil(T/16)) uint32 on host.

    Matches engine_pallas.pack_2bit; packing on host quarters the
    host->device transfer. None if the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    rows, T = codes.shape
    Tw = -(-T // 16)
    out = np.empty((rows, Tw), np.uint32)
    lib.pack_2bit_rows(codes.ctypes.data, rows, T, out.ctypes.data)
    return out


def _encode_strs_common(contents):
    """Concatenate sequences into one ASCII buffer + row starts/lens.

    Raises the same ValueError class as api.encode_np for non-ASCII input
    (UnicodeEncodeError is a ValueError)."""
    joined = "".join(contents).encode("ascii")
    lens = np.fromiter((len(c) for c in contents), np.int64,
                       len(contents)) if contents else np.empty(0, np.int64)
    starts = np.zeros(len(contents), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    buf = np.frombuffer(joined, np.uint8)
    return joined, buf, starts, lens


def _raise_bad(joined: bytes, bad_pos: int):
    raise ValueError(
        f"non-ACGT character in sequence: {chr(joined[bad_pos])!r}")


def encode_pack_strs(contents, width: int) -> Optional[np.ndarray]:
    """Fused ASCII -> 2-bit -> packed-word rows: (len(contents),
    ceil(width/16)) uint32, one C++ pass (ascii_to_zero_based_string +
    2-bit packing, genasm_cpu.cpp:462-493 / genasm_gpu.cu:640-685, fused).
    None if no native backend is available; ValueError on non-ACGT.

    Fast path: the _scroogext extension reads each str's buffer in place
    (no join/encode copies — those dominated host prep at headline batch
    sizes). Fallback: ctypes library over one joined ASCII buffer."""
    Pw = -(-width // 16)
    ext = get_ext()
    if ext is not None:
        out = np.empty((len(contents), Pw), np.uint32)
        ext.encode_pack_into(contents, Pw, out.ctypes.data)
        return out
    lib = get_lib()
    if lib is None:
        return None
    joined, buf, starts, lens = _encode_strs_common(contents)
    out = np.empty((len(contents), Pw), np.uint32)
    bad = np.zeros(1, np.int64)
    rc = lib.encode_pack_rows(buf.ctypes.data, starts.ctypes.data,
                              lens.ctypes.data, len(contents), Pw,
                              out.ctypes.data, bad.ctypes.data)
    if rc != 0:
        _raise_bad(joined, int(bad[0]))
    return out


def encode_strs(contents, width: int) -> Optional[np.ndarray]:
    """ASCII -> 2-bit code rows (len(contents), width) uint8, zero-padded,
    one C++ pass. None if no native backend is available."""
    ext = get_ext()
    if ext is not None:
        out = np.empty((len(contents), width), np.uint8)
        ext.encode_into(contents, width, out.ctypes.data)
        return out
    lib = get_lib()
    if lib is None:
        return None
    joined, buf, starts, lens = _encode_strs_common(contents)
    out = np.empty((len(contents), width), np.uint8)
    bad = np.zeros(1, np.int64)
    rc = lib.encode_rows(buf.ctypes.data, starts.ctypes.data,
                         lens.ctypes.data, len(contents), width,
                         out.ctypes.data, bad.ctypes.data)
    if rc != 0:
        _raise_bad(joined, int(bad[0]))
    return out


def format_tokens(tokens: np.ndarray, totals: np.ndarray
                  ) -> Optional[List[str]]:
    """CIGAR token stream -> strings (token format: ops/tokens.py).

    tokens: (B, capT) uint8 LANE-MAJOR (lane b's tokens contiguous);
    totals: (B,) token counts. Result strings are built directly as
    PyUnicode objects. None if the extension is unavailable (callers fall
    back to the run paths)."""
    ext = get_ext()
    if ext is None:
        return None
    tokens = np.ascontiguousarray(tokens, np.uint8)
    totals = np.ascontiguousarray(totals, np.int32)
    B, capT = tokens.shape
    return ext.format_tokens(tokens.ctypes.data, capT, B, totals.ctypes.data)


def tokens_to_runs(tokens: np.ndarray, totals: np.ndarray,
                   out: np.ndarray = None, counts: np.ndarray = None):
    """CIGAR token stream (B, capT) LANE-MAJOR -> (flat uint16 runs,
    per-lane run counts).

    Lane b's runs are contiguous at [cumsum(counts)[b-1], cumsum(counts)[b])
    — the return_packed layout. None if the extension is unavailable.

    ``out``/``counts``: optional preallocated destinations (out must have
    room for 2*sum(min(totals, capT)) runs, counts for B lanes) — the
    chunked consumer decodes straight into one batch-wide buffer at a
    running offset instead of allocating ~16 MB per chunk and
    concatenating at the end."""
    ext = get_ext()
    if ext is None:
        return None
    tokens = np.ascontiguousarray(tokens, np.uint8)
    totals = np.ascontiguousarray(totals, np.int32)
    B, capT = tokens.shape
    # each token decodes to at most 2 runs
    bound = 2 * int(np.minimum(totals, capT).sum())
    if out is None:
        out = np.empty(bound, np.uint16)
    else:
        assert out.flags.c_contiguous and out.dtype == np.uint16
        assert len(out) >= bound
    if counts is None:
        counts = np.empty(B, np.int64)
    else:
        assert counts.flags.c_contiguous and counts.dtype == np.int64
        assert len(counts) >= B
    n = ext.tokens_to_runs(tokens.ctypes.data, capT, B, totals.ctypes.data,
                           out.ctypes.data, counts.ctypes.data)
    return out[:n], counts[:B]


def scatter_runs(flat: np.ndarray, offs: np.ndarray, idx: np.ndarray,
                 lens: np.ndarray, out: np.ndarray,
                 out_offs: np.ndarray) -> bool:
    """Permutation-copy packed runs into their final pair order (the
    PackedAlignments assembly step). Returns False if unavailable."""
    ext = get_ext()
    if ext is None:
        return False
    flat = np.ascontiguousarray(flat, np.uint16)
    offs = np.ascontiguousarray(offs, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out_offs = np.ascontiguousarray(out_offs, np.int64)
    assert out.dtype == np.uint16 and out.flags.c_contiguous
    ext.scatter_runs(flat.ctypes.data, offs.ctypes.data, idx.ctypes.data,
                     len(idx), lens.ctypes.data, out.ctypes.data,
                     out_offs.ctypes.data)
    return True


def extract_runs(entries: np.ndarray,
                 totals: np.ndarray) -> Optional[np.ndarray]:
    """Lane-major flat extraction of a compacted (cap, B) run buffer.

    entries: (cap, B) uint16 (op << 12 | count) or uint8 (op << 6 | count,
    converted during extraction); totals: (B,) valid-run counts. Returns
    one uint16 array holding every lane's valid runs contiguously (lane b
    at [cumsum(totals)[b-1], cumsum(totals)[b])), or None if the native
    library is unavailable (caller falls back to the numpy gather)."""
    lib = get_lib()
    if lib is None:
        return None
    if entries.dtype == np.uint8:
        fn = lib.extract_runs8
    elif entries.dtype == np.uint16:
        fn = lib.extract_runs
    else:
        return None
    entries = np.ascontiguousarray(entries)
    totals = np.ascontiguousarray(totals, np.int32)
    cap, B = entries.shape
    offs = np.zeros(B, np.int64)
    np.cumsum(np.minimum(totals[:-1], cap), out=offs[1:])
    n = int(offs[-1]) + int(min(int(totals[-1]), cap)) if B else 0
    out = np.empty(n, np.uint16)
    fn(entries.ctypes.data, cap, B, totals.ctypes.data, offs.ctypes.data,
       out.ctypes.data)
    return out


def affine_scores(entries: np.ndarray, totals: np.ndarray,
                  match: int = 2, mismatch: int = 4, gap_open: int = 4,
                  gap_extend: int = 2) -> Optional[np.ndarray]:
    """Affine-gap scores of packed runs; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    entries = np.ascontiguousarray(entries, np.uint16)
    totals = np.ascontiguousarray(totals, np.int32)
    cap, B = entries.shape
    out = np.empty(B, np.int64)
    lib.affine_scores(entries.ctypes.data, cap, B, totals.ctypes.data,
                      match, mismatch, gap_open, gap_extend, out.ctypes.data)
    return out


# ---------------------------------------------------------------------------
# Native file parsers (io_parsers.cpp) — the reference's C++ I/O layer role
# (util.cpp:45-157). scrooge_tpu.io tries these first and falls back to
# its pure-Python parsers (identical semantics, pinned by tests).

_SRC_IO = os.path.join(_DIR, "io_parsers.cpp")
_SO_IO = os.path.join(_DIR, "_io_parsers.so")
_io_lib = None
_io_tried = False


def get_io_lib():
    global _io_lib, _io_tried
    with _lock:
        if _io_tried:
            return _io_lib
        _io_tried = True
        path = _build_one(_SRC_IO, _SO_IO)
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        for fn in (lib.fasta_parse, lib.fastq_parse):
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_int64]
        _io_lib = lib
        return _io_lib


def _read_file_bytes(path) -> Optional[bytes]:
    """File image for the native parsers, or None for non-ASCII files.

    The parsers index into the byte image; multi-byte characters would
    break those offsets as str indices, so non-ASCII input (vanishingly
    rare in FASTA/FASTQ) falls back to the Python parsers, which handle
    it with ordinary text-mode semantics."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw and int(np.frombuffer(raw, np.uint8).max()) >= 128:
        return None
    return raw


def parse_fasta(path):
    """FASTA sequences via the native parser, or None if unavailable.
    Byte-identical to io.read_fasta's Python parsing (pinned in
    tests/test_native.py). Two native passes: count, then fill."""
    lib = get_io_lib()
    if lib is None:
        return None
    from ..datamodel import Sequence

    raw = _read_file_bytes(path)
    if raw is None:
        return None
    n = len(raw)
    if n == 0:
        return []
    buf = np.frombuffer(raw, np.uint8)
    cap = int(lib.fasta_parse(buf.ctypes.data, n, None, None, None, None, 0))
    if cap == 0:
        return []
    content = np.empty(n, np.uint8)
    cends = np.empty(cap, np.int64)
    dstarts = np.empty(cap, np.int64)
    dends = np.empty(cap, np.int64)
    cnt = lib.fasta_parse(buf.ctypes.data, n, content.ctypes.data,
                          cends.ctypes.data, dstarts.ctypes.data,
                          dends.ctypes.data, cap)
    if cnt < 0:
        return None
    cstr = content[: int(cends[cnt - 1])].tobytes().decode("ascii")
    rstr = raw.decode("ascii")  # ASCII guaranteed by _read_file_bytes
    ce = cends[:cnt].tolist()
    ds = dstarts[:cnt].tolist()
    de = dends[:cnt].tolist()
    out, prev = [], 0
    for i in range(cnt):
        out.append(Sequence(rstr[ds[i] : de[i]], cstr[prev : ce[i]]))
        prev = ce[i]
    return out


def parse_fastq(path):
    """FASTQ reads via the native parser, or None if unavailable."""
    lib = get_io_lib()
    if lib is None:
        return None
    from ..datamodel import Read

    raw = _read_file_bytes(path)
    if raw is None:
        return None
    n = len(raw)
    if n == 0:
        return []
    buf = np.frombuffer(raw, np.uint8)
    cap = int(lib.fastq_parse(buf.ctypes.data, n, None, None, None, None, 0))
    if cap == 0:
        return []
    content = np.empty(n, np.uint8)
    cends = np.empty(cap, np.int64)
    descs = np.empty(n, np.uint8)
    dends = np.empty(cap, np.int64)
    cnt = lib.fastq_parse(buf.ctypes.data, n, content.ctypes.data,
                          cends.ctypes.data, descs.ctypes.data,
                          dends.ctypes.data, cap)
    if cnt < 0:
        return None
    cstr = content[: int(cends[cnt - 1])].tobytes().decode("ascii")
    dstr = descs[: int(dends[cnt - 1])].tobytes().decode("ascii")
    ce = cends[:cnt].tolist()
    de = dends[:cnt].tolist()
    out, cprev, dprev = [], 0, 0
    for i in range(cnt):
        out.append(Read(description=dstr[dprev : de[i]],
                        content=cstr[cprev : ce[i]]))
        cprev, dprev = ce[i], de[i]
    return out
