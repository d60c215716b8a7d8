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


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
             _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


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
