"""ctypes bindings for the native C++ FASTX parser/encoder.

The shared library builds lazily (g++ -O3 into the package directory) on
first use and is cached; callers that can't build (no toolchain) fall back
to the numpy loader in io/fasta.py transparently via ``available()``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native" / "fastx.cpp"
_LIB = Path(__file__).parent / "native" / "libfastx.so"

_lib = None
_build_error: str | None = None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True, text=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.nthash_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p]
        lib.nthash_parser_open.restype = ctypes.c_void_p
        lib.nthash_parser_open.argtypes = [ctypes.c_char_p]
        lib.nthash_parser_close.argtypes = [ctypes.c_void_p]
        lib.nthash_parser_next_batch.restype = ctypes.c_int64
        lib.nthash_parser_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.nthash_parser_error.restype = ctypes.c_char_p
        lib.nthash_parser_error.argtypes = [ctypes.c_void_p]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        _build_error = getattr(e, "stderr", None) or str(e)
    return _lib


def available() -> bool:
    return _load() is not None


def encode(seq: bytes) -> np.ndarray:
    """ASCII bytes -> uint8 base codes via the native encoder."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty(len(seq), dtype=np.uint8)
    lib.nthash_encode(seq, len(seq), out.ctypes.data_as(ctypes.c_void_p))
    return out


class NativeFastxParser:
    """Streaming [B, L] code batches from a FASTA/FASTQ file (uncompressed).

    >>> with NativeFastxParser(path) as p:
    ...     for codes, lengths in p.batches(65536, 150):
    ...         ...
    """

    def __init__(self, path):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.nthash_parser_open(str(path).encode())
        if not self._h:
            raise FileNotFoundError(path)

    def close(self):
        if self._h:
            self._lib.nthash_parser_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def next_batch(self, max_reads: int, row_len: int):
        """Returns (codes [n, row_len] uint8, lengths [n] int64) or None at EOF."""
        codes = np.empty((max_reads, row_len), dtype=np.uint8)
        lengths = np.empty(max_reads, dtype=np.int64)
        n = self._lib.nthash_parser_next_batch(
            self._h, max_reads, row_len,
            codes.ctypes.data_as(ctypes.c_void_p),
            lengths.ctypes.data_as(ctypes.c_void_p),
        )
        if n < 0:
            raise ValueError(
                self._lib.nthash_parser_error(self._h).decode())
        if n == 0:
            return None
        return codes[:n], lengths[:n]

    def next_batch_into(self, out: np.ndarray) -> int:
        """Fill rows of a preallocated [max_reads, row_len] uint8 array;
        returns the number of reads produced (0 at EOF). Zero-copy row
        writes — the streaming front-end's hot path (io/stream.py)."""
        max_reads, row_len = out.shape
        lengths = np.empty(max_reads, dtype=np.int64)
        n = self._lib.nthash_parser_next_batch(
            self._h, max_reads, row_len,
            out.ctypes.data_as(ctypes.c_void_p),
            lengths.ctypes.data_as(ctypes.c_void_p),
        )
        if n < 0:
            raise ValueError(self._lib.nthash_parser_error(self._h).decode())
        return int(n)

    def batches(self, max_reads: int, row_len: int):
        while True:
            b = self.next_batch(max_reads, row_len)
            if b is None:
                return
            yield b
