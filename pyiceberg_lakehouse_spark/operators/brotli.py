"""Brotli (RFC 7932) decompression via the system libbrotlidec.

"br" is the second-most-common HTTP content coding in real crawls after
gzip. Unlike the from-scratch codecs in this package, Brotli decode
binds the SYSTEM library through ctypes — the same posture as using
stdlib zlib/lzma/bz2 (also C libraries): a standard codec consumed
through a stable C ABI, not engine semantics. The binding uses the
streaming one-shot API (BrotliDecoderDecompressStream) with explicit
output-cap and trailing-garbage checks; if the library is absent the
module degrades to the previous honest NotImplementedError gate, so
environments without libbrotli behave exactly as before.

tests/test_brotli.py round-trips frames produced by the system
libbrotlienc across quality levels and window sizes.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_LIB = None
_LOAD_ERR: str | None = None


def _load():
    global _LIB, _LOAD_ERR
    if _LIB is not None or _LOAD_ERR is not None:
        return _LIB
    candidates = []
    found = ctypes.util.find_library("brotlidec")
    if found:
        candidates.append(found)
    candidates += ["libbrotlidec.so.1", "libbrotlidec.so"]
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _LIB = lib
            return lib
        except OSError:
            continue
    _LOAD_ERR = "no libbrotlidec shared library found"
    return None


def available() -> bool:
    return _load() is not None


# BrotliDecoderResult values
_ERROR, _SUCCESS, _NEEDS_MORE_INPUT, _NEEDS_MORE_OUTPUT = 0, 1, 2, 3


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """One complete Brotli stream -> bytes. Raises ValueError on corrupt
    or truncated input and on trailing garbage; NotImplementedError when
    no system libbrotlidec exists (the prior honest gate)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            f"Content-Encoding br is not supported here ({_LOAD_ERR}; "
            "refusing rather than emitting compressed bytes)"
        )
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise MemoryError("BrotliDecoderCreateInstance failed")
    try:
        src = (ctypes.c_ubyte * max(len(data), 1)).from_buffer_copy(
            data or b"\x00"
        )
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(src, ctypes.POINTER(ctypes.c_ubyte))
        out = bytearray()
        bufsize = 1 << 16
        buf = (ctypes.c_ubyte * bufsize)()
        while True:
            avail_out = ctypes.c_size_t(bufsize)
            next_out = ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte))
            res = lib.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out),
                None,
            )
            out += bytes(buf[: bufsize - avail_out.value])
            if len(out) > max_output:
                raise ValueError("brotli output exceeds the allowed maximum")
            if res == _SUCCESS:
                if avail_in.value:
                    raise ValueError(
                        f"{avail_in.value} trailing bytes after the brotli"
                        " stream"
                    )
                return bytes(out)
            if res == _NEEDS_MORE_OUTPUT:
                continue
            if res == _NEEDS_MORE_INPUT:
                raise ValueError("truncated brotli stream")
            raise ValueError("corrupt brotli stream")
    finally:
        lib.BrotliDecoderDestroyInstance(state)
