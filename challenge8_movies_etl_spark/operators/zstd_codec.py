"""Zstandard codec via a ctypes binding to the SYSTEM libzstd.

Modern crawl dumps (Common Crawl since 2024) ship zstd, but this
environment has no python `zstandard` wheel and python 3.11's stdlib
has no zstd module. The shared library itself IS present
(libzstd.so.1, part of the OS toolchain), so the honest dependency-
light path is a ctypes binding to the public Zstandard one-shot C API
(facebook/zstd `zstd.h`: ZSTD_compress / ZSTD_decompress /
ZSTD_compressBound / ZSTD_getFrameContentSize / ZSTD_isError) — real
frames, real xxhash integrity, readable by any zstd implementation.

Absent library → NotImplementedError at call time (honest-stub
policy), never a fake passthrough. The binding is loaded lazily and
per-process, so Python UDF workers each bind their own handle.
"""

from __future__ import annotations

import ctypes
import ctypes.util

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # frame magic 0xFD2FB528, LE

_CONTENTSIZE_UNKNOWN = 2**64 - 1
_CONTENTSIZE_ERROR = 2**64 - 2

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = ctypes.util.find_library("zstd")
        if path is None:
            raise NotImplementedError(
                "zstd payloads need libzstd; neither the zstandard "
                "wheel nor a system libzstd is available here")
        lib = ctypes.CDLL(path)
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        lib.ZSTD_getFrameContentSize.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    return _lib


class _InBuffer(ctypes.Structure):
    _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


class _OutBuffer(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


def zstd_available() -> bool:
    try:
        _load()
        return True
    except NotImplementedError:
        return False


def zstd_compress(data: bytes, level: int = 1) -> bytes:
    """One-shot compress into a standard zstd frame (content size is
    written into the frame header, so decompression needs no hint)."""
    lib = _load()
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(dst, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise ValueError(f"ZSTD_compress error code {n}")
    return dst.raw[:n]


def zstd_decompress(buf: bytes) -> bytes:
    """Decompress zstd frame(s). Fast path: single frame with the
    content size pledged in the header (our encoder writes it) →
    one-shot ZSTD_decompress into an exact buffer. Fallback for
    streamed frames without a pledged size (zstd CLI on stdin, many
    crawl writers): ZSTD_decompressStream chunk loop — also handles
    multi-frame concatenation, which real .zst shards use."""
    lib = _load()
    size = lib.ZSTD_getFrameContentSize(buf, len(buf))
    if size == _CONTENTSIZE_ERROR:
        raise ValueError("not a zstd frame (or corrupt frame header)")
    if size != _CONTENTSIZE_UNKNOWN:
        dst = ctypes.create_string_buffer(size) if size else b""
        n = lib.ZSTD_decompress(dst, size, buf, len(buf))
        if lib.ZSTD_isError(n):
            raise ValueError(f"ZSTD_decompress error code {n}")
        if n != size:
            raise ValueError("zstd content size mismatch")
        return dst.raw[:n] if size else b""
    dctx = lib.ZSTD_createDCtx()
    try:
        out_cap = lib.ZSTD_DStreamOutSize()
        chunk = ctypes.create_string_buffer(out_cap)
        src = ctypes.create_string_buffer(buf, len(buf))
        ib = _InBuffer(ctypes.cast(src, ctypes.c_void_p), len(buf), 0)
        pieces = []
        ret = None
        while ib.pos < ib.size:
            ob = _OutBuffer(ctypes.cast(chunk, ctypes.c_void_p),
                            out_cap, 0)
            ret = lib.ZSTD_decompressStream(
                dctx, ctypes.byref(ob), ctypes.byref(ib))
            if lib.ZSTD_isError(ret):
                raise ValueError(
                    f"ZSTD_decompressStream error code {ret}")
            pieces.append(chunk.raw[:ob.pos])
        if ret not in (0, None):
            raise ValueError("truncated zstd stream")
        return b"".join(pieces)
    finally:
        lib.ZSTD_freeDCtx(dctx)
