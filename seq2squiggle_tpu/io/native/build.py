"""Lazy ctypes build/load of the native codec library.

The .so is compiled on first use with the system g++ (no pybind11/cffi
needed — the API is plain C buffers) and cached next to the user cache.
Absence of a toolchain degrades gracefully: callers fall back to the
vectorised numpy codec in io/slow5.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger("seq2squiggle_tpu")

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "slow5_codec.cc")


def _isa_tag() -> str:
    """Host/ISA identifier folded into the cache key: the build uses
    -march=native, so a cached AVX-512 binary must never be loaded on an
    older CPU sharing the same home directory (SIGILL, not a fallback)."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:8]


def _cache_path() -> str:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    d = os.path.join(os.path.expanduser("~"), ".cache", "seq2squiggle_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"libslow5codec-{digest}-{_isa_tag()}.so")


def _compile(out_path: str, allow_zstd: bool = True) -> bool:
    # -march=native + -fopenmp-simd let gcc vectorize the threefry rounds
    # and the branch-free uniform->normal transform (AVX-512 on this host);
    # zstd enables the batch record encoder's method 3. Each flag set drops
    # out gracefully on toolchains/sysroots that reject it (the ladder
    # retries without zstd, then without the ISA flags).
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
            "-o", out_path]
    ladders = [
        ["-march=native", "-fopenmp-simd", "-DS2S_HAVE_ZSTD", "-lz",
         "-lzstd"],
        ["-march=native", "-fopenmp-simd", "-lz"],
        ["-lz"],
    ]
    if not allow_zstd:
        ladders = [lad for lad in ladders if "-lzstd" not in lad]
    for extra in ladders:
        try:
            subprocess.run(base + extra, check=True, capture_output=True,
                           timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError) as exc:
            last_exc = exc
    logger.debug(f"native codec build failed ({last_exc}); using numpy codec")
    return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the native codec library, compiling on first use; None if
    unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _cache_path()
        if not os.path.exists(path):
            if not _compile(path):
                return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as exc:
            # A cached .so linked against -lzstd at build time fails to load
            # if libzstd.so has since vanished — and that would silently
            # disable ALL native fast paths (decode included). Rebuild once
            # without the optional zstd dependency before giving up.
            logger.debug(
                f"native codec load failed: {exc}; rebuilding without zstd"
            )
            try:
                os.remove(path)
            except OSError:
                pass
            if not _compile(path, allow_zstd=False):
                return None
            try:
                lib = ctypes.CDLL(path)
            except OSError as exc2:
                logger.debug(f"native codec load failed again: {exc2}")
                return None
        size_t = ctypes.c_size_t
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.svb_zd_max_size.restype = size_t
        lib.svb_zd_max_size.argtypes = [size_t]
        lib.svb_zd_encode.restype = size_t
        lib.svb_zd_encode.argtypes = [i16p, size_t, u8p]
        lib.svb_zd_decode.restype = size_t
        lib.svb_zd_decode.argtypes = [u8p, size_t, size_t, i16p]
        lib.zlib_compress_buf.restype = size_t
        lib.zlib_compress_buf.argtypes = [u8p, size_t, u8p, size_t,
                                          ctypes.c_int]
        lib.zlib_compress_bound.restype = size_t
        lib.zlib_compress_bound.argtypes = [size_t]
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        c_int = ctypes.c_int
        c_float = ctypes.c_float
        lib.delta_wire_unpack.restype = None
        lib.delta_wire_unpack.argtypes = [
            u8p, u8p, i16p, size_t, size_t, size_t, c_int, i16p,
        ]
        lib.event_wire_decode.restype = size_t
        lib.event_wire_decode.argtypes = [
            u8p, i16p, u8p, u8p, u8p, i16p, f32p, i32p,
            size_t, size_t, size_t, size_t,
            c_int, c_float, c_float, c_float, c_float, i16p, i32p,
        ]
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.ulp_event_wire_decode.restype = size_t
        lib.ulp_event_wire_decode.argtypes = [
            u8p, u16p, i8p, u8p, u8p, u8p, u16p, u8p, f32p, i32p,
            size_t, size_t, size_t, size_t, size_t, size_t, size_t,
            c_int, c_float, c_float, c_float, c_float, c_float, c_float,
            c_float, i16p, i32p,
        ]
        lib.threefry_normal_fill.restype = None
        lib.threefry_normal_fill.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, i32p, i32p,
            size_t, size_t, f32p,
        ]
        lib.ulp_event_wire_decode_fused.restype = size_t
        lib.ulp_event_wire_decode_fused.argtypes = [
            u8p, u16p, i8p, u8p, u8p, u8p, u16p, u8p,
            ctypes.c_uint32, ctypes.c_uint32, i32p, i32p,
            size_t, size_t, size_t, size_t, size_t, size_t, size_t,
            c_int, c_float, c_float, c_float, c_float, c_float, c_float,
            c_float, i16p, i32p,
        ]
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.blow5_have_zstd.restype = c_int
        lib.blow5_have_zstd.argtypes = []
        lib.blow5_encode_batch.restype = size_t
        lib.blow5_encode_batch.argtypes = [
            i16p, i64p, u8p, i64p, f64p, f64p, i32p, u64p,
            u8p, size_t, size_t,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            c_int, c_int, c_int, u8p, size_t,
        ]
        _LIB = lib
        logger.debug(f"native codec loaded: {path}")
        return _LIB
