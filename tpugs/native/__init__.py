"""Native (C++) host-runtime components, loaded via ctypes.

The reference's host runtime leans on compiled extensions
(pycolmap_scene_manager for COLMAP parsing, torch DataLoader workers);
tpugs keeps the same split — JAX/Pallas on device, C++ for the
host-side hot paths — without requiring a build step: every native
entry point has a pure-Python fallback, and the shared library is
(re)compiled on demand with g++ when the toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scene_io.cc")
_LIB = os.path.join(
    _DIR, f"_scene_io_py{sys.version_info.major}{sys.version_info.minor}.so"
)

_lock = threading.Lock()
_lib = None
_load_failed = False


def _compile() -> bool:
    """Build the shared library; returns True on success."""
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB + ".tmp", _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
    except (OSError, subprocess.SubprocessError):
        return False
    os.replace(_LIB + ".tmp", _LIB)
    return True


def load() -> "ctypes.CDLL | None":
    """The scene_io library, compiling it if stale; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            stale = (not os.path.exists(_LIB)
                     or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
            if stale and not _compile():
                _load_failed = True
                return None
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        _decorate(lib)
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _decorate(lib) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u64 = ctypes.c_uint64
    vp = ctypes.c_void_p
    # Every length crossing the boundary must be declared c_uint64:
    # ctypes' default int conversion truncates to a 32-bit C int, which
    # breaks files >= 2 GiB (exactly the scale this module exists for).
    lib.colmap_points3d_count.argtypes = [u8p, u64, u64p, u64p]
    lib.colmap_points3d_count.restype = ctypes.c_int
    lib.colmap_points3d_parse.argtypes = [
        u8p, u64, vp, vp, vp, vp, vp, vp, vp]
    lib.colmap_points3d_parse.restype = ctypes.c_int
    lib.colmap_images_count.argtypes = [u8p, u64, u64p, u64p, u64p]
    lib.colmap_images_count.restype = ctypes.c_int
    lib.colmap_images_parse.argtypes = [
        u8p, u64, vp, vp, vp, vp, ctypes.c_char_p, vp, vp, vp, vp]
    lib.colmap_images_parse.restype = ctypes.c_int
    lib.colmap_points3d_size.argtypes = [u64, u64]
    lib.colmap_points3d_size.restype = u64
    lib.colmap_points3d_write.argtypes = [
        u64, vp, vp, vp, vp, vp, vp, vp, vp]
    lib.colmap_points3d_write.restype = ctypes.c_int
