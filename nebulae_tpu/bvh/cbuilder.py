"""ctypes wrapper for the native C++ BVH builder (native/bvh_builder.cpp).

Falls back to the pure-numpy builder transparently; `build_bvh_fast` is the
entry the engine uses.  The native path builds Sponza-scale BVHs in tens of
milliseconds instead of tens of seconds.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from nebulae_tpu.bvh.builder import MAX_LEAF, FlatBVH, build_bvh

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnebulae_native.so"
_lib = None
_lib_tried = False


def _load_lib(auto_build: bool = True):
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = _NATIVE_DIR / "bvh_builder.cpp"
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and auto_build and (_NATIVE_DIR / "Makefile").exists():
        # The binary is NOT tracked in git (stale-binary hazard); it is built
        # on demand here and rebuilt whenever the source is newer.
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "-B"] if stale else ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.nebulae_build_bvh.restype = ctypes.c_int32
        lib.nebulae_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # tri_pos
            ctypes.c_int32,  # num_tris
            ctypes.c_int32,  # max_leaf
            ctypes.c_int32,  # max_nodes
            ctypes.POINTER(ctypes.c_float),  # node_lo
            ctypes.POINTER(ctypes.c_float),  # node_hi
            ctypes.POINTER(ctypes.c_int32),  # node_first
            ctypes.POINTER(ctypes.c_int32),  # node_count
            ctypes.POINTER(ctypes.c_int32),  # node_skip
            ctypes.POINTER(ctypes.c_int32),  # node_right
            ctypes.POINTER(ctypes.c_int32),  # tri_index
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def build_bvh_fast(tri_pos: np.ndarray, max_leaf: int = MAX_LEAF) -> FlatBVH:
    """Native-if-available BVH build with identical output layout."""
    lib = _load_lib()
    t = int(tri_pos.shape[0])
    if lib is None or t == 0:
        return build_bvh(tri_pos, max_leaf)
    tri = np.ascontiguousarray(tri_pos, np.float32)
    max_nodes = 2 * t + 1
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    node_first = np.empty(max_nodes, np.int32)
    node_count = np.empty(max_nodes, np.int32)
    node_skip = np.empty(max_nodes, np.int32)
    node_right = np.empty(max_nodes, np.int32)
    tri_index = np.empty(t, np.int32)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    n = lib.nebulae_build_bvh(
        p(tri, ctypes.c_float),
        t,
        max_leaf,
        max_nodes,
        p(node_lo, ctypes.c_float),
        p(node_hi, ctypes.c_float),
        p(node_first, ctypes.c_int32),
        p(node_count, ctypes.c_int32),
        p(node_skip, ctypes.c_int32),
        p(node_right, ctypes.c_int32),
        p(tri_index, ctypes.c_int32),
    )
    if n < 0:
        return build_bvh(tri_pos, max_leaf)
    return FlatBVH(
        node_lo[:n].copy(),
        node_hi[:n].copy(),
        node_first[:n].copy(),
        node_count[:n].copy(),
        node_skip[:n].copy(),
        node_right[:n].copy(),
        tri_index,
    )
