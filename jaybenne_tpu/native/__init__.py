"""Native (C++) runtime components, loaded via ctypes.

``libjbmesh.so`` (built by ``native/build.sh``) provides the mesh-forest builder —
the host-side graph construction the reference delegates to Parthenon's C++ Mesh.
A pure-Python fallback with identical output lives in :mod:`jaybenne_tpu.mesh`.
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def load_mesh_builder():
    """Return the ctypes handle to libjbmesh, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libjbmesh.so")
    if not os.path.exists(path):
        # try to build it on the fly if a toolchain is present
        import subprocess

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "native", "build.sh",
        )
        if os.path.exists(script):
            try:
                subprocess.run(
                    ["bash", script], capture_output=True, timeout=120, check=True
                )
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.jb_mesh_query.restype = ctypes.c_int
    lib.jb_mesh_query.argtypes = [
        ctypes.c_int, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.jb_mesh_fill.restype = ctypes.c_int
    lib.jb_mesh_fill.argtypes = [
        ctypes.c_int, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB = lib
    return _LIB


def build_forest_native(ndim, nrb, gmin, gmax, regions):
    """Build (origin[B,3], size[B,3], level[B], lookup[ntz,nty,ntx], max_level) with
    the native builder, or return None if it is unavailable."""
    import numpy as np

    lib = load_mesh_builder()
    if lib is None:
        return None
    gmin_a = (ctypes.c_double * 3)(*[float(v) for v in gmin])
    gmax_a = (ctypes.c_double * 3)(*[float(v) for v in gmax])
    reg_flat = np.asarray(
        [[r.level, r.x1min, r.x1max, r.x2min, r.x2max, r.x3min, r.x3max] for r in regions],
        dtype=np.float64,
    ).reshape(-1)
    reg_ptr = (
        reg_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if reg_flat.size
        else ctypes.POINTER(ctypes.c_double)()
    )
    max_level = ctypes.c_int(0)
    n_blocks = lib.jb_mesh_query(
        ndim, nrb[0], nrb[1], nrb[2], gmin_a, gmax_a, len(regions), reg_ptr,
        ctypes.byref(max_level),
    )
    if n_blocks <= 0:
        return None
    ml = max_level.value
    nt = [nrb[d] * (2**ml if d < ndim else 1) for d in range(3)]
    origin = np.zeros((n_blocks, 3), dtype=np.float64)
    size = np.zeros((n_blocks, 3), dtype=np.float64)
    level = np.zeros((n_blocks,), dtype=np.int32)
    lookup = np.zeros((nt[2], nt[1], nt[0]), dtype=np.int32)
    rc = lib.jb_mesh_fill(
        ndim, nrb[0], nrb[1], nrb[2], gmin_a, gmax_a, len(regions), reg_ptr,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        level.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lookup.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        return None
    return origin, size, level, lookup, ml
