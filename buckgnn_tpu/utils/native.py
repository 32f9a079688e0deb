"""ctypes bindings for the C++ host-ETL kernels (cpp/native.cpp).

The library is compiled on first use with g++ into a per-user cache dir and
loaded via ctypes; every entry point has a pure-NumPy fallback so the
framework works without a toolchain. This fills the native-runtime role the
reference delegates to torch_scatter / PyG C++ ops and DataLoader collation
(SURVEY.md §2.1) — host-side graph ETL, not TPU compute.

Public API:
    shell_edges_native(quads, trias) -> (pairs [U,2], counts [U]) | None
    rcm_order(n_nodes, senders, receivers) -> perm  (perm[new] = old)
    band_fraction(senders, receivers, pos, n_nodes, tile, width) -> float
    available() -> bool
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "native.cpp")
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "BUCKGNN_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "buckgnn_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    lib_path = os.path.join(_cache_dir(), f"libbuckgnn_{tag}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)  # atomic under concurrent builders
    except (OSError, subprocess.SubprocessError):
        return None
    return lib_path


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BUCKGNN_DISABLE_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bg_shell_edges.restype = ctypes.c_int64
    lib.bg_shell_edges.argtypes = [i64p, ctypes.c_int64, i64p,
                                   ctypes.c_int64, i64p, i64p]
    lib.bg_rcm_order.restype = None
    lib.bg_rcm_order.argtypes = [ctypes.c_int64, i64p, i64p,
                                 ctypes.c_int64, i64p]
    lib.bg_band_count.restype = ctypes.c_int64
    lib.bg_band_count.argtypes = [i64p, i64p, ctypes.c_int64, i64p,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def shell_edges_native(quads, trias):
    """Unique sorted element-perimeter edge pairs + occurrence counts, or
    None when the native library is unavailable (caller falls back to the
    NumPy path in graph/build.py::shell_edges)."""
    lib = _load()
    if lib is None:
        return None
    q, t = _i64(quads).reshape(-1, 4) if len(quads) else _i64([]).reshape(0, 4), \
        _i64(trias).reshape(-1, 3) if len(trias) else _i64([]).reshape(0, 3)
    max_e = 4 * len(q) + 3 * len(t)
    pairs = np.empty((max(max_e, 1), 2), dtype=np.int64)
    counts = np.empty(max(max_e, 1), dtype=np.int64)
    n = lib.bg_shell_edges(_ptr(q), len(q), _ptr(t), len(t),
                           _ptr(pairs), _ptr(counts))
    return pairs[:n].copy(), counts[:n].copy()


def _rcm_order_numpy(n_nodes: int, senders, receivers) -> np.ndarray:
    """BFS-by-ascending-degree Cuthill-McKee, reversed. Pure-NumPy fallback
    mirroring cpp/native.cpp::bg_rcm_order."""
    s, r = _i64(senders), _i64(receivers)
    ok = (s >= 0) & (r >= 0) & (s < n_nodes) & (r < n_nodes) & (s != r)
    s, r = s[ok], r[ok]
    ss = np.concatenate([s, r])
    rr = np.concatenate([r, s])
    order_idx = np.lexsort((rr, ss))
    ss, rr = ss[order_idx], rr[order_idx]
    keep = np.ones(len(ss), dtype=bool)
    if len(ss):
        keep[1:] = (ss[1:] != ss[:-1]) | (rr[1:] != rr[:-1])
    ss, rr = ss[keep], rr[keep]
    deg = np.bincount(ss, minlength=n_nodes)
    offs = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(deg, out=offs[1:])
    visited = np.zeros(n_nodes, dtype=bool)
    order: list[int] = []
    for start in np.argsort(deg, kind="stable"):
        if visited[start]:
            continue
        visited[start] = True
        queue = [int(start)]
        head = 0
        while head < len(queue):
            v = queue[head]
            head += 1
            order.append(v)
            nb = rr[offs[v]:offs[v + 1]]
            nb = nb[~visited[nb]]
            visited[nb] = True
            nb = nb[np.argsort(deg[nb], kind="stable")]
            queue.extend(int(w) for w in nb)
    return np.asarray(order[::-1], dtype=np.int64)


def rcm_order(n_nodes: int, senders, receivers) -> np.ndarray:
    """Reverse Cuthill-McKee permutation; perm[new_index] = old_index."""
    lib = _load()
    if lib is None:
        return _rcm_order_numpy(n_nodes, senders, receivers)
    s, r = _i64(senders), _i64(receivers)
    perm = np.empty(n_nodes, dtype=np.int64)
    lib.bg_rcm_order(n_nodes, _ptr(s), _ptr(r), len(s), _ptr(perm))
    return perm


def band_fraction(senders, receivers, pos, n_nodes: int,
                  tile: int, width: int) -> float:
    """Fraction of edges landing in the banded slab under ordering `pos`
    (pos[old_index] = new position)."""
    s, r, p = _i64(senders), _i64(receivers), _i64(pos)
    if len(s) == 0:
        return 1.0
    lib = _load()
    if lib is not None:
        n = lib.bg_band_count(_ptr(s), _ptr(r), len(s), _ptr(p),
                              n_nodes, tile, width)
        return float(n) / float(len(s))
    slab = tile + width
    t = p[r] // tile
    start = np.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    k = p[s] - start
    return float(np.mean((k >= 0) & (k < slab)))
