"""Native (C++) host-side helpers with pure-Python fallbacks.

Builds ``coloring.cpp`` lazily with the system ``g++`` into a shared library
loaded via ctypes (no pybind11 dependency; the compute path is XLA — this
tier covers host orchestration: constraint-graph coloring at scene build,
test oracles, replay tooling). Every entry point has a Python fallback so
the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_libsf_native.so")
_HASH = _SO + ".srchash"
_SRC = os.path.join(_HERE, "coloring.cpp")

_lib = None
_tried = False


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        # Staleness check by recorded source hash, not mtime: git checkouts
        # don't preserve mtimes, and a binary that doesn't match the source
        # on disk must never load silently. The .so is never committed
        # (gitignored) — it is always built locally from source.
        digest = _src_digest()
        recorded = None
        if os.path.exists(_HASH):
            with open(_HASH) as f:
                recorded = f.read().strip()
        if (not os.path.exists(_SO)) or recorded != digest:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            with open(_HASH, "w") as f:
                f.write(digest)
        lib = ctypes.CDLL(_SO)
        lib.sf_greedy_color.restype = ctypes.c_int32
        lib.sf_greedy_color.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sf_bruteforce_pairs.restype = ctypes.c_int64
        lib.sf_bruteforce_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.sf_max_abs_diff.restype = ctypes.c_float
        lib.sf_max_abs_diff.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[starframe_tpu.native] falling back to Python: {e}", file=sys.stderr)
        _lib = None
    return _lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def greedy_color(body_a, body_b, active=None, body_is_static=None, n_bodies=None):
    """Greedy-color a constraint graph so no two same-color constraints share
    a dynamic body. Returns (colors[n] int32, n_colors).

    Static bodies never conflict (their state is immutable under impulses),
    matching the solver's write-conflict semantics (SURVEY.md §5.2).
    """
    body_a = _as_i32(body_a)
    body_b = _as_i32(body_b)
    n = len(body_a)
    if n_bodies is None:
        n_bodies = int(max(body_a.max(initial=-1), body_b.max(initial=-1))) + 1
    active_u8 = np.ascontiguousarray(
        np.ones(n, np.uint8) if active is None else np.asarray(active, np.uint8)
    )
    static_u8 = np.ascontiguousarray(
        np.zeros(n_bodies, np.uint8) if body_is_static is None
        else np.asarray(body_is_static, np.uint8)
    )
    colors = np.zeros(n, np.int32)
    lib = _load()
    if lib is not None and n > 0:
        n_colors = lib.sf_greedy_color(
            _ptr(body_a, ctypes.c_int32), _ptr(body_b, ctypes.c_int32),
            np.int32(n), _ptr(active_u8, ctypes.c_uint8),
            _ptr(static_u8, ctypes.c_uint8), np.int32(n_bodies),
            _ptr(colors, ctypes.c_int32),
        )
        if n_colors >= 0:
            return colors, int(max(n_colors, 1))
    # Python fallback
    by_body: dict[int, list[int]] = {}
    n_colors = 1
    for i in range(n):
        if not active_u8[i]:
            colors[i] = 0
            continue
        used = set()
        for b in (int(body_a[i]), int(body_b[i])):
            if b < 0 or (0 <= b < n_bodies and static_u8[b]):
                continue
            for j in by_body.get(b, ()):
                used.add(int(colors[j]))
        c = 0
        while c in used:
            c += 1
        colors[i] = c
        n_colors = max(n_colors, c + 1)
        for b in (int(body_a[i]), int(body_b[i])):
            if b < 0 or (0 <= b < n_bodies and static_u8[b]):
                continue
            by_body.setdefault(b, []).append(i)
    return colors, n_colors


def bruteforce_pairs(lo, hi, active=None, body_idx=None, max_pairs=1 << 20):
    """O(n²) AABB pair oracle (C++ when available)."""
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    m = lo.shape[0]
    active_u8 = np.ascontiguousarray(
        np.ones(m, np.uint8) if active is None else np.asarray(active, np.uint8)
    )
    bidx = _as_i32(body_idx if body_idx is not None else -np.ones(m))
    lib = _load()
    if lib is not None:
        out_a = np.zeros(max_pairs, np.int32)
        out_b = np.zeros(max_pairs, np.int32)
        count = lib.sf_bruteforce_pairs(
            _ptr(lo, ctypes.c_float), _ptr(hi, ctypes.c_float), np.int32(m),
            _ptr(active_u8, ctypes.c_uint8), _ptr(bidx, ctypes.c_int32),
            _ptr(out_a, ctypes.c_int32), _ptr(out_b, ctypes.c_int32),
            np.int64(max_pairs),
        )
        k = min(count, max_pairs)
        return out_a[:k].copy(), out_b[:k].copy(), int(count)
    # Python fallback
    pairs = []
    for i in range(m):
        if not active_u8[i]:
            continue
        for j in range(i + 1, m):
            if not active_u8[j]:
                continue
            if bidx[i] == bidx[j] and bidx[i] >= 0:
                continue
            if (lo[i] <= hi[j]).all() and (lo[j] <= hi[i]).all():
                pairs.append((i, j))
    a = np.array([p[0] for p in pairs[:max_pairs]], np.int32)
    b = np.array([p[1] for p in pairs[:max_pairs]], np.int32)
    return a, b, len(pairs)


def max_abs_diff(a, b) -> float:
    a = np.ascontiguousarray(a, np.float32).ravel()
    b = np.ascontiguousarray(b, np.float32).ravel()
    assert a.shape == b.shape
    lib = _load()
    if lib is not None:
        return float(lib.sf_max_abs_diff(_ptr(a, ctypes.c_float), _ptr(b, ctypes.c_float), np.int64(a.size)))
    return float(np.max(np.abs(a - b))) if a.size else 0.0


def available() -> bool:
    return _load() is not None
