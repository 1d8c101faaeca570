"""ctypes bindings for the native C++ graph planner (csrc/graph_planner.cpp).

Loads csrc/libgraph_planner.so, building it with `make` on first use if the
toolchain is available.  All entry points have numpy-engine equivalents in
graph/engine.py (the behavioral reference); `available()` gates usage so
environments without a compiler keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libgraph_planner.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _CSRC], capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # ALWAYS invoke make: it is an mtime-driven no-op when the .so is
    # fresh, and it rebuilds after csrc edits that a pure existence check
    # would silently ignore (stale-binary trap).  Falls back to a stale
    # but existing .so if the toolchain is unavailable.
    _build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tm_abi_version.restype = ctypes.c_int
    if lib.tm_abi_version() != 1:
        return None
    lib.tm_associate_greedy.argtypes = [
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _f32p, _i64p]
    lib.tm_associate_teacher.argtypes = [
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _i64p, _i64p]
    lib.tm_associate_teacher.restype = ctypes.c_int
    lib.tm_associate_hungarian.argtypes = [
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _f32p, _i64p, ctypes.c_double]
    lib.tm_decode_plan.argtypes = [
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _i64p, _f32p,
        ctypes.c_int64, _i64p, ctypes.c_int64, ctypes.c_int64, _i64p]
    lib.tm_decode_plan.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _prep(g):
    return (np.ascontiguousarray(g.ts), np.ascontiguousarray(g.det_id),
            np.ascontiguousarray(g.past), np.ascontiguousarray(g.fut))


def associate_greedy(g, scores: np.ndarray) -> None:
    lib = _load()
    ts, det_id, past, fut = _prep(g)
    ass = np.empty(g.n, np.int64)
    lib.tm_associate_greedy(g.n, ts, det_id, past, fut,
                            np.ascontiguousarray(scores[:, 1]), ass)
    g.ass_id = ass


def associate_teacher_forced(g) -> None:
    lib = _load()
    ts, det_id, past, fut = _prep(g)
    ass = np.empty(g.n, np.int64)
    rc = lib.tm_associate_teacher(g.n, ts, det_id, past, fut,
                                  np.ascontiguousarray(g.label), ass)
    if rc != 0:
        raise AssertionError("more than one GT edge from same node")
    g.ass_id = ass


def associate_hungarian(g, scores: np.ndarray, threshold: float = 0.5) -> None:
    lib = _load()
    ts, det_id, past, fut = _prep(g)
    ass = np.empty(g.n, np.int64)
    lib.tm_associate_hungarian(g.n, ts, det_id, past, fut,
                               np.ascontiguousarray(scores[:, 0]), ass,
                               threshold)
    g.ass_id = ass


def decode_plan(g, scores: np.ndarray, y_out: np.ndarray, t_upto: int,
                ret_win: int) -> np.ndarray:
    """Chain-walk + deletion planning AFTER association; mutates y_out,
    returns kept-row indices (the engine applies them to its arrays)."""
    lib = _load()
    ts, det_id, past, fut = _prep(g)
    keep = np.empty(max(g.n, 1), np.int64)
    y_out_c = np.ascontiguousarray(y_out)
    kept = lib.tm_decode_plan(g.n, ts, det_id, np.ascontiguousarray(g.ass_id),
                              past, fut, np.ascontiguousarray(scores[:, 1]),
                              y_out.shape[0], y_out_c, t_upto, ret_win, keep)
    y_out[:] = y_out_c
    return keep[:kept].copy()
