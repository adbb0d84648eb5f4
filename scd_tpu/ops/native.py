"""ctypes bridge to the native C++ min-cost-flow solver.

Builds ``native/mincostflow.cc`` into a shared library on first use (g++,
no pybind11 in this image) and exposes:

- ``mcf_solve`` — generic min-cost-flow over an arc list;
- ``constrained_assign`` — the size-constrained nearest-centroid E-step used
  by ConSSKM (the reference's OR-Tools call path,
  ``sskm_constrained.py:331-356``), with the whole graph built natively so
  Python never materializes the n_X x K arc list.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "mincostflow.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libscdmcf.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.scd_mcf_solve.restype = ctypes.c_int
        lib.scd_mcf_solve.argtypes = [
            ctypes.c_int32, ctypes.c_int64, i32p, i32p, i32p, i32p, i32p,
            i64p, ctypes.c_int32]
        lib.scd_constrained_assign.restype = ctypes.c_int
        lib.scd_constrained_assign.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int32,
            ctypes.c_int32, i32p, ctypes.c_int32]
        _lib = lib
        return lib


def mcf_solve(tail: np.ndarray, head: np.ndarray, cap: np.ndarray,
              cost: np.ndarray, supply: np.ndarray,
              method: str = "cost_scaling") -> np.ndarray:
    """Solve min-cost flow; returns per-arc flow. Raises on infeasibility."""
    lib = _load()
    tail = np.ascontiguousarray(tail, np.int32)
    head = np.ascontiguousarray(head, np.int32)
    cap = np.ascontiguousarray(cap, np.int32)
    cost = np.ascontiguousarray(cost, np.int32)
    supply = np.ascontiguousarray(supply, np.int32)
    flow = np.zeros(len(tail), np.int64)
    rc = lib.scd_mcf_solve(len(supply), len(tail), tail, head, cap, cost,
                           supply, flow, 1 if method == "ssp" else 2)
    if rc != 0:
        raise RuntimeError(f"min-cost-flow solve failed (status {rc})")
    return flow


_ASSIGN_METHODS = {"auto": 0, "ssp": 1, "cost_scaling": 2, "sparse": 3}


def constrained_assign(costs: np.ndarray, size_min: int, size_max: int,
                       method: str = "auto") -> np.ndarray:
    """Labels minimizing total cost s.t. size_min <= |cluster| <= size_max.

    ``costs``: [n_x, n_c] int32 (pre-rounded; the ConSSKM caller rounds
    1000*sqrt(sqdist) like the reference, ``sskm_constrained.py:324``).

    ``method``: "auto" (default) solves large instances by exact sparse
    candidate-arc pricing — column generation over each point's nearest
    clusters with a reduced-cost optimality certificate against the full
    arc set — and small ones densely; "cost_scaling"/"ssp" force the dense
    solvers; "sparse" forces the pricing path (tests).
    """
    lib = _load()
    costs = np.ascontiguousarray(costs, np.int32)
    n_x, n_c = costs.shape
    labels = np.zeros(n_x, np.int32)
    rc = lib.scd_constrained_assign(n_x, n_c, costs, size_min, size_max,
                                    labels, _ASSIGN_METHODS.get(method, 0))
    if rc == 2:
        raise ValueError(
            f"infeasible size constraints: n_x={n_x}, n_c={n_c}, "
            f"size_min={size_min}, size_max={size_max}")
    if rc != 0:
        raise RuntimeError(f"constrained assignment failed (status {rc})")
    return labels
