"""ctypes bindings for the native C++ grid router (native/router.cpp).

Builds the shared library on first use if the toolchain is available;
maps/routing.RoadRouter uses this as the fast path and falls back to
scipy's csgraph Dijkstra otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
  global _LIB, _TRIED
  if _LIB is not None or _TRIED:
    return _LIB
  _TRIED = True
  so = os.path.join(NATIVE_DIR, "librouter.so")
  if not os.path.exists(so):
    try:
      subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                     capture_output=True)
    except Exception:
      return None
  try:
    lib = ctypes.CDLL(so)
  except OSError:
    return None
  lib.route_grid.restype = ctypes.c_int32
  lib.route_grid.argtypes = [
      ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
      ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
      ctypes.c_float, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
  _LIB = lib
  return lib


def available() -> bool:
  return _load() is not None


def route_grid(grid: np.ndarray, penalty: np.ndarray, start: int,
               goal: int, cell_m: float, max_path: int = 65536):
  """A* path over the occupancy grid. Returns int32 cell indices
  (start..goal) or None if unreachable / library unavailable."""
  lib = _load()
  if lib is None:
    return None
  g = np.ascontiguousarray(grid.astype(np.uint8))
  p = np.ascontiguousarray(penalty.astype(np.float32))
  out = np.empty((max_path,), np.int32)
  n = lib.route_grid(
      g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      grid.shape[0], grid.shape[1], int(start), int(goal),
      float(cell_m), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      max_path)
  if n <= 0:
    return None
  return out[:n].copy()
