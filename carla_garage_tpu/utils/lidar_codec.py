"""LiDAR point-cloud compression — the reference's laszip role.

The reference stores sweeps as .laz (laspy/laszip, data_agent.py:359-369,
~5x over raw). This wraps the native delta+zigzag+varint codec
(native/lidar_codec.cpp) through ctypes, with a pure-numpy fallback of the
SAME byte format, so `.lzc` files written anywhere decode everywhere.

File layout: [int64 n][f32 scale][3 x f32 axis offset][per-axis LEB128
varints of zigzag(quantized deltas)], points quantized at `scale` meters
(default 2 mm — below the LiDAR's own noise floor).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
DEFAULT_SCALE = 0.002

_LIB = None


def _lib():
  global _LIB
  if _LIB is None:
    so = os.path.join(NATIVE_DIR, "liblidar_codec.so")
    if not os.path.exists(so):
      src = os.path.join(NATIVE_DIR, "lidar_codec.cpp")
      if os.path.exists(src):
        import subprocess
        try:
          subprocess.run(["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
                          "-o", so, src], check=True, capture_output=True)
        except Exception:
          _LIB = False
          return None
    try:
      lib = ctypes.CDLL(so)
    except OSError:
      _LIB = False
      return None
    lib.lzc_compress.restype = ctypes.c_int64
    lib.lzc_compress.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.lzc_decompress.restype = ctypes.c_int64
    lib.lzc_decompress.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _LIB = lib
  return _LIB or None


def compress(points: np.ndarray, scale: float = DEFAULT_SCALE) -> bytes:
  """float32 [N,3] -> compressed bytes."""
  pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
  n = len(pts)
  lib = _lib()
  if lib is not None:
    cap = 24 + 15 * 3 * max(n, 1)
    out = np.empty((cap,), np.uint8)
    size = lib.lzc_compress(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if size > 0:
      return out[:size].tobytes()
  return _compress_py(pts, scale)


def decompress(data: bytes) -> np.ndarray:
  """compressed bytes -> float32 [N,3]."""
  n = int(np.frombuffer(data[:8], np.int64)[0])
  lib = _lib()
  if lib is not None:
    out = np.empty((n, 3), np.float32)
    buf = np.frombuffer(data, np.uint8)
    got = lib.lzc_decompress(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got == n:
      return out
  return _decompress_py(data)


def _quantize(pts: np.ndarray, scale: float):
  off = pts.min(0) if len(pts) else np.zeros((3,), np.float32)
  q = np.round((pts - off) / scale).astype(np.int64)
  return q, off.astype(np.float32)


def _compress_py(pts: np.ndarray, scale: float) -> bytes:
  q, off = _quantize(pts, scale)
  head = (np.int64(len(pts)).tobytes() +
          np.float32(scale).tobytes() + off.tobytes())
  body = bytearray()
  for a in range(3):
    d = np.diff(q[:, a], prepend=0)
    zz = ((d << 1) ^ (d >> 63)).astype(np.uint64)
    for v in zz:
      v = int(v)
      while v >= 0x80:
        body.append((v & 0x7f) | 0x80)
        v >>= 7
      body.append(v)
  return head + bytes(body)


def _decompress_py(data: bytes) -> np.ndarray:
  n = int(np.frombuffer(data[:8], np.int64)[0])
  scale = float(np.frombuffer(data[8:12], np.float32)[0])
  off = np.frombuffer(data[12:24], np.float32)
  buf = np.frombuffer(data, np.uint8)
  pos = 24
  out = np.empty((n, 3), np.float32)
  for a in range(3):
    prev = 0
    for i in range(n):
      v, shift = 0, 0
      while True:
        b = int(buf[pos]); pos += 1
        v |= (b & 0x7f) << shift
        if not b & 0x80:
          break
        shift += 7
      prev += (v >> 1) ^ -(v & 1)
      out[i, a] = prev * scale + off[a]
  return out
