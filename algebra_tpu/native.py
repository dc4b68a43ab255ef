"""ctypes bindings for the native host codec (native/ark_codec.cpp).

Provides bulk ark-serialize wire-format conversion and a fast CPU
Montgomery oracle.  Falls back to numpy/python implementations when the
shared library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libark_codec.so")
    if not os.path.exists(so):
        src = os.path.join(root, "native", "ark_codec.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["sh", os.path.join(root, "native", "build.sh")],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    st = ctypes.c_size_t
    lib.ark_pack_le.argtypes = [u32p, st, st, u8p, st]
    lib.ark_unpack_le.argtypes = [u8p, st, st, u32p, st]
    lib.ark_apply_flags.argtypes = [u8p, st, st, u8p]
    lib.ark_strip_flags.argtypes = [u8p, st, st, ctypes.c_int, u8p]
    lib.ark_mont_mul_batch.argtypes = [u32p, u32p, u32p, st, st, u32p,
                                       ctypes.c_uint32]
    _LIB = lib
    return _LIB


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_le(limbs: np.ndarray, stride: int) -> np.ndarray:
    """[n, L] uint32 16-bit limbs -> [n, stride] LE bytes."""
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n, L = limbs.shape
    out = np.zeros((n, stride), np.uint8)
    lib = _lib()
    if lib is not None:
        lib.ark_pack_le(_u32p(limbs), n, L, _u8p(out), stride)
        return out
    # numpy fallback
    nb = min(stride, 2 * L)
    b = np.zeros((n, 2 * L), np.uint8)
    b[:, 0::2] = (limbs & 0xFF).astype(np.uint8)
    b[:, 1::2] = ((limbs >> 8) & 0xFF).astype(np.uint8)
    out[:, :nb] = b[:, :nb]
    return out


def unpack_le(data: np.ndarray, L: int) -> np.ndarray:
    """[n, stride] LE bytes -> [n, L] uint32 16-bit limbs."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n, stride = data.shape
    out = np.zeros((n, L), np.uint32)
    lib = _lib()
    if lib is not None:
        lib.ark_unpack_le(_u8p(data), n, stride, _u32p(out), L)
        return out
    nb = min(stride, 2 * L)
    b = np.zeros((n, 2 * L), np.uint8)
    b[:, :nb] = data[:, :nb]
    out[:] = b[:, 0::2].astype(np.uint32) | (b[:, 1::2].astype(np.uint32) << 8)
    return out


def apply_flags(buf: np.ndarray, flags: np.ndarray) -> np.ndarray:
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    flags = np.ascontiguousarray(flags, dtype=np.uint8)
    n, stride = buf.shape
    lib = _lib()
    if lib is not None:
        lib.ark_apply_flags(_u8p(buf), n, stride, _u8p(flags))
        return buf
    buf[:, -1] |= flags
    return buf


def strip_flags(buf: np.ndarray, flag_bits: int):
    buf = np.ascontiguousarray(buf, dtype=np.uint8).copy()
    n, stride = buf.shape
    flags = np.zeros((n,), np.uint8)
    lib = _lib()
    if lib is not None:
        lib.ark_strip_flags(_u8p(buf), n, stride, flag_bits, _u8p(flags))
        return buf, flags
    mask = (0xFF << (8 - flag_bits)) & 0xFF
    flags[:] = buf[:, -1] & mask
    buf[:, -1] &= ~mask & 0xFF
    return buf, flags


def mont_mul_batch(a: np.ndarray, b: np.ndarray, p_limbs: np.ndarray,
                   inv16: int) -> np.ndarray:
    """CPU Montgomery product oracle over [n, L] limb arrays."""
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    p_limbs = np.ascontiguousarray(p_limbs, dtype=np.uint32)
    n, L = a.shape
    out = np.zeros_like(a)
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/build.sh")
    lib.ark_mont_mul_batch(_u32p(a), _u32p(b), _u32p(out), n, L,
                           _u32p(p_limbs), inv16)
    return out


def available() -> bool:
    return _lib() is not None
