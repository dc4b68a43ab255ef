"""Host-side big-integer <-> limb-array conversion helpers.

This is the TPU-native analogue of the reference's ``BigInt<N>`` fixed-limb
integer (reference: ff/src/biginteger/mod.rs:27).  On TPU we represent a
multi-precision integer as an array of ``LIMB_BITS``-bit limbs stored in
``uint32`` lanes (little-endian limb order), so that limb products fit a
32-bit integer lane and carries can be resolved vectorically.  All *host*
computation (constant derivation, test oracles) uses arbitrary-precision
Python ints; these helpers convert between the two worlds.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def n_limbs_for_bits(bit_size: int) -> int:
    """Number of 16-bit limbs used for a field of the given modulus bit size.

    Chosen as 4x the number of 64-bit limbs the reference would use
    (reference: ff/src/biginteger/mod.rs), so that our Montgomery radix
    R = 2^(16*L) coincides bit-for-bit with the reference's R = 2^(64*N).
    """
    n64 = (bit_size + 63) // 64
    return 4 * n64


def int_to_limbs(x: int, n_limbs: int, dtype=np.uint32) -> np.ndarray:
    """Little-endian 16-bit limb decomposition of a nonnegative int."""
    if x < 0:
        raise ValueError("int_to_limbs requires a nonnegative integer")
    out = np.zeros((n_limbs,), dtype=dtype)
    for i in range(n_limbs):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    if x >> (LIMB_BITS * n_limbs):
        raise ValueError(f"{x} does not fit in {n_limbs} limbs")
    return out


def limbs_to_int(limbs) -> int:
    """Recompose a little-endian limb vector (1-D) into a Python int."""
    arr = np.asarray(limbs)
    if arr.ndim != 1:
        raise ValueError("limbs_to_int takes a single 1-D limb vector")
    x = 0
    for i, limb in enumerate(arr.tolist()):
        x |= int(limb) << (LIMB_BITS * i)
    return x


def batch_int_to_limbs(xs, n_limbs: int, dtype=np.uint32) -> np.ndarray:
    """Convert an iterable of ints to a LIMB-MAJOR [n_limbs, len(xs)] array.

    Bulk path: each int serializes to little-endian bytes (C-speed) and
    the whole buffer reinterprets as 16-bit limbs."""
    xs = list(xs)
    nb = 2 * n_limbs
    buf = b"".join(int(x).to_bytes(nb, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), n_limbs)
    return np.ascontiguousarray(arr.T).astype(dtype)


def batch_limbs_to_int(arr) -> list:
    """Convert a limb-major [n_limbs, *batch] array to a nested list of
    Python ints (a bare int for batch rank 0)."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        return limbs_to_int(arr)

    def rec(a):
        # a: [L, *batch]
        if a.ndim == 1:
            return limbs_to_int(a)
        return [rec(a[:, i]) for i in range(a.shape[1])]

    return rec(arr)


def int_to_bytes_le(x: int, n_bytes: int) -> bytes:
    return int(x).to_bytes(n_bytes, "little")


def bytes_le_to_int(b: bytes) -> int:
    return int.from_bytes(b, "little")


def bit_length(x: int) -> int:
    return int(x).bit_length()


def bits_le(x: int, n_bits: int) -> list:
    """Little-endian bit decomposition (length n_bits) of a host int."""
    return [(x >> i) & 1 for i in range(n_bits)]


def signed_naf(x: int) -> list:
    """Non-adjacent form digits (little-endian, values in {-1, 0, 1}).

    Mirrors the behaviour of the reference's ``find_wnaf`` with w=1
    (reference: ff/src/biginteger/mod.rs:701-708) for host-side fixed
    exponent unrolling (cyclotomic exponentiation, Miller loops).
    """
    digits = []
    while x != 0:
        if x & 1:
            d = 2 - (x % 4)  # 1 if x%4==1 else -1
            x -= d
        else:
            d = 0
        digits.append(d)
        x >>= 1
    return digits
