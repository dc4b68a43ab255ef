"""expand_message_xmd / expand_message_xof (IETF hash-to-curve draft §5.3).

Host-side (hashlib) implementation of the reference's expander
(ff/src/fields/field_hashers/expander/mod.rs:19-50+), including the
long-DST hashing rule (DST longer than 255 bytes is replaced by
H("H2C-OVERSIZE-DST-" || DST)).
"""

from __future__ import annotations

import hashlib

MAX_DST_LENGTH = 255
LONG_DST_PREFIX = b"H2C-OVERSIZE-DST-"


def _dst_prime(dst: bytes, hash_name: str) -> bytes:
    if len(dst) > MAX_DST_LENGTH:
        h = hashlib.new(hash_name)
        h.update(LONG_DST_PREFIX)
        h.update(dst)
        dst = h.digest()
    return dst + bytes([len(dst)])


def expand_message_xmd(
    msg: bytes, dst: bytes, len_in_bytes: int, hash_name: str = "sha256"
) -> bytes:
    h = hashlib.new(hash_name)
    b_in_bytes = h.digest_size
    r_in_bytes = h.block_size
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255:
        raise ValueError("len_in_bytes too large for expand_message_xmd")
    dst_prime = _dst_prime(dst, hash_name)

    z_pad = b"\x00" * r_in_bytes
    l_i_b = len_in_bytes.to_bytes(2, "big")
    h0 = hashlib.new(hash_name)
    h0.update(z_pad + msg + l_i_b + b"\x00" + dst_prime)
    b0 = h0.digest()

    hi = hashlib.new(hash_name)
    hi.update(b0 + b"\x01" + dst_prime)
    b_prev = hi.digest()
    out = b_prev
    for i in range(2, ell + 1):
        hi = hashlib.new(hash_name)
        hi.update(bytes(a ^ b for a, b in zip(b0, b_prev)) + bytes([i]) + dst_prime)
        b_prev = hi.digest()
        out += b_prev
    return out[:len_in_bytes]


def expand_message_xof(
    msg: bytes, dst: bytes, len_in_bytes: int, xof_name: str = "shake_128"
) -> bytes:
    """XOF variant (ExpanderXof): H(msg || l_i_b || DST_prime)."""
    dst_prime = _dst_prime(dst, xof_name)
    x = hashlib.new(xof_name)
    x.update(msg + len_in_bytes.to_bytes(2, "big") + dst_prime)
    return x.digest(len_in_bytes)
