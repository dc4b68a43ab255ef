"""hash_to_field (IETF hash-to-curve draft §5.2; the reference's
``DefaultFieldHasher``, ff/src/fields/field_hashers/mod.rs:41-105).

Host-side: produces host tower values (int for Fp, tuples for towers).
Element length L = ceil((ceil(log2(p)) + k) / 8) with security parameter
k = 128; each element is OS2IP(uniform bytes) mod p, big-endian, with the
extension coordinates drawn in order c0, c1, ...
"""

from __future__ import annotations

from .expander import expand_message_xmd

SEC_PARAM = 128


def hash_to_field(
    msg: bytes,
    dst: bytes,
    modulus: int,
    count: int,
    ext_degree: int = 1,
    hash_name: str = "sha256",
):
    """Returns ``count`` field elements; each is an int (ext_degree == 1)
    or a tuple of ``ext_degree`` ints."""
    L = (modulus.bit_length() + SEC_PARAM + 7) // 8
    len_in_bytes = count * ext_degree * L
    uniform = expand_message_xmd(msg, dst, len_in_bytes, hash_name)
    out = []
    for i in range(count):
        coords = []
        for j in range(ext_degree):
            off = (i * ext_degree + j) * L
            coords.append(int.from_bytes(uniform[off : off + L], "big") % modulus)
        out.append(coords[0] if ext_degree == 1 else tuple(coords))
    return out
