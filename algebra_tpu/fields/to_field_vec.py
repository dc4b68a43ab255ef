"""Lowering values to vectors of prime-field elements.

Re-design of the reference's ``ToConstraintField``
(ff/src/to_field_vec.rs): flatten field elements, curve points, and byte
strings into base-prime-field element lists for constraint systems.
Host-side representation (ints / tuples), mirroring the reference's
element-wise semantics.
"""

from __future__ import annotations

from ..serialize import buffer_byte_size


def field_to_base_prime_elements(value):
    """Host tower value -> flat list of base prime-field ints
    (the reference's to_base_prime_field_elements iteration order:
    c0 first)."""
    if isinstance(value, int):
        return [value]
    out = []
    for coord in value:
        out.extend(field_to_base_prime_elements(coord))
    return out


def sw_affine_to_field_elements(pt, base_arity: int = 1):
    """SW affine point -> [x coords..., y coords..., infinity-bool]
    (short_weierstrass/affine.rs:382-395: x || y || infinity, with the
    identity represented as (0, 0, true))."""
    if pt is None:
        zero = 0 if base_arity == 1 else tuple([0] * base_arity)
        return field_to_base_prime_elements(zero) * 2 + [1]
    x, y = pt
    return (
        field_to_base_prime_elements(x) + field_to_base_prime_elements(y) + [0]
    )


def te_affine_to_field_elements(pt):
    """TE affine point -> [x coords..., y coords...]
    (twisted_edwards/affine.rs:339-350; identity = (0, 1))."""
    x, y = pt
    return field_to_base_prime_elements(x) + field_to_base_prime_elements(y)


def bool_to_field_elements(b: bool):
    """bool -> [1] or [0] (to_field_vec.rs bool impl)."""
    return [1 if b else 0]


def bytes_to_field_elements(data: bytes, modulus: int):
    """Pack bytes into field elements using the max whole-byte capacity
    (to_field_vec.rs [u8] impl semantics)."""
    capacity = (modulus.bit_length() - 1) // 8  # bytes per element
    out = []
    for off in range(0, len(data), capacity):
        chunk = data[off : off + capacity]
        out.append(int.from_bytes(chunk, "little"))
    return out
