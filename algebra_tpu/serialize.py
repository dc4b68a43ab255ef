"""Canonical serialization, byte-identical to the reference's ark-serialize.

Host-side encoders/decoders (pure Python ints / numpy) reproducing the
reference's wire format exactly (serialize/src/lib.rs:84,125,29-40):

  * little-endian limb/byte order everywhere;
  * a field element with flags occupies ``buffer_byte_size(MODULUS_BIT_SIZE
    + FLAG_BIT_SIZE)`` bytes with the flag bitmask OR'd into the MSBs of
    the final byte (ff/src/fields/models/fp/mod.rs:544-589);
  * extension fields serialize coordinate-by-coordinate with flags shaved
    into the LAST coordinate (quadratic_extension.rs:689-697);
  * SW points: compressed = x with 2-bit SWFlags; uncompressed = x plain +
    y with SWFlags; infinity = zero coordinates + infinity flag
    (short_weierstrass/mod.rs:122-199, serialization_flags.rs);
  * TE points: compressed = y with 1-bit TEFlags (x-sign); uncompressed =
    x plain + y plain (twisted_edwards/mod.rs:101-114);
  * "positivity": an element is positive iff  e <= -e  in the canonical
    integer ordering; extensions order by (c_last, ..., c0) lexicographic
    (fp/mod.rs:372-374, quadratic_extension.rs:446-455).

Values use the host tower representation (int for prime fields, nested
tuples for extensions) shared with the field-compiler oracles.
"""

from __future__ import annotations

from dataclasses import dataclass

from .fields.spec import FieldSpec

# flag layouts (serialize/src/flags.rs, ec serialization_flags.rs)
SW_FLAG_BITS = 2
SW_Y_IS_POSITIVE = 0x00
SW_POINT_AT_INFINITY = 1 << 6
SW_Y_IS_NEGATIVE = 1 << 7
TE_FLAG_BITS = 1
TE_X_IS_NEGATIVE = 1 << 7


def buffer_byte_size(modulus_bits: int) -> int:
    """ceil(bits / 8) (serialize/src/lib.rs:222)."""
    return (modulus_bits + 7) // 8


class SerializationError(ValueError):
    pass


# --------------------------------------------------------------- field codecs


class FpCodec:
    """Prime-field codec for one FieldSpec."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.base_size = buffer_byte_size(spec.modulus_bit_size)

    # structural helpers used by point/tower codecs
    def flag_units(self):
        return [self]  # flags live on this (single) coordinate

    def serialized_size(self, flag_bits: int = 0) -> int:
        return buffer_byte_size(self.spec.modulus_bit_size + flag_bits)

    def serialize_with_flags(self, value: int, flags: int = 0, flag_bits: int = 0) -> bytes:
        if flag_bits > 8:
            raise SerializationError("flags must fit one byte")
        value = int(value)
        if not 0 <= value < self.spec.modulus:
            raise SerializationError("value out of range (must be canonical)")
        size = self.serialized_size(flag_bits)
        out = bytearray(value.to_bytes(size, "little"))
        if flag_bits:
            out[-1] |= flags
        return bytes(out)

    def serialize(self, value: int) -> bytes:
        return self.serialize_with_flags(value, 0, 0)

    def deserialize_with_flags(
        self, data: bytes, flag_bits: int = 0, validate: bool = True
    ):
        size = self.serialized_size(flag_bits)
        if len(data) < size:
            raise SerializationError("not enough bytes")
        buf = bytearray(data[:size])
        flags = 0
        if flag_bits:
            mask = (0xFF << (8 - flag_bits)) & 0xFF
            flags = buf[-1] & mask
            buf[-1] &= (~mask) & 0xFF
        value = int.from_bytes(bytes(buf), "little")
        if validate and value >= self.spec.modulus:
            raise SerializationError("field element not canonical")
        return value, flags, size

    def deserialize(self, data: bytes, validate: bool = True) -> int:
        v, _, _ = self.deserialize_with_flags(data, 0, validate)
        return v

    def from_random_bytes_with_flags(self, data: bytes, flag_bits: int = 0):
        """Parse hash/RNG output into (element, flags) or None
        (fp/mod.rs:246-288): copy up to 8*N64+1 bytes, extract the flag
        byte at ``buffer_byte_size(MODULUS_BIT_SIZE + flag_bits) - 1``,
        mask the last u64 limb above MODULUS_BIT_SIZE, and accept iff the
        remaining value is canonical."""
        if flag_bits > 8:
            return None
        n64 = self.spec.n_limbs // 4  # 16-bit limbs -> u64 limb count
        buf = bytearray(8 * n64 + 1)
        take = min(len(data), len(buf))
        buf[:take] = data[:take]
        flags = 0
        if flag_bits:
            flag_location = self.serialized_size(flag_bits) - 1
            flags_mask = (0xFF << (8 - flag_bits)) & 0xFF
            flags = buf[flag_location] & flags_mask
        # mask the last limb above the modulus bit size
        shave_bits = 64 * n64 - self.spec.modulus_bit_size
        last_limb_mask = ((1 << 64) - 1) >> shave_bits if shave_bits < 64 else 0
        mask9 = last_limb_mask.to_bytes(8, "little") + b"\x00"
        for i in range(9):
            buf[8 * (n64 - 1) + i] &= mask9[i]
        value = int.from_bytes(bytes(buf[: 8 * n64]), "little")
        if value >= self.spec.modulus:
            return None
        return value, flags

    # ordering / sign (fp/mod.rs:372)
    def cmp(self, a: int, b: int) -> int:
        return (a > b) - (a < b)

    def neg(self, a: int):
        return (-a) % self.spec.modulus

    def is_positive(self, a) -> bool:
        """a <= -a in the canonical ordering."""
        return self.cmp(a, self.neg(a)) <= 0


class ExtCodec:
    """Extension-field codec: fixed list of coordinate codecs.

    Serializes coordinates in order; flags are shaved into the *last*
    coordinate (quadratic_extension.rs:689, cubic_extension.rs analog).
    Ordering is lexicographic from the last coordinate down
    (quadratic_extension.rs:446-455).
    """

    def __init__(self, coords):
        self.coords = list(coords)

    def serialized_size(self, flag_bits: int = 0) -> int:
        *init, last = self.coords
        return sum(c.serialized_size(0) for c in init) + last.serialized_size(
            flag_bits
        )

    def serialize_with_flags(self, value, flags: int = 0, flag_bits: int = 0) -> bytes:
        if len(value) != len(self.coords):
            raise SerializationError("wrong arity")
        out = b""
        for c, v in zip(self.coords[:-1], value[:-1]):
            out += c.serialize_with_flags(v, 0, 0)
        out += self.coords[-1].serialize_with_flags(value[-1], flags, flag_bits)
        return out

    def serialize(self, value) -> bytes:
        return self.serialize_with_flags(value, 0, 0)

    def deserialize_with_flags(self, data: bytes, flag_bits: int = 0, validate=True):
        vals = []
        off = 0
        for c in self.coords[:-1]:
            v, _, n = c.deserialize_with_flags(data[off:], 0, validate)
            vals.append(v)
            off += n
        v, flags, n = self.coords[-1].deserialize_with_flags(
            data[off:], flag_bits, validate
        )
        vals.append(v)
        off += n
        return tuple(vals), flags, off

    def deserialize(self, data: bytes, validate=True):
        v, _, _ = self.deserialize_with_flags(data, 0, validate)
        return v

    def cmp(self, a, b) -> int:
        for ca, x, y in zip(reversed(self.coords), reversed(a), reversed(b)):
            c = ca.cmp(x, y)
            if c != 0:
                return c
        return 0

    def neg(self, a):
        return tuple(c.neg(x) for c, x in zip(self.coords, a))

    def is_positive(self, a) -> bool:
        return self.cmp(a, self.neg(a)) <= 0


def field_codec(field_kind):
    """Build the codec matching a device field kind."""
    from .fields.cubic import CubicExtField
    from .fields.prime import PrimeField
    from .fields.quadratic import QuadExtField

    if isinstance(field_kind, PrimeField):
        return FpCodec(field_kind.spec)
    if isinstance(field_kind, QuadExtField):
        sub = field_codec(field_kind.base)
        return ExtCodec([sub, sub])
    if isinstance(field_kind, CubicExtField):
        sub = field_codec(field_kind.base)
        return ExtCodec([sub, sub, sub])
    raise TypeError(f"no codec for {field_kind}")


def _zero_of(codec):
    if isinstance(codec, FpCodec):
        return 0
    return tuple(_zero_of(c) for c in codec.coords)


# --------------------------------------------------------------- point codecs


@dataclass
class SWPointCodec:
    """Codec for short-Weierstrass affine points (host representation:
    (x, y) tuple or None for infinity)."""

    curve: object  # SWCurve kind

    def __post_init__(self):
        self.base_codec = field_codec(self.curve.base)

    def serialized_size(self, compress: bool = True) -> int:
        flagged = self.base_codec.serialized_size(SW_FLAG_BITS)
        if compress:
            return flagged
        return self.base_codec.serialized_size(0) + flagged

    def _flags_of(self, pt) -> int:
        if pt is None:
            return SW_POINT_AT_INFINITY
        _, y = pt
        return (
            SW_Y_IS_POSITIVE
            if self.base_codec.is_positive(y)
            else SW_Y_IS_NEGATIVE
        )

    def serialize(self, pt, compress: bool = True) -> bytes:
        zero = _zero_of(self.base_codec)
        x = zero if pt is None else pt[0]
        y = zero if pt is None else pt[1]
        flags = self._flags_of(pt)
        if compress:
            return self.base_codec.serialize_with_flags(x, flags, SW_FLAG_BITS)
        return self.base_codec.serialize(x) + self.base_codec.serialize_with_flags(
            y, flags, SW_FLAG_BITS
        )

    def deserialize(self, data: bytes, compress: bool = True, validate: bool = True):
        if compress:
            x, flags, _ = self.base_codec.deserialize_with_flags(
                data, SW_FLAG_BITS, validate
            )
            if flags & SW_POINT_AT_INFINITY and flags & SW_Y_IS_NEGATIVE:
                raise SerializationError("invalid infinity encoding")
            if flags & SW_POINT_AT_INFINITY:
                return None
            y, neg_y = self._ys_from_x(x)
            pt = (x, y if not (flags & SW_Y_IS_NEGATIVE) else neg_y)
        else:
            n = self.base_codec.serialized_size(0)
            x = self.base_codec.deserialize(data[:n], validate)
            y, flags, _ = self.base_codec.deserialize_with_flags(
                data[n:], SW_FLAG_BITS, validate
            )
            if flags & SW_POINT_AT_INFINITY:
                return None
            pt = (x, y)
        if validate:
            if not self._host_on_curve(pt):
                raise SerializationError("point not on curve")
            # Validate::Yes also rejects on-curve points outside the
            # prime-order subgroup (short_weierstrass/affine.rs:363-369)
            if not self.curve.host_is_in_correct_subgroup(pt):
                raise SerializationError("point not in the prime-order subgroup")
        return pt

    def from_random_bytes(self, data: bytes):
        """Hash/RNG bytes -> (ok, affine point | None-for-identity)
        (short_weierstrass/affine.rs:225-238): parse (x, SWFlags); zero x
        with the infinity flag is the identity; otherwise recover y from
        x with the flagged sign.  No subgroup check (as in the
        reference — callers clear cofactors)."""
        if not isinstance(self.base_codec, FpCodec):
            raise SerializationError("from_random_bytes needs a prime base")
        parsed = self.base_codec.from_random_bytes_with_flags(
            data, SW_FLAG_BITS
        )
        if parsed is None:
            return False, None
        x, flags = parsed
        if x == 0 and flags == SW_POINT_AT_INFINITY:
            return True, None  # the identity
        if flags & SW_POINT_AT_INFINITY:
            return False, None
        try:
            y_pos, y_neg = self._ys_from_x(x)
        except SerializationError:
            return False, None
        y = y_neg if flags & SW_Y_IS_NEGATIVE else y_pos
        return True, (x, y)

    def _host_on_curve(self, pt) -> bool:
        from .curves.sw import _host_field_of

        hf = _host_field_of(self.curve.base)
        x, y = pt
        a = (
            hf.from_base_prime(self.curve.a_host)
            if isinstance(self.curve.a_host, int)
            else self.curve.a_host
        )
        b = (
            hf.from_base_prime(self.curve.b_host)
            if isinstance(self.curve.b_host, int)
            else self.curve.b_host
        )
        rhs = hf.add(hf.add(hf.mul(hf.mul(x, x), x), hf.mul(a, x)), b)
        return hf.equal(hf.mul(y, y), rhs)

    def _ys_from_x(self, x):
        """(positive_y, negative_y) roots of the curve equation at x
        (affine.rs get_ys_from_x_unchecked)."""
        from .curves.sw import _host_field_of
        from .hostmath import host_sqrt

        hf = _host_field_of(self.curve.base)
        a = (
            hf.from_base_prime(self.curve.a_host)
            if isinstance(self.curve.a_host, int)
            else self.curve.a_host
        )
        b = (
            hf.from_base_prime(self.curve.b_host)
            if isinstance(self.curve.b_host, int)
            else self.curve.b_host
        )
        rhs = hf.add(hf.add(hf.mul(hf.mul(x, x), x), hf.mul(a, x)), b)
        y = host_sqrt(hf, rhs)
        if y is None:
            raise SerializationError("x not on curve")
        neg = hf.neg(y)
        if self.base_codec.cmp(y, neg) <= 0:
            return y, neg
        return neg, y


@dataclass
class TEPointCodec:
    """Codec for twisted-Edwards affine points ((x, y); identity (0, 1))."""

    curve: object  # TECurve kind

    def __post_init__(self):
        self.base_codec = field_codec(self.curve.base)

    def serialized_size(self, compress: bool = True) -> int:
        if compress:
            return self.base_codec.serialized_size(TE_FLAG_BITS)
        return 2 * self.base_codec.serialized_size(0)

    def serialize(self, pt, compress: bool = True) -> bytes:
        x, y = pt
        if compress:
            flags = 0 if self.base_codec.is_positive(x) else TE_X_IS_NEGATIVE
            return self.base_codec.serialize_with_flags(y, flags, TE_FLAG_BITS)
        return self.base_codec.serialize(x) + self.base_codec.serialize(y)

    def deserialize(self, data: bytes, compress: bool = True, validate: bool = True):
        if compress:
            y, flags, _ = self.base_codec.deserialize_with_flags(
                data, TE_FLAG_BITS, validate
            )
            x_pos, x_neg = self._xs_from_y(y)
            pt = (x_neg if flags & TE_X_IS_NEGATIVE else x_pos, y)
        else:
            n = self.base_codec.serialized_size(0)
            x = self.base_codec.deserialize(data[:n], validate)
            y = self.base_codec.deserialize(data[n : 2 * n], validate)
            pt = (x, y)
        if validate:
            if not self._host_on_curve(pt):
                raise SerializationError("point not on curve")
            if not self.curve.host_is_in_correct_subgroup(pt):
                raise SerializationError("point not in the prime-order subgroup")
        return pt

    def _host_on_curve(self, pt) -> bool:
        from .curves.sw import _host_field_of

        hf = _host_field_of(self.curve.base)
        x, y = pt
        a = hf.from_base_prime(self.curve.a_host) if isinstance(self.curve.a_host, int) else self.curve.a_host
        d = hf.from_base_prime(self.curve.d_host) if isinstance(self.curve.d_host, int) else self.curve.d_host
        x2, y2 = hf.mul(x, x), hf.mul(y, y)
        lhs = hf.add(hf.mul(a, x2), y2)
        rhs = hf.add(hf.one(), hf.mul(hf.mul(d, x2), y2))
        return hf.equal(lhs, rhs)

    def _xs_from_y(self, y):
        """x^2 = (y^2 - 1) / (d y^2 - a)  (affine.rs get_xs_from_y_unchecked)."""
        from .curves.sw import _host_field_of
        from .hostmath import host_sqrt

        hf = _host_field_of(self.curve.base)
        a = hf.from_base_prime(self.curve.a_host) if isinstance(self.curve.a_host, int) else self.curve.a_host
        d = hf.from_base_prime(self.curve.d_host) if isinstance(self.curve.d_host, int) else self.curve.d_host
        y2 = hf.mul(y, y)
        num = hf.sub(y2, hf.one())
        den = hf.sub(hf.mul(d, y2), a)
        x2 = hf.mul(num, hf.inv(den))
        x = host_sqrt(hf, x2)
        if x is None:
            raise SerializationError("y not on curve")
        neg = hf.neg(x)
        if self.base_codec.cmp(x, neg) <= 0:
            return x, neg
        return neg, x


# ------------------------------------------------------------ std-type codecs
# (serialize/src/impls.rs:20-762 — uints LE, usize as u64, Vec with u64
# length prefix, Option as u8 tag + payload, bool as u8)


def serialize_u8(v: int) -> bytes:
    return int(v).to_bytes(1, "little")


def serialize_u16(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def serialize_u32(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def serialize_u64(v: int) -> bytes:
    return int(v).to_bytes(8, "little")


def serialize_usize(v: int) -> bytes:
    return serialize_u64(v)


def serialize_bool(v: bool) -> bytes:
    return serialize_u8(1 if v else 0)


def serialize_vec(items, item_serializer) -> bytes:
    out = serialize_u64(len(items))
    for it in items:
        out += item_serializer(it)
    return out


def deserialize_vec(data: bytes, item_deserializer):
    n = int.from_bytes(data[:8], "little")
    off = 8
    out = []
    for _ in range(n):
        item, used = item_deserializer(data[off:])
        out.append(item)
        off += used
    return out, off


def serialize_option(value, item_serializer) -> bytes:
    if value is None:
        return serialize_u8(0)
    return serialize_u8(1) + item_serializer(value)


def serialize_bigint(value: int, n_u64_limbs: int) -> bytes:
    """ark BigInt<N>: N u64 limbs, little-endian
    (ff/src/biginteger serialization)."""
    return int(value).to_bytes(8 * n_u64_limbs, "little")


def deserialize_bigint(data: bytes, n_u64_limbs: int) -> int:
    return int.from_bytes(data[: 8 * n_u64_limbs], "little")


def serialize_string(s: str) -> bytes:
    """String = UTF-8 bytes as Vec<u8> (impls.rs String impl)."""
    raw = s.encode("utf-8")
    return serialize_u64(len(raw)) + raw


def deserialize_string(data: bytes):
    n = int.from_bytes(data[:8], "little")
    return data[8 : 8 + n].decode("utf-8"), 8 + n


def serialize_tuple(values, item_serializers) -> bytes:
    """Tuples serialize element-wise with no prefix (impls.rs tuple impls)."""
    return b"".join(s(v) for s, v in zip(item_serializers, values))


def serialize_map(mapping, key_serializer, value_serializer) -> bytes:
    """BTreeMap = u64 len + sorted (key, value) pairs (impls.rs BTreeMap).

    Iteration must be in ascending key order to match the reference's
    BTreeMap ordering; callers pass keys with a total order."""
    items = sorted(mapping.items())
    out = serialize_u64(len(items))
    for k, v in items:
        out += key_serializer(k) + value_serializer(v)
    return out


def deserialize_map(data: bytes, key_deserializer, value_deserializer):
    n = int.from_bytes(data[:8], "little")
    off = 8
    out = {}
    for _ in range(n):
        k, used = key_deserializer(data[off:])
        off += used
        v, used = value_deserializer(data[off:])
        off += used
        out[k] = v
    return out, off


def serialize_set(items, item_serializer) -> bytes:
    """BTreeSet = u64 len + sorted items (impls.rs BTreeSet)."""
    items = sorted(items)
    out = serialize_u64(len(items))
    for it in items:
        out += item_serializer(it)
    return out


# ------------------------------------------------------------ hash-of-encoding
# (CanonicalSerializeHashExt, serialize/src/lib.rs:175-211: hash the
# canonical encoding of a value through any Digest)


def hash_of_encoding(serialized: bytes, digest="sha256") -> bytes:
    """Hash an already-serialized canonical encoding (HashMarshaller)."""
    import hashlib

    return hashlib.new(digest, serialized).digest()


def hash_compressed(codec, value, digest="sha256") -> bytes:
    """CanonicalSerializeHashExt::hash — digest of the compressed
    canonical encoding (serialize/src/lib.rs:183-192)."""
    data = (
        codec.serialize(value, compress=True)
        if isinstance(codec, (SWPointCodec, TEPointCodec))
        else codec.serialize(value)
    )
    return hash_of_encoding(data, digest)


def hash_uncompressed(codec, value, digest="sha256") -> bytes:
    """CanonicalSerializeHashExt::hash_uncompressed
    (serialize/src/lib.rs:194-203)."""
    data = (
        codec.serialize(value, compress=False)
        if isinstance(codec, (SWPointCodec, TEPointCodec))
        else codec.serialize(value)
    )
    return hash_of_encoding(data, digest)


# ---------------------------------------------------------------- batch_check
# (Valid::batch_check, serialize/src/lib.rs:50-63 — rayon there; ONE
# batched device program here)


def sw_batch_check(curve, points) -> bool:
    """Validate many deserialized SW host points in one device program:
    batched on-curve + subgroup membership (fast endomorphism check when
    the instance installs one).  Raises SerializationError listing the
    first failing index, mirroring batch_check's all-or-nothing result."""
    import jax
    import numpy as np

    finite = [pt for pt in points if pt is not None]
    if not finite:
        return True
    aff = curve.from_host(finite)
    on = jax.device_get(curve.is_on_curve(aff))
    sub = jax.device_get(curve.is_in_correct_subgroup(curve.from_affine(aff)))
    ok = np.logical_and(np.asarray(on), np.asarray(sub))
    if not bool(ok.all()):
        bad = int(np.argmin(ok))
        raise SerializationError(f"batch_check: point {bad} invalid")
    return True
