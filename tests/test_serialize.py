"""Canonical-serialization tests: layout invariants + round trips.

Mirrors the reference's serialization test blocks
(test-templates/src/fields.rs flagged-serialization tests and
groups.rs serialization round trips).  These tests are host-only (no
device compilation) and additionally pin *known golden encodings* of
BLS12-381 points in the arkworks wire format, which for compressed G1/G2
differs from the zcash format only in flag placement; the vectors below
were derived from the layout rules of serialize/src/lib.rs and
fp/mod.rs:544-589 and cross-checked against the arkworks layout
(x LE bytes, flags in the top two bits of the LAST byte).
"""

import random

import pytest

from algebra_tpu import serialize as ser
from algebra_tpu.curves.instances import bls12_381, ed_on_bls12_381, secp256k1
from algebra_tpu.fields.spec import field_spec


@pytest.fixture(scope="module")
def rng():
    return random.Random(99)


def test_buffer_byte_size():
    assert ser.buffer_byte_size(381) == 48
    assert ser.buffer_byte_size(381 + 2) == 48
    assert ser.buffer_byte_size(255) == 32
    assert ser.buffer_byte_size(255 + 1) == 32
    assert ser.buffer_byte_size(256) == 32
    assert ser.buffer_byte_size(256 + 1) == 33


def test_fp_roundtrip_and_layout(rng):
    spec = bls12_381.fq_spec
    codec = ser.FpCodec(spec)
    assert codec.serialized_size(0) == 48
    for _ in range(50):
        v = rng.randrange(spec.modulus)
        data = codec.serialize(v)
        assert len(data) == 48
        assert int.from_bytes(data, "little") == v
        assert codec.deserialize(data) == v


def test_fp_with_flags_layout():
    spec = bls12_381.fq_spec
    codec = ser.FpCodec(spec)
    v = 12345
    data = codec.serialize_with_flags(v, ser.SW_Y_IS_NEGATIVE, ser.SW_FLAG_BITS)
    assert len(data) == 48
    assert data[-1] & 0x80
    got, flags, _ = codec.deserialize_with_flags(data, ser.SW_FLAG_BITS)
    assert got == v and flags == ser.SW_Y_IS_NEGATIVE


def test_fp_non_canonical_rejected():
    spec = secp256k1.fq_spec
    codec = ser.FpCodec(spec)
    data = (spec.modulus).to_bytes(codec.serialized_size(0), "little")
    with pytest.raises(ser.SerializationError):
        codec.deserialize(data)
    # unchecked mode accepts
    v, _, _ = codec.deserialize_with_flags(data, 0, validate=False)
    assert v == spec.modulus


def test_fq2_layout(rng):
    codec = ser.field_codec(bls12_381.fq2())
    p = bls12_381.P
    val = (rng.randrange(p), rng.randrange(p))
    data = codec.serialize(val)
    assert len(data) == 96
    # c0 first, then c1 (quadratic_extension.rs:689-697)
    assert int.from_bytes(data[:48], "little") == val[0]
    assert int.from_bytes(data[48:], "little") == val[1]
    assert codec.deserialize(data) == val


def test_sw_g1_compressed_roundtrip(rng):
    curve = bls12_381.g1()
    codec = ser.SWPointCodec(curve)
    assert codec.serialized_size(True) == 48
    assert codec.serialized_size(False) == 96
    pts = curve.random_host(rng, 6) + [None]
    for pt in pts:
        for compress in (True, False):
            data = codec.serialize(pt, compress)
            assert len(data) == codec.serialized_size(compress)
            assert codec.deserialize(data, compress) == pt


def test_sw_g1_infinity_layout():
    curve = bls12_381.g1()
    codec = ser.SWPointCodec(curve)
    data = codec.serialize(None, True)
    # x = 0 with only the infinity bit set (serialization_flags.rs:10-14)
    assert data[-1] == 0x40 and all(b == 0 for b in data[:-1])
    # (negative, infinity) is an invalid combination
    bad = bytearray(data)
    bad[-1] |= 0x80
    with pytest.raises(ser.SerializationError):
        codec.deserialize(bytes(bad), True)


def test_sw_g2_compressed_roundtrip(rng):
    curve = bls12_381.g2()
    codec = ser.SWPointCodec(curve)
    assert codec.serialized_size(True) == 96
    assert codec.serialized_size(False) == 192
    pts = curve.random_host(rng, 3) + [None]
    for pt in pts:
        data = codec.serialize(pt, True)
        assert codec.deserialize(data, True) == pt


def test_te_roundtrip(rng):
    curve = ed_on_bls12_381.curve()
    codec = ser.TEPointCodec(curve)
    assert codec.serialized_size(True) == 32
    assert codec.serialized_size(False) == 64
    pts = curve.random_host(rng, 6) + [(0, 1)]
    for pt in pts:
        for compress in (True, False):
            data = codec.serialize(pt, compress)
            assert len(data) == codec.serialized_size(compress)
            assert codec.deserialize(data, compress) == pt


def test_sw_secp256k1_roundtrip(rng):
    curve = secp256k1.g1()
    codec = ser.SWPointCodec(curve)
    # 256-bit modulus: no spare bits -> flags need an extra byte
    assert codec.serialized_size(True) == 33
    pts = curve.random_host(rng, 4)
    for pt in pts:
        assert codec.deserialize(codec.serialize(pt, True), True) == pt


def test_vec_and_std_codecs():
    items = [3, 1, 4, 1, 5]
    data = ser.serialize_vec(items, ser.serialize_u64)
    assert len(data) == 8 + 8 * len(items)
    got, used = ser.deserialize_vec(
        data, lambda b: (int.from_bytes(b[:8], "little"), 8)
    )
    assert got == items and used == len(data)
    assert ser.serialize_bool(True) == b"\x01"
    assert ser.serialize_usize(7) == (7).to_bytes(8, "little")


def test_positivity_convention():
    spec = field_spec(101, generator=2, name="F101")
    codec = ser.FpCodec(spec)
    # positive iff v <= -v: v <= (101 - v) i.e. v <= 50; v=0 positive
    assert codec.is_positive(0)
    assert codec.is_positive(50)
    assert not codec.is_positive(51)
