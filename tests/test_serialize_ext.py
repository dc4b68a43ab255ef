"""Serialization extensions: hash-of-encoding, batch_check, std-type
codecs, ToConstraintField, and the native bulk codec.

Mirrors: serialize/src/lib.rs:175-211 (CanonicalSerializeHashExt),
lib.rs:50-63 (batch_check), impls.rs (String/tuple/BTreeMap/BTreeSet),
ff/src/to_field_vec.rs + ec affine impls, and exercises the C++ codec in
native/ark_codec.cpp against the Python reference path.
"""

import hashlib
import random

import numpy as np
import pytest

from algebra_tpu import native, serialize as S
from algebra_tpu.curves.instances import bls12_381
from algebra_tpu.fields import to_field_vec as tfv


@pytest.fixture(scope="module")
def rng():
    return random.Random(99)


# ------------------------------------------------------------ hash-of-encoding
def test_hash_of_encoding_matches_digest_of_bytes(rng):
    curve = bls12_381.g1()
    codec = S.SWPointCodec(curve)
    pt = curve.random_host(rng, 1)[0]
    comp = codec.serialize(pt, compress=True)
    uncomp = codec.serialize(pt, compress=False)
    assert S.hash_compressed(codec, pt) == hashlib.sha256(comp).digest()
    assert S.hash_uncompressed(codec, pt) == hashlib.sha256(uncomp).digest()
    # different digests for different points
    pt2 = curve.random_host(rng, 1)[0]
    assert S.hash_compressed(codec, pt2) != S.hash_compressed(codec, pt)


# ------------------------------------------------------------------ batch_check
def test_sw_batch_check_accepts_valid_points(rng):
    curve = bls12_381.g1()
    pts = curve.random_host(rng, 8) + [None]
    assert S.sw_batch_check(curve, pts)


def test_sw_batch_check_rejects_out_of_subgroup(rng):
    curve = bls12_381.g1()
    # an on-curve point OUTSIDE the r-subgroup: cofactor > 1 guarantees
    # one exists; find it by hashing x candidates
    from algebra_tpu.serialize import SerializationError

    p = bls12_381.P
    hf_pt = None
    x = 5
    while hf_pt is None:
        rhs = (x * x * x + 4) % p
        y = pow(rhs, (p + 1) // 4, p)
        if y * y % p == rhs:
            cand = (x, y)
            if not curve.host_is_in_correct_subgroup(cand):
                hf_pt = cand
        x += 1
    good = curve.random_host(rng, 3)
    with pytest.raises(SerializationError):
        S.sw_batch_check(curve, good + [hf_pt])


# ------------------------------------------------------------- std-type codecs
def test_string_codec_roundtrip():
    data = S.serialize_string("arkworks — tpu")
    s, used = S.deserialize_string(data)
    assert s == "arkworks — tpu"
    assert used == len(data)
    # wire format: u64 LE length prefix of the UTF-8 bytes
    raw = "arkworks — tpu".encode("utf-8")
    assert data[:8] == len(raw).to_bytes(8, "little")


def test_tuple_codec():
    data = S.serialize_tuple(
        (3, True), (S.serialize_u32, S.serialize_bool)
    )
    assert data == (3).to_bytes(4, "little") + b"\x01"


def test_map_codec_roundtrip():
    m = {5: 50, 1: 10, 3: 30}
    data = S.serialize_map(m, S.serialize_u8, S.serialize_u64)
    # BTreeMap ordering: ascending keys
    assert data[8] == 1 and data[17] == 3 and data[26] == 5

    def k(d):
        return d[0], 1

    def v(d):
        return int.from_bytes(d[:8], "little"), 8

    out, used = S.deserialize_map(data, k, v)
    assert out == m and used == len(data)


def test_set_codec_sorted():
    data = S.serialize_set({9, 2, 7}, S.serialize_u8)
    assert data == (3).to_bytes(8, "little") + bytes([2, 7, 9])


# -------------------------------------------------------------- to_field_vec
def test_field_to_base_prime_elements_tower_order():
    v = ((1, 2), (3, 4), (5, 6))  # an Fq6-like value
    assert tfv.field_to_base_prime_elements(v) == [1, 2, 3, 4, 5, 6]


def test_sw_affine_to_field_elements(rng):
    curve = bls12_381.g1()
    pt = curve.random_host(rng, 1)[0]
    out = tfv.sw_affine_to_field_elements(pt)
    assert out == [pt[0], pt[1], 0]
    assert tfv.sw_affine_to_field_elements(None) == [0, 0, 1]


def test_bytes_to_field_elements_capacity():
    p = bls12_381.R  # 255-bit modulus -> 31-byte capacity
    data = bytes(range(64))
    out = tfv.bytes_to_field_elements(data, p)
    assert len(out) == 3  # 31 + 31 + 2
    assert out[0] == int.from_bytes(data[:31], "little")
    assert out[2] == int.from_bytes(data[62:], "little")
    assert all(v < p for v in out)


def test_bool_to_field_elements():
    assert tfv.bool_to_field_elements(True) == [1]
    assert tfv.bool_to_field_elements(False) == [0]


# ---------------------------------------------------------------- native codec
def test_native_pack_unpack_roundtrip(rng):
    spec = bls12_381.fq_spec
    n = 1000
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    limbs = np.zeros((n, spec.n_limbs), np.uint32)
    for i, v in enumerate(vals):
        for j in range(spec.n_limbs):
            limbs[i, j] = (v >> (16 * j)) & 0xFFFF
    stride = S.buffer_byte_size(spec.modulus_bit_size)
    packed = native.pack_le(limbs, stride)
    # byte-exact vs the python wire format
    codec = S.FpCodec(spec)
    for i in (0, 1, n // 2, n - 1):
        assert packed[i].tobytes() == codec.serialize(vals[i])
    unpacked = native.unpack_le(packed, spec.n_limbs)
    np.testing.assert_array_equal(unpacked, limbs)


def test_native_flags_roundtrip(rng):
    spec = bls12_381.fq_spec
    n = 64
    stride = S.buffer_byte_size(spec.modulus_bit_size + S.SW_FLAG_BITS)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    limbs = np.zeros((n, spec.n_limbs), np.uint32)
    for i, v in enumerate(vals):
        for j in range(spec.n_limbs):
            limbs[i, j] = (v >> (16 * j)) & 0xFFFF
    buf = native.pack_le(limbs, stride)
    flags = np.asarray(
        [S.SW_Y_IS_NEGATIVE if i % 2 else 0 for i in range(n)], np.uint8
    )
    buf = native.apply_flags(buf, flags)
    codec = S.FpCodec(spec)
    for i in (0, 1, 2, 3):
        assert buf[i].tobytes() == codec.serialize_with_flags(
            vals[i], int(flags[i]), S.SW_FLAG_BITS
        )
    stripped, got_flags = native.strip_flags(buf, S.SW_FLAG_BITS)
    np.testing.assert_array_equal(got_flags, flags)
    unpacked = native.unpack_le(stripped, spec.n_limbs)
    np.testing.assert_array_equal(unpacked, limbs)


def test_native_mont_mul_oracle(rng):
    if not native.available():
        pytest.skip("native library not built")
    spec = bls12_381.fr_spec
    n = 256
    p = spec.modulus
    a_int = [rng.randrange(p) for _ in range(n)]
    b_int = [rng.randrange(p) for _ in range(n)]

    def to_limbs(vals):
        out = np.zeros((n, spec.n_limbs), np.uint32)
        for i, v in enumerate(vals):
            for j in range(spec.n_limbs):
                out[i, j] = (v >> (16 * j)) & 0xFFFF
        return out

    am = to_limbs([spec.to_mont(v) for v in a_int])
    bm = to_limbs([spec.to_mont(v) for v in b_int])
    p_limbs = np.asarray(spec.p_limbs, np.uint32)
    got = native.mont_mul_batch(am, bm, p_limbs, spec.inv16)
    for i in (0, 1, n // 2, n - 1):
        acc = 0
        for j in range(spec.n_limbs - 1, -1, -1):
            acc = (acc << 16) | int(got[i, j])
        assert spec.from_mont(acc) == a_int[i] * b_int[i] % p
