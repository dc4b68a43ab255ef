"""Golden wire-format vectors: literal arkworks byte strings, committed.

The expected hex below was derived INDEPENDENTLY of algebra_tpu.serialize
(a from-scratch encoder written directly against the reference's layout:
serialize/src/lib.rs:84-125, ff/src/fields/models/fp/mod.rs:543-637,
ec serialization_flags.rs — little-endian bytes, 2-bit SW flags / 1-bit TE
flag in the MSBs of the final byte, y<= -y positivity, (c1,c0) lexicographic
ordering in Fp2), anchored on externally published constants: the IETF/zcash
BLS12-381 generator coordinates and the arkworks ed-on-bls12-381 generator.
These tests fail if a single byte of our encoders drifts from the arkworks
wire format.  (No Rust toolchain ships in this image, so the bytes are
pinned rather than regenerated; any divergence between two independent
implementations of the reference layout fails here.)
"""

import algebra_tpu.serialize as ser
from algebra_tpu.curves.instances import bls12_381, ed_on_bls12_381

G1_GEN_COMPRESSED = "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c30faca94f8c63952694d79731a7d3f117"
G1_GEN_UNCOMPRESSED = "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c30faca94f8c63952694d79731a7d3f117e1e7c5462923aa0ce48a88a244c73cd0edb3042ccb18db00f60ad0d595e0f5fce48a1d74ed309ea0f1a0aae381f4b308"
G1_NEG_GEN_COMPRESSED = "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c30faca94f8c63952694d79731a7d3f197"
G1_INF_COMPRESSED = "000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000040"
G1_INF_UNCOMPRESSED = "000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000040"
G2_GEN_COMPRESSED = "b8bd21c1c85680d4efbb05a82603ac0b77d1e37a640b51b4023b40fad47ae4c65110c52d27050826910a8ff0b2a24a027e2b045d057dace5575d941312f14c3349507fdcbb61dab51ab62099d0d06b59654f2788a0d3ac7d609f7152602be013"
G2_GEN_UNCOMPRESSED = "b8bd21c1c85680d4efbb05a82603ac0b77d1e37a640b51b4023b40fad47ae4c65110c52d27050826910a8ff0b2a24a027e2b045d057dace5575d941312f14c3349507fdcbb61dab51ab62099d0d06b59654f2788a0d3ac7d609f7152602be0130128b808865493e189a2ac3bccc93a922cd16051699a426da7d3bd8caa9bfdad1a352edac6cdc98c116e7d7227d5e50cbe795ff05f07a9aaa11dec5c270d373fab992e57ab927426af63a7857e283ecb998bc22bb0d2ac32cc34a72ea0c40606"
G2_INF_COMPRESSED = "000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000040"
FR_ONE = "0100000000000000000000000000000000000000000000000000000000000000"
FR_MINUS_ONE = "00000000fffffffffe5bfeff02a4bd5305d8a10908d83933487d9d2953a7ed73"
FQ_MODULUS_MINUS_ONE = "aaaafffffffffeb9ffff53b1feffab1e24f6b0f6a0d23067bf1285f3844b7764d7ac4b43b6a71b4b9ae67f39ea11011a"
ED_GEN_COMPRESSED = "aa92d2590e873fccd7fe20c25cba263ec3c066c8782e1393171aabddf13c521d"
ED_GEN_UNCOMPRESSED = "2b12d19214076b3e62721f7dfd6a2fe73b3dbf9fb965a3868021e1235dfeda11aa92d2590e873fccd7fe20c25cba263ec3c066c8782e1393171aabddf13c521d"


def test_g1_generator_bytes():
    codec = ser.SWPointCodec(bls12_381.g1())
    g = bls12_381.g1().generator_host
    assert codec.serialize(g, compress=True).hex() == G1_GEN_COMPRESSED
    assert codec.serialize(g, compress=False).hex() == G1_GEN_UNCOMPRESSED
    neg = (g[0], (bls12_381.P - g[1]) % bls12_381.P)
    assert codec.serialize(neg, compress=True).hex() == G1_NEG_GEN_COMPRESSED
    # decode side
    assert codec.deserialize(bytes.fromhex(G1_GEN_COMPRESSED)) == g
    assert codec.deserialize(
        bytes.fromhex(G1_GEN_UNCOMPRESSED), compress=False
    ) == g


def test_g1_infinity_bytes():
    codec = ser.SWPointCodec(bls12_381.g1())
    assert codec.serialize(None, compress=True).hex() == G1_INF_COMPRESSED
    assert codec.serialize(None, compress=False).hex() == G1_INF_UNCOMPRESSED
    assert codec.deserialize(bytes.fromhex(G1_INF_COMPRESSED)) is None


def test_g2_generator_bytes():
    codec = ser.SWPointCodec(bls12_381.g2())
    g = bls12_381.g2().generator_host
    assert codec.serialize(g, compress=True).hex() == G2_GEN_COMPRESSED
    assert codec.serialize(g, compress=False).hex() == G2_GEN_UNCOMPRESSED
    assert codec.serialize(None, compress=True).hex() == G2_INF_COMPRESSED
    assert codec.deserialize(bytes.fromhex(G2_GEN_COMPRESSED)) == g


def test_field_element_bytes():
    fr = ser.FpCodec(bls12_381.fr_spec)
    fq = ser.FpCodec(bls12_381.fq_spec)
    assert fr.serialize(1).hex() == FR_ONE
    assert fr.serialize(bls12_381.R - 1).hex() == FR_MINUS_ONE
    assert fq.serialize(bls12_381.P - 1).hex() == FQ_MODULUS_MINUS_ONE
    assert fr.deserialize(bytes.fromhex(FR_MINUS_ONE)) == bls12_381.R - 1


def test_ed_on_bls12_381_generator_bytes():
    codec = ser.TEPointCodec(ed_on_bls12_381.curve())
    g = (ed_on_bls12_381.GENERATOR_X, ed_on_bls12_381.GENERATOR_Y)
    assert codec.serialize(g, compress=True).hex() == ED_GEN_COMPRESSED
    assert codec.serialize(g, compress=False).hex() == ED_GEN_UNCOMPRESSED
    assert codec.deserialize(bytes.fromhex(ED_GEN_COMPRESSED)) == g
