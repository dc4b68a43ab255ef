"""Executable API examples (the reference's doc-test parity).

The reference carries runnable examples on nearly every trait method
(e.g. ff/src/biginteger/mod.rs:747-763, ff/src/fields/mod.rs:51-93);
this module is the equivalent: every snippet below runs under doctest in
the CPU suite (tests/test_doctests.py), so the examples cannot rot.

Examples use small/fast instances (Fp128, secp256k1, BLS12-381 Fr) to
keep XLA:CPU compile time reasonable.

Field arithmetic (reference: ff/src/fields/mod.rs:51-93)
--------------------------------------------------------

>>> from algebra_tpu.curves.instances.fp128 import Fq
>>> a = Fq.from_int(5)
>>> b = Fq.from_int(7)
>>> Fq.to_int(Fq.mul(a, b))
35
>>> Fq.to_int(Fq.add(a, b))
12
>>> p = Fq.characteristic()
>>> Fq.to_int(Fq.neg(a)) == p - 5
True
>>> Fq.to_int(Fq.inverse(a)) * 5 % p
1

Batched values are first-class — a "field element" is an array batch
(limb-major uint32[L, *batch]):

>>> xs = Fq.from_int([2, 3, 4])
>>> Fq.to_int(Fq.square(xs))
[4, 9, 16]

Square roots follow the reference's SqrtPrecomputation conventions
(ff/src/fields/sqrt.rs:67-148):

>>> ok, r = Fq.sqrt(Fq.from_int(9))
>>> bool(ok), Fq.to_int(r) in (3, p - 3)
(True, True)

Prime-field byte reduction (ff/src/fields/prime.rs:79-96):

>>> got = Fq.to_int(Fq.from_le_bytes_mod_order(bytes(range(1, 33))))
>>> got == int.from_bytes(bytes(range(1, 33)), "little") % p
True

Canonical serialization (reference: serialize/src/lib.rs:84-125)
----------------------------------------------------------------

Byte-identical to arkworks' little-endian canonical encoding:

>>> from algebra_tpu import serialize
>>> from algebra_tpu.curves.instances import bls12_381
>>> codec = serialize.FpCodec(bls12_381.fr_spec)
>>> data = codec.serialize(12345)
>>> len(data) == 32 and codec.deserialize(data) == 12345
True
>>> serialize.serialize_u64(258).hex()
'0201000000000000'

Compressed SW points carry flags in the top byte
(ec/src/models/short_weierstrass/serialization_flags.rs):

>>> g1 = bls12_381.g1()
>>> pc = serialize.SWPointCodec(g1)
>>> gen = g1.generator_host
>>> wire = pc.serialize(gen, compress=True)
>>> len(wire)
48
>>> pc.deserialize(wire, compress=True) == gen
True

Curves and scalar multiplication (ec/src/lib.rs:50-160)
-------------------------------------------------------

>>> import jax.numpy as jnp
>>> from algebra_tpu.bigint import batch_int_to_limbs
>>> from algebra_tpu.curves.instances import secp256k1
>>> c = secp256k1.g1()
>>> gen = c.generator_host
>>> c.host_add(gen, gen) == c.host_double(gen)
True

Device batches mirror the host oracle bit-for-bit:

>>> P = c.from_affine(c.from_host([gen, gen]))
>>> c.to_host(c.double(P)) == [c.host_double(gen)] * 2
True

GLV-accelerated multiplication (ec/src/scalar_mul/glv.rs:28-62; the
reference declares the trait, parameters instantiated here):

>>> from algebra_tpu.ops import glv
>>> k = 0xDEADBEEFCAFEBABE
>>> Pk = glv.glv_mul_host(c, c.index_point(P, 0), k)
>>> c.to_host(Pk) == c.host_mul(gen, k)
True

Variable-base MSM (ec/src/scalar_mul/variable_base/mod.rs:12-149):

>>> from algebra_tpu.ops import msm
>>> pts = c.random_host(__import__("random").Random(1), 4)
>>> bases = c.from_host(pts)
>>> ks = [3, 1, 4, 1]
>>> sc = jnp.asarray(batch_int_to_limbs(ks, 1))
>>> out = msm.msm(c, bases, sc, scalar_bits=4)
>>> want = None
>>> for pt, k in zip(pts, ks):
...     want = c.host_add(want, c.host_mul(pt, k))
>>> c.to_host(out) == want
True

Polynomials and FFT domains (poly/src/domain/mod.rs:30-116)
-----------------------------------------------------------

>>> from algebra_tpu.poly.domain import Radix2EvaluationDomain
>>> Fr = bls12_381.Fr
>>> dom = Radix2EvaluationDomain(Fr, 8)
>>> coeffs = Fr.from_int([1, 2, 3, 4, 0, 0, 0, 0])
>>> evals = dom.fft(coeffs)
>>> back = dom.ifft(evals)
>>> Fr.to_int(back)[:4]
[1, 2, 3, 4]

Evaluation at a point matches Horner (polynomial/univariate/dense.rs):

>>> from algebra_tpu.poly.dense import DensePolynomial
>>> poly = DensePolynomial(Fr, coeffs)
>>> x = Fr.from_int(10)
>>> Fr.to_int(poly.evaluate(x))
4321
"""
