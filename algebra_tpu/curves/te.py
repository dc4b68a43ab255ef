"""Twisted Edwards curves: batched extended-coordinate group kernels.

TPU-native re-design of the reference's TE module
(ec/src/models/twisted_edwards/{mod,affine,group}.rs): a*x^2 + y^2 =
1 + d*x^2*y^2 with extended coordinates (X : Y : T : Z), x = X/Z,
y = Y/Z, T = X*Y/Z (Hisil–Wong–Carter–Dawson 2008; the reference uses
dbl-2008-hwcd and the unified madd-2008-hwcd, group.rs:160-164,241-246).

The identity is the *representable* point (0 : 1 : 0 : 1), so — unlike
Jacobian SW — no infinity masking is needed anywhere; the unified addition
law is exception-free for the a = -1 / complete-curve parameter sets used
by the reference's TE instantiations, which makes TE the friendliest curve
shape for TPU lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Field
from .sw import scalar_bits_le, _host_field_of


class TECurve:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 over a base field kind."""

    def __init__(
        self,
        base: Field,
        a_host,
        d_host,
        generator_host,  # (x, y)
        cofactor: int,
        scalar_modulus: int,
        name: str = "TE",
        montgomery_coeffs=None,  # (A, B) of the birationally equiv. Montgomery curve
    ):
        self.base = base
        self.name = name
        self.a_host = a_host
        self.d_host = d_host
        self.generator_host = generator_host
        self.cofactor = int(cofactor)
        self.cofactor_inv = pow(self.cofactor, -1, scalar_modulus)
        self.scalar_modulus = int(scalar_modulus)
        self.montgomery_coeffs = montgomery_coeffs
        self._dot_ok = None  # lazily probed (see _dot_small_a)

    def _dot_small_a(self):
        """Fused-wave eligibility: the base kind has a small-integer
        multiplication tensor AND the curve constant a is a small signed
        integer (a = -1 for every TE instance here), so a*A folds into
        integer dot weights.  Returns the small a or None."""
        if self._dot_ok is None:
            from ..fields import dot as dot_mod

            small = None
            if dot_mod.mul_tensor(self.base) is not None and isinstance(
                self.a_host, int
            ):
                small = dot_mod._as_small_int(
                    self.base.characteristic(), self.a_host % self.base.characteristic()
                )
            self._dot_ok = (small,)
        return self._dot_ok[0]

    # ------------------------------------------------------------ constants
    def _a(self, shape):
        return self.base.constant(self.a_host, shape)

    def _d(self, shape):
        return self.base.constant(self.d_host, shape)

    def zero(self, batch_shape=()):
        B = self.base
        return (
            B.zero(batch_shape),
            B.one(batch_shape),
            B.zero(batch_shape),
            B.one(batch_shape),
        )

    def generator(self, batch_shape=()):
        return self.from_affine(self.generator_affine(batch_shape))

    def generator_affine(self, batch_shape=()):
        gx, gy = self.generator_host
        return (
            self.base.constant(gx, batch_shape),
            self.base.constant(gy, batch_shape),
        )

    # ----------------------------------------------------------- predicates
    def is_zero(self, P):
        B = self.base
        return jnp.logical_and(B.is_zero(P[0]), B.equal(P[1], P[3]))

    def batch_shape(self, P):
        return self.base.batch_shape(P[0])

    def select(self, mask, P, Q):
        return tuple(self.base.select(mask, p, q) for p, q in zip(P, Q))

    def index_point(self, P, idx):
        return tuple(self.base.index(p, idx) for p in P)

    def equal(self, P, Q):
        """x1 z2 == x2 z1 && y1 z2 == y2 z1."""
        B = self.base
        return jnp.logical_and(
            B.equal(B.mul(P[0], Q[3]), B.mul(Q[0], P[3])),
            B.equal(B.mul(P[1], Q[3]), B.mul(Q[1], P[3])),
        )

    # ------------------------------------------------------------ group law
    def neg(self, P):
        B = self.base
        return (B.neg(P[0]), P[1], B.neg(P[2]), P[3])

    def double(self, P):
        """dbl-2008-hwcd (group.rs:160-164).

        With a small-integer curve a, runs as TWO fused multi-output
        Montgomery kernels (fields/dot.py waves) + cheap linear mixes
        instead of ~9 chained muls."""
        B = self.base
        X1, Y1, T1, Z1 = P
        alpha = self._dot_small_a()
        if alpha is not None:
            from ..fields import dot as dot_mod

            A, Bv, C2, E = dot_mod.dot_multi(B, [
                [(1, X1, X1)],
                [(1, Y1, Y1)],
                [(2, Z1, Z1)],
                [(2, X1, Y1)],  # (X+Y)^2 - A - Bv == 2XY
            ])
            D = self._scale_small(A, alpha)
            G = B.add(D, Bv)
            F = B.sub(G, C2)
            H = B.sub(D, Bv)
            X3, Y3, T3, Z3 = dot_mod.dot_multi(B, [
                [(1, E, F)],
                [(1, G, H)],
                [(1, E, H)],
                [(1, F, G)],
            ])
            return (X3, Y3, T3, Z3)
        shape = B.batch_shape(X1)
        A = B.square(X1)
        Bv = B.square(Y1)
        C = B.double(B.square(Z1))
        D = B.mul(self._a(shape), A)
        E = B.sub(B.sub(B.square(B.add(X1, Y1)), A), Bv)
        G = B.add(D, Bv)
        F = B.sub(G, C)
        H = B.sub(D, Bv)
        return (B.mul(E, F), B.mul(G, H), B.mul(E, H), B.mul(F, G))

    def _scale_small(self, x, k: int):
        """x * k for a small host integer k (folds the TE curve a)."""
        B = self.base
        if k < 0:
            return B.neg(self._scale_small(x, -k))
        if k == 0:
            return B.zero(B.batch_shape(x))
        if k == 1:
            return x
        acc = x
        for bit in bin(k)[3:]:
            acc = B.add(acc, acc)
            if bit == "1":
                acc = B.add(acc, x)
        return acc

    def add(self, P, Q):
        """Unified add-2008-hwcd — exception-free on complete TE curves,
        including P == Q and the identity (group.rs:241-246).

        With a small-integer curve a, runs as THREE fused multi-output
        Montgomery kernels (the curve d stays a broadcast constant
        operand) instead of ~9 chained muls."""
        B = self.base
        X1, Y1, T1, Z1 = P
        X2, Y2, T2, Z2 = Q
        alpha = self._dot_small_a()
        if alpha is not None:
            from ..fields import dot as dot_mod

            A, Bv, TT, D, E = dot_mod.dot_multi(B, [
                [(1, X1, X2)],
                [(1, Y1, Y2)],
                [(1, T1, T2)],
                [(1, Z1, Z2)],
                [(1, X1, Y2), (1, Y1, X2)],  # (X1+Y1)(X2+Y2) - A - Bv
            ])
            dC = B.constant(self.d_host)
            (C,) = dot_mod.dot_multi(B, [[(1, dC, TT)]])
            F = B.sub(D, C)
            G = B.add(D, C)
            H = B.sub(Bv, self._scale_small(A, alpha))
            X3, Y3, T3, Z3 = dot_mod.dot_multi(B, [
                [(1, E, F)],
                [(1, G, H)],
                [(1, E, H)],
                [(1, F, G)],
            ])
            return (X3, Y3, T3, Z3)
        shape = B.batch_shape(X1)
        A = B.mul(X1, X2)
        Bv = B.mul(Y1, Y2)
        C = B.mul(B.mul(self._d(shape), T1), T2)
        D = B.mul(Z1, Z2)
        E = B.sub(B.sub(B.mul(B.add(X1, Y1), B.add(X2, Y2)), A), Bv)
        F = B.sub(D, C)
        G = B.add(D, C)
        H = B.sub(Bv, B.mul(self._a(shape), A))
        return (B.mul(E, F), B.mul(G, H), B.mul(E, H), B.mul(F, G))

    def add_mixed(self, P, aff):
        """Unified mixed addition (affine Q: Z2 = 1, T2 = x2*y2)."""
        B = self.base
        x2, y2 = aff
        return self.add(P, (x2, y2, B.mul(x2, y2), B.one(B.batch_shape(x2))))

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    # ------------------------------------------------------- representation
    def from_affine(self, aff):
        B = self.base
        x, y = aff
        return (x, y, B.mul(x, y), B.one(B.batch_shape(x)))

    def to_affine(self, P):
        B = self.base
        X, Y, T, Z = P
        zinv = B.inverse(Z)
        return (B.mul(X, zinv), B.mul(Y, zinv))

    def affine_neg(self, aff):
        return (self.base.neg(aff[0]), aff[1])

    def is_on_curve(self, aff):
        """a x^2 + y^2 == 1 + d x^2 y^2 (affine.rs on-curve check)."""
        B = self.base
        x, y = aff
        shape = B.batch_shape(x)
        x2, y2 = B.square(x), B.square(y)
        lhs = B.add(B.mul(self._a(shape), x2), y2)
        rhs = B.add(B.one(shape), B.mul(B.mul(self._d(shape), x2), y2))
        return B.equal(lhs, rhs)

    # ----------------------------------------------------------- scalar mul
    def scalar_mul(self, P, scalars: jnp.ndarray):
        bits = scalar_bits_le(scalars)  # [nbits, ...] (limb-major scalars)
        acc = self.zero(self.batch_shape(P))

        def body(acc, bit):
            acc = self.double(acc)
            acc = self.select(bit, self.add(acc, P), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits[::-1])
        return acc

    def mul_int(self, P, k: int):
        k = int(k)
        if k == 0:
            return self.zero(self.batch_shape(P))
        if k < 0:
            return self.neg(self.mul_int(P, -k))
        acc = self.zero(self.batch_shape(P))
        nbits = k.bit_length()
        if nbits <= 4:
            for bit in bin(k)[2:]:
                acc = self.double(acc)
                if bit == "1":
                    acc = self.add(acc, P)
            return acc
        bits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
        )
        shape = self.batch_shape(P)

        def body(acc, bit):
            acc = self.double(acc)
            acc = self.select(jnp.broadcast_to(bit, shape), self.add(acc, P), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits)
        return acc

    def clear_cofactor(self, P):
        return self.mul_int(P, self.cofactor)

    def is_in_correct_subgroup(self, P):
        return self.is_zero(self.mul_int(P, self.scalar_modulus))

    def host_is_in_correct_subgroup(self, pt) -> bool:
        """Host-side subgroup check: [r]pt == (0, 1) (Validate::Yes parity
        with twisted_edwards/affine.rs)."""
        if self.cofactor == 1:
            return True
        hf = _host_field_of(self.base)
        kpt = self.host_mul_raw(pt, self.scalar_modulus)
        return hf.equal(kpt[0], hf.zero()) and hf.equal(kpt[1], hf.one())

    def host_mul_raw(self, P, k: int):
        """Scalar mul WITHOUT reduction mod r (for out-of-subgroup inputs)."""
        hf = _host_field_of(self.base)
        acc = (hf.zero(), hf.one())
        for bit in bin(int(k))[2:] if k else "":
            acc = self.host_add(acc, acc)
            if bit == "1":
                acc = self.host_add(acc, P)
        return acc

    # --------------------------------------------- Montgomery curve mapping
    def to_montgomery_host(self, pt):
        """Host-side TE (x, y) -> birationally equivalent Montgomery (x, y):
        (u, v) = ((1+y)/(1-y), (1+y)/((1-y)x)) (mod exceptional points);
        mirrors twisted_edwards/affine.rs <-> MontCurveConfig conversions."""
        hf = _host_field_of(self.base)
        x, y = pt
        one = hf.one()
        u = hf.mul(hf.add(one, y), hf.inv(hf.sub(one, y)))
        v = hf.mul(u, hf.inv(x))
        return (u, v)

    # ------------------------------------------------------------- host I/O
    def from_host(self, points):
        B = self.base
        x = B.stack([B.constant(p[0]) for p in points])
        y = B.stack([B.constant(p[1]) for p in points])
        return (x, y)

    def to_host(self, P):
        x, y = self.to_affine(P)
        xs = self.base.to_int(x)
        ys = self.base.to_int(y)
        if not isinstance(xs, list):
            return (xs, ys)
        return list(zip(xs, ys))

    def random_host(self, rng, n: int):
        return [self.host_mul(self.generator_host, rng.randrange(1, self.scalar_modulus)) for _ in range(n)]

    # host-side group law for oracles
    def host_add(self, P, Q):
        hf = _host_field_of(self.base)
        x1, y1 = P
        x2, y2 = Q
        if isinstance(self.a_host, int):
            a = hf.from_base_prime(self.a_host)
            d = hf.from_base_prime(self.d_host)
        else:
            a, d = self.a_host, self.d_host
        dxy = hf.mul(hf.mul(d, hf.mul(x1, x2)), hf.mul(y1, y2))
        one = hf.one()
        x3 = hf.mul(
            hf.add(hf.mul(x1, y2), hf.mul(y1, x2)), hf.inv(hf.add(one, dxy))
        )
        y3 = hf.mul(
            hf.sub(hf.mul(y1, y2), hf.mul(a, hf.mul(x1, x2))),
            hf.inv(hf.sub(one, dxy)),
        )
        return (x3, y3)

    def host_mul(self, P, k: int):
        k = int(k) % self.scalar_modulus
        hf = _host_field_of(self.base)
        acc = (hf.zero(), hf.one())
        for bit in bin(k)[2:] if k else "":
            acc = self.host_add(acc, acc)
            if bit == "1":
                acc = self.host_add(acc, P)
        return acc

    def __repr__(self):
        return f"TECurve({self.name})"
