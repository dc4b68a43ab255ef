"""Short Weierstrass curves: batched Jacobian-coordinate group kernels.

TPU-native re-design of the reference's SW module
(ec/src/models/short_weierstrass/{mod,affine,group}.rs): a *curve kind*
is a singleton object whose methods act on batched point values, the way
field kinds act on batched limb arrays.

Representations
  * projective batch: ``(x, y, z)`` tuple of base-field values in Jacobian
    coordinates (affine x = X/Z^2, y = Y/Z^3); the point at infinity is any
    representative with Z == 0 (matching the reference's convention,
    group.rs `is_zero = z.is_zero()`).
  * affine batch: ``(x, y, inf)`` with ``inf`` a boolean batch mask
    (the reference's `Affine { x, y, infinity }`).

All group laws are branchless: the add kernels evaluate the generic
formula plus the exceptional cases (doubling, identity) and select, so one
kernel instance serves every lane of a batch.  Formulas are the standard
EFD ones the reference also uses: dbl-2009-l / dbl-2007-bl,
add-2007-bl, madd-2007-bl (group.rs:171-232,443-453,302-319).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Field


def scalar_bits_le(scalars: jnp.ndarray) -> jnp.ndarray:
    """uint32[Ls, *batch] 16-bit-limb scalars -> bool[16*Ls, *batch] LE bits."""
    L = scalars.shape[0]
    batch_ndim = scalars.ndim - 1
    shifts = jnp.arange(16, dtype=jnp.uint32).reshape((1, 16) + (1,) * batch_ndim)
    bits = (scalars[:, None] >> shifts) & jnp.uint32(1)
    return bits.reshape((16 * L,) + scalars.shape[1:]).astype(jnp.bool_)


class SWCurve:
    """y^2 = x^3 + a*x + b over a base field kind."""

    def __init__(
        self,
        base: Field,
        a_host,
        b_host,
        generator_host,  # (x, y) host values in base-field representation
        cofactor: int,
        scalar_modulus: int,
        name: str = "SW",
        glv=None,
    ):
        self.base = base
        self.name = name
        self.a_host = a_host
        self.b_host = b_host
        self.generator_host = generator_host
        self.cofactor = int(cofactor)
        self.cofactor_inv = pow(self.cofactor, -1, scalar_modulus)
        self.scalar_modulus = int(scalar_modulus)
        self.a_is_zero = base.is_zero(base.constant(a_host))
        self.a_is_zero = bool(jax.device_get(self.a_is_zero))
        self.glv = glv
        # optional fast subgroup checks installed by curve instances
        # (e.g. BLS12-381 sigma/psi endomorphism checks); signatures:
        #   host fn: (curve, host_pt) -> bool      (host_pt never None)
        #   device fn: (curve, affine_batch) -> bool array
        self.subgroup_check_host = None
        self.subgroup_check_device = None
        from ..fields.prime import PrimeField

        self._prime_base = isinstance(base, PrimeField)
        self._dot_ok = None  # lazily probed: base kind has a mul tensor

    def _dot_available(self) -> bool:
        """True when the base kind supports the bilinear-form compiler
        (fields/dot.py) — then the group laws run as a few fused
        multi-output Montgomery kernels instead of chains of mul/add."""
        if self._dot_ok is None:
            from ..fields import dot as dot_mod

            self._dot_ok = dot_mod.mul_tensor(self.base) is not None
        return self._dot_ok

    def _use_fused(self, P):
        """Fused Pallas group-law kernels: prime base field, a == 0,
        large batch, TPU backend."""
        if not (self._prime_base and self.a_is_zero):
            return False
        from .. import config

        if not config.pallas_enabled():
            return False
        import numpy as np

        shape = self.base.batch_shape(P[0])
        n = int(np.prod(shape)) if shape else 1
        return n >= config.pallas_min_batch

    # ------------------------------------------------------------ constants
    def zero(self, batch_shape=()):
        """Point at infinity (1 : 1 : 0)."""
        one = self.base.one(batch_shape)
        return (one, one, self.base.zero(batch_shape))

    def generator(self, batch_shape=()):
        gx, gy = self.generator_host
        return (
            self.base.constant(gx, batch_shape),
            self.base.constant(gy, batch_shape),
            self.base.one(batch_shape),
        )

    def generator_affine(self, batch_shape=()):
        gx, gy = self.generator_host
        return (
            self.base.constant(gx, batch_shape),
            self.base.constant(gy, batch_shape),
            jnp.zeros(batch_shape, jnp.bool_),
        )

    def _mul_by_a(self, x):
        if self.a_is_zero:
            return self.base.zero(self.base.batch_shape(x))
        return self.base.mul(x, self.base.constant(self.a_host, self.base.batch_shape(x)))

    # ----------------------------------------------------------- predicates
    def is_zero(self, P):
        return self.base.is_zero(P[2])

    def batch_shape(self, P):
        return self.base.batch_shape(P[0])

    def select(self, mask, P, Q):
        """Lane-wise select between two point batches (mask over batch dims)."""
        return tuple(self.base.select(mask, p, q) for p, q in zip(P, Q))

    def index_point(self, P, idx):
        """Slice/gather a point batch along the leading batch axis."""
        return tuple(self.base.index(p, idx) for p in P)

    def equal(self, P, Q):
        """Projective equality x1 z2^2 == x2 z1^2 && y1 z2^3 == y2 z1^3."""
        B = self.base
        z1z1, z2z2 = B.square(P[2]), B.square(Q[2])
        xe = B.equal(B.mul(P[0], z2z2), B.mul(Q[0], z1z1))
        ye = B.equal(
            B.mul(P[1], B.mul(z2z2, Q[2])), B.mul(Q[1], B.mul(z1z1, P[2]))
        )
        both_inf = jnp.logical_and(self.is_zero(P), self.is_zero(Q))
        either_inf = jnp.logical_or(self.is_zero(P), self.is_zero(Q))
        return jnp.where(
            either_inf, both_inf, jnp.logical_and(xe, ye)
        )

    # ------------------------------------------------------------ group law
    def neg(self, P):
        return (P[0], self.base.neg(P[1]), P[2])

    def double(self, P):
        """Branchless Jacobian doubling.

        a == 0: dbl-2009-l (group.rs:176); general a: dbl-2007-bl
        (group.rs:210).  Infinity and 2-torsion fall out automatically
        (Z3 = 2*Y1*Z1 == 0).

        When the base kind has a small-integer multiplication tensor the
        a == 0 formula runs as THREE fused multi-output Montgomery
        kernels (fields/dot.py waves) instead of ~7 muls + ~8 adds —
        the same re-formulation as the pairing step functions.
        """
        if self._use_fused(P):
            from ..ops import sw_pallas

            return sw_pallas.double(self.base.spec, P)
        B = self.base
        X1, Y1, Z1 = P
        if self.a_is_zero:
            if self._dot_available():
                from ..fields import dot as dot_mod

                # dbl-2009-l algebraically flattened:
                #   A = X^2, Bv = Y^2, D = 4*X*Bv,
                #   X3 = 9*A^2 - 8*X*Bv, Z3 = 2*Y*Z,
                #   Y3 = 3*A*(D - X3) - 8*Bv^2
                A, Bv, Z3 = dot_mod.dot_multi(B, [
                    [(1, X1, X1)],
                    [(1, Y1, Y1)],
                    [(2, Y1, Z1)],
                ])
                D, X3 = dot_mod.dot_multi(B, [
                    [(4, X1, Bv)],
                    [(9, A, A), (-8, X1, Bv)],
                ])
                S = B.sub(D, X3)
                (Y3,) = dot_mod.dot_multi(B, [
                    [(3, A, S), (-8, Bv, Bv)],
                ])
                return (X3, Y3, Z3)
            A = B.square(X1)
            Bv = B.square(Y1)
            C = B.square(Bv)
            # D = 2*((X1+B)^2 - A - C)
            D = B.double(B.sub(B.sub(B.square(B.add(X1, Bv)), A), C))
            E = B.add(B.double(A), A)  # 3A
            F = B.square(E)
            X3 = B.sub(F, B.double(D))
            Y3 = B.sub(B.mul(E, B.sub(D, X3)), B.double(B.double(B.double(C))))
            Z3 = B.double(B.mul(Y1, Z1))
            return (X3, Y3, Z3)
        XX = B.square(X1)
        YY = B.square(Y1)
        YYYY = B.square(YY)
        ZZ = B.square(Z1)
        S = B.double(B.sub(B.sub(B.square(B.add(X1, YY)), XX), YYYY))
        M = B.add(B.add(B.double(XX), XX), self._mul_by_a(B.square(ZZ)))
        X3 = B.sub(B.square(M), B.double(S))
        Y3 = B.sub(
            B.mul(M, B.sub(S, X3)),
            B.double(B.double(B.double(YYYY))),
        )
        Z3 = B.sub(B.sub(B.square(B.add(Y1, Z1)), YY), ZZ)
        return (X3, Y3, Z3)

    def add(self, P, Q):
        """Branchless full Jacobian addition (add-2007-bl, group.rs:443)."""
        if self._use_fused(P):
            from ..ops import sw_pallas

            return sw_pallas.add(self.base.spec, P, Q)
        B = self.base
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        if self._dot_available():
            from ..fields import dot as dot_mod

            # add-2007-bl flattened into 5 fused waves.  With
            # rho = S2 - S1 (r = 2*rho), I = 4*H^2, J = H*I, V = U1*I:
            #   X3 = 4*rho^2 - 4*H^3 - 8*U1*H^2
            #   Y3 = 2*rho*(V - X3) - 8*S1*H^3
            #   Z3 = 2*Z1*Z2*H
            ZZ1, ZZ2, ZZ12, YZ12, YZ21 = dot_mod.dot_multi(B, [
                [(1, Z1, Z1)],
                [(1, Z2, Z2)],
                [(1, Z1, Z2)],
                [(1, Y1, Z2)],
                [(1, Y2, Z1)],
            ])
            U1, S1, H, rho = dot_mod.dot_multi(B, [
                [(1, X1, ZZ2)],
                [(1, YZ12, ZZ2)],
                [(1, X2, ZZ1), (-1, X1, ZZ2)],
                [(1, YZ21, ZZ1), (-1, YZ12, ZZ2)],
            ])
            HH, Z3 = dot_mod.dot_multi(B, [
                [(1, H, H)],
                [(2, ZZ12, H)],
            ])
            X3, V, J4 = dot_mod.dot_multi(B, [
                [(4, rho, rho), (-4, H, HH), (-8, U1, HH)],
                [(4, U1, HH)],
                [(4, H, HH)],
            ])
            S5 = B.sub(V, X3)
            (Y3,) = dot_mod.dot_multi(B, [
                [(2, rho, S5), (-2, S1, J4)],
            ])
            res = (X3, Y3, Z3)
            same = jnp.logical_and(B.is_zero(H), B.is_zero(rho))  # P == Q
        else:
            Z1Z1 = B.square(Z1)
            Z2Z2 = B.square(Z2)
            U1 = B.mul(X1, Z2Z2)
            U2 = B.mul(X2, Z1Z1)
            S1 = B.mul(Y1, B.mul(Z2, Z2Z2))
            S2 = B.mul(Y2, B.mul(Z1, Z1Z1))
            H = B.sub(U2, U1)
            r = B.double(B.sub(S2, S1))
            I = B.square(B.double(H))
            J = B.mul(H, I)
            V = B.mul(U1, I)
            X3 = B.sub(B.sub(B.square(r), J), B.double(V))
            Y3 = B.sub(B.mul(r, B.sub(V, X3)), B.double(B.mul(S1, J)))
            Z3 = B.mul(B.sub(B.sub(B.square(B.add(Z1, Z2)), Z1Z1), Z2Z2), H)
            res = (X3, Y3, Z3)
            same = jnp.logical_and(B.is_zero(H), B.is_zero(r))  # P == Q
        # exceptional cases
        res = self.select(same, self.double(P), res)
        res = self.select(self.is_zero(Q), P, res)
        res = self.select(self.is_zero(P), Q, res)
        return res

    def add_mixed(self, P, aff):
        """Branchless mixed addition P(+)= affine Q (madd-2007-bl,
        group.rs:302-319).  ``aff`` is an affine batch (x, y, inf)."""
        if self._use_fused(P):
            from ..ops import sw_pallas

            return sw_pallas.madd(self.base.spec, P, aff)
        B = self.base
        X1, Y1, Z1 = P
        X2, Y2, inf2 = aff
        if self._dot_available():
            from ..fields import dot as dot_mod

            # madd-2007-bl flattened into 5 fused waves.  With
            # rho = S2 - Y1 (r = 2*rho), I = 4*HH, J = H*I, V = X1*I:
            #   X3 = 4*rho^2 - 4*H*HH - 8*X1*HH
            #   Y3 = 2*rho*(V - X3) - 8*Y1*H*HH
            #   Z3 = 2*Z1*H
            ZZ, YZ = dot_mod.dot_multi(B, [
                [(1, Z1, Z1)],
                [(1, Y2, Z1)],
            ])
            U2, S2 = dot_mod.dot_multi(B, [
                [(1, X2, ZZ)],
                [(1, YZ, ZZ)],
            ])
            H = B.sub(U2, X1)
            rho = B.sub(S2, Y1)
            HH, Z3 = dot_mod.dot_multi(B, [
                [(1, H, H)],
                [(2, Z1, H)],
            ])
            X3, V, J4 = dot_mod.dot_multi(B, [
                [(4, rho, rho), (-4, H, HH), (-8, X1, HH)],
                [(4, X1, HH)],
                [(4, H, HH)],
            ])
            S5 = B.sub(V, X3)
            (Y3,) = dot_mod.dot_multi(B, [
                [(2, rho, S5), (-2, Y1, J4)],
            ])
            res = (X3, Y3, Z3)
            same = jnp.logical_and(B.is_zero(H), B.is_zero(rho))
        else:
            Z1Z1 = B.square(Z1)
            U2 = B.mul(X2, Z1Z1)
            S2 = B.mul(Y2, B.mul(Z1, Z1Z1))
            H = B.sub(U2, X1)
            r = B.double(B.sub(S2, Y1))
            HH = B.square(H)
            I = B.double(B.double(HH))
            J = B.mul(H, I)
            V = B.mul(X1, I)
            X3 = B.sub(B.sub(B.square(r), J), B.double(V))
            Y3 = B.sub(B.mul(r, B.sub(V, X3)), B.double(B.mul(Y1, J)))
            Z3 = B.sub(B.sub(B.square(B.add(Z1, H)), Z1Z1), HH)
            res = (X3, Y3, Z3)
            same = jnp.logical_and(B.is_zero(H), B.is_zero(r))
        res = self.select(same, self.double(P), res)
        res = self.select(inf2, P, res)
        res = self.select(self.is_zero(P), self.from_affine(aff), res)
        return res

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def affine_add(self, P, Q, inv_fn, neg1=None, neg2=None):
        """Branchless affine + affine -> affine addition.

        ``neg1``/``neg2``: optional boolean masks negating the y of the
        corresponding operand first (the MSM level-0 digit signs) —
        folded into the kernels so no separate [L, n] negate/select
        passes hit HBM.

        ``inv_fn`` supplies batched field inversion (amortized to ~3
        muls/lane by ops/mont_pallas.batch_inverse), making this ~7
        field muls per lane vs ~19 for the branchless Jacobian mixed
        add — the MSM affine bucket phase's core op.  Chord/tangent
        formulas (the same affine law the reference uses on host,
        short_weierstrass/affine.rs); all exceptional cases selected:
          P or Q at infinity -> other;  x1 == x2, y1 == y2 != 0 ->
          tangent (doubling);  x1 == x2 otherwise -> infinity.

        Large prime-field TPU batches run the fused kernel pair
        (ops/sw_pallas.affine_add): without fusion the ~10 elementwise
        [L, n] temporaries live in HBM and dominate both memory and
        bandwidth.
        """
        B = self.base
        if self._prime_base:
            from .. import config

            import numpy as np

            shape = B.batch_shape(P[0])
            nb = int(np.prod(shape)) if shape else 1
            if config.pallas_enabled() and nb >= config.pallas_min_batch:
                from ..bigint import int_to_limbs
                from ..ops import sw_pallas

                a_mont = None
                if not self.a_is_zero:
                    spec = B.spec
                    a_mont = tuple(int(v) for v in int_to_limbs(
                        (int(self.a_host) * spec.R) % spec.modulus,
                        spec.n_limbs))
                return sw_pallas.affine_add(B.spec, a_mont, P, Q, inv_fn,
                                            neg1=neg1, neg2=neg2)
        x1, y1, i1 = P
        x2, y2, i2 = Q
        if neg1 is not None:
            y1 = B.select(neg1, B.neg(y1), y1)
        if neg2 is not None:
            y2 = B.select(neg2, B.neg(y2), y2)
        d = B.sub(x2, x1)
        same_x = B.is_zero(d)
        y_eq = B.equal(y1, y2)
        y1_zero = B.is_zero(y1)
        dbl = jnp.logical_and(same_x, jnp.logical_and(y_eq,
                                                      jnp.logical_not(y1_zero)))
        opp = jnp.logical_and(same_x, jnp.logical_not(dbl))
        x1sq = B.square(x1)
        three_x1sq = B.add(B.add(x1sq, x1sq), x1sq)
        if not self.a_is_zero:
            three_x1sq = B.add(
                three_x1sq, B.constant(self.a_host, B.batch_shape(x1))
            )
        num = B.select(dbl, three_x1sq, B.sub(y2, y1))
        denom = B.select(dbl, B.add(y1, y1), d)
        degenerate = jnp.logical_or(jnp.logical_or(i1, i2), opp)
        shape = B.batch_shape(x1)
        denom = B.select(degenerate, B.one(shape), denom)
        lam = B.mul(num, inv_fn(denom))
        x3 = B.sub(B.sub(B.square(lam), x1), x2)
        y3 = B.sub(B.mul(lam, B.sub(x1, x3)), y1)
        x3 = B.select(i1, x2, B.select(i2, x1, x3))
        y3 = B.select(i1, y2, B.select(i2, y1, y3))
        inf3 = jnp.where(i1, i2, jnp.where(i2, i1, opp))
        return (x3, y3, inf3)

    # ------------------------------------------------------- representation
    def from_affine(self, aff):
        """(x, y, inf) -> Jacobian; infinity maps to (1,1,0)."""
        B = self.base
        x, y, inf = aff
        shape = B.batch_shape(x)
        one, zero = B.one(shape), B.zero(shape)
        return (
            B.select(inf, one, x),
            B.select(inf, one, y),
            B.select(inf, zero, one),
        )

    def to_affine(self, P):
        """Batch-normalize to affine (batched inversion of Z; the
        reference's ``normalize_batch``, group.rs:302)."""
        B = self.base
        X, Y, Z = P
        inf = self.is_zero(P)
        zinv = B.inverse(Z)  # fully batched Fermat inverse; 0 -> 0
        zinv2 = B.square(zinv)
        x = B.mul(X, zinv2)
        y = B.mul(Y, B.mul(zinv2, zinv))
        shape = B.batch_shape(x)
        x = B.select(inf, B.zero(shape), x)
        y = B.select(inf, B.one(shape), y)
        return (x, y, inf)

    def affine_neg(self, aff):
        return (aff[0], self.base.neg(aff[1]), aff[2])

    def is_on_curve(self, aff):
        """Affine on-curve check y^2 == x^3 + a x + b (affine.rs:144);
        infinity lanes count as on-curve."""
        B = self.base
        x, y, inf = aff
        shape = B.batch_shape(x)
        rhs = B.add(
            B.add(B.mul(B.square(x), x), self._mul_by_a(x)),
            B.constant(self.b_host, shape),
        )
        return jnp.logical_or(inf, B.equal(B.square(y), rhs))

    # ----------------------------------------------------------- scalar mul
    def scalar_mul(self, P, scalars: jnp.ndarray, use_glv: bool | None = None):
        """P * scalar for traced per-lane scalars (uint32[Ls, ...] canonical
        limb-major 16-bit limbs).  Branchless MSB-first double-and-add via
        lax.scan — the default `mul_bigint` path (short_weierstrass/mod.rs:75).

        Curves with GLV parameters route to the endomorphism-split joint
        double-and-add (ops/glv.glv_mul: ~half the scan depth,
        glv.rs:28-62) when the scalars cover the full field width."""
        if use_glv is None:
            use_glv = (self.glv is not None
                       and 16 * scalars.shape[0]
                       >= self.scalar_modulus.bit_length())
        if use_glv and self.glv is not None:
            from ..ops import glv as glv_mod

            return glv_mod.glv_mul(self, P, scalars)
        bits = scalar_bits_le(scalars)  # [nbits, ...]
        from ..utils.vma import match_vma

        acc = match_vma(self.zero(self.batch_shape(P)), (P, bits))

        def body(acc, bit):
            acc = self.double(acc)
            acc = self.select(bit, self.add(acc, P), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits[::-1])
        return acc

    def mul_bits_be(self, P, bits):
        """P * scalar from an explicit big-endian host bit sequence
        (Group::mul_bits_be, ec/src/lib.rs:100-117) — double-and-add over
        the given bits with NO reduction; bits may exceed the scalar
        field (the reference uses this for cofactor-sized multiplies)."""
        k = 0
        for b in bits:
            k = (k << 1) | int(bool(b))
        return self.mul_int(P, k)

    def mul_int(self, P, k: int):
        """P * k for a host-constant scalar (used by cofactor clearing and
        subgroup checks), via an on-device bit scan like mont.pow_fixed."""
        k = int(k)
        if k == 0:
            return self.zero(self.batch_shape(P))
        if k < 0:
            return self.neg(self.mul_int(P, -k))
        nbits = k.bit_length()
        if nbits <= 4:
            acc = None
            for bit in bin(k)[2:]:
                if acc is not None:
                    acc = self.double(acc)
                if bit == "1":
                    acc = P if acc is None else self.add(acc, P)
            return acc
        bits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
        )
        from ..utils.vma import match_vma

        acc = match_vma(self.zero(self.batch_shape(P)), P)
        shape = self.batch_shape(P)

        def body(acc, bit):
            acc = self.double(acc)
            acc = self.select(jnp.broadcast_to(bit, shape), self.add(acc, P), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits)
        return acc

    def clear_cofactor(self, P):
        """Default cofactor clearing = multiply by the cofactor
        (short_weierstrass/mod.rs:60); curves may provide faster effective
        cofactors at the instance level."""
        return self.mul_int(P, self.cofactor)

    def is_in_correct_subgroup(self, P):
        """Subgroup membership; instances may install a fast endomorphism
        check (subgroup_check_device), else [r]P == 0 (the reference's
        default, short_weierstrass/mod.rs:50)."""
        if self.subgroup_check_device is not None:
            inf = self.is_zero(P)
            return jnp.logical_or(inf, self.subgroup_check_device(self, P))
        return self.is_zero(self.mul_int(P, self.scalar_modulus))

    def host_is_in_correct_subgroup(self, pt) -> bool:
        """Host-side subgroup membership for an affine host point (None =
        infinity, always a member).  Mirrors Validate::Yes semantics of
        point deserialization (short_weierstrass/affine.rs:363-369)."""
        if pt is None:
            return True
        if self.cofactor == 1:
            return True  # prime-order curve: on-curve implies in-subgroup
        if self.subgroup_check_host is not None:
            return bool(self.subgroup_check_host(self, pt))
        return self.host_mul_raw(pt, self.scalar_modulus) is None

    # ------------------------------------------------------------- host I/O
    def from_host(self, points):
        """List of host affine points ((x, y) host values or None for
        infinity) -> affine batch."""
        B = self.base
        hf = _host_field_of(B)
        xs, ys, infs = [], [], []
        for pt in points:
            if pt is None:
                xs.append(hf.zero())
                ys.append(hf.one())
                infs.append(True)
            else:
                xs.append(pt[0])
                ys.append(pt[1])
                infs.append(False)
        x = B.stack([B.constant(v) for v in xs])
        y = B.stack([B.constant(v) for v in ys])
        return (x, y, jnp.asarray(infs))

    def to_host(self, P):
        """Projective batch -> list of host affine points (None = inf)."""
        x, y, inf = self.to_affine(P)
        xs = self.base.to_int(x)
        ys = self.base.to_int(y)
        infs = jax.device_get(inf)
        if infs.ndim == 0:
            return None if bool(infs) else (xs, ys)
        return [
            None if bool(i) else (xv, yv) for xv, yv, i in zip(xs, ys, infs)
        ]

    def random_host(self, rng, n: int):
        """n random subgroup points as host affine pairs (generator * k)."""
        # host-side scalar mult on affine ints via simple Jacobian emulation
        out = []
        for _ in range(n):
            k = rng.randrange(1, self.scalar_modulus)
            out.append(self.host_mul(self.generator_host, k))
        return out

    # host-side group law (python ints / tower tuples) for oracles
    def host_add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        hf = _host_field_of(self.base)
        x1, y1 = P
        x2, y2 = Q
        if hf.equal(x1, x2):
            if hf.equal(y1, y2) and not hf.equal(y1, hf.zero()):
                return self.host_double(P)
            return None
        lam = hf.mul(hf.sub(y2, y1), hf.inv(hf.sub(x2, x1)))
        x3 = hf.sub(hf.sub(hf.mul(lam, lam), x1), x2)
        y3 = hf.sub(hf.mul(lam, hf.sub(x1, x3)), y1)
        return (x3, y3)

    def host_double(self, P):
        if P is None:
            return None
        hf = _host_field_of(self.base)
        x1, y1 = P
        if hf.equal(y1, hf.zero()):
            return None
        if isinstance(self.a_host, int):
            a = hf.from_base_prime(self.a_host)
        else:
            a = self.a_host
        num = hf.add(hf.mul(hf.from_base_prime(3), hf.mul(x1, x1)), a)
        lam = hf.mul(num, hf.inv(hf.mul(hf.from_base_prime(2), y1)))
        x3 = hf.sub(hf.mul(lam, lam), hf.mul(hf.from_base_prime(2), x1))
        y3 = hf.sub(hf.mul(lam, hf.sub(x1, x3)), y1)
        return (x3, y3)

    def host_mul(self, P, k: int):
        return self.host_mul_raw(P, int(k) % self.scalar_modulus)

    def host_mul_raw(self, P, k: int):
        """Host scalar mul WITHOUT reduction mod r — needed for cofactor
        clearing, where the input is not yet in the r-torsion."""
        acc = None
        for bit in bin(int(k))[2:] if k else "":
            acc = self.host_double(acc)
            if bit == "1":
                acc = self.host_add(acc, P)
        return acc

    def __repr__(self):
        return f"SWCurve({self.name})"


def _host_field_of(base: Field):
    """Host (python big-int) field mirror of a device field kind."""
    from ..fields.host_tower import HostCubicExt, HostPrime, HostQuadExt
    from ..fields.prime import PrimeField
    from ..fields.cubic import CubicExtField
    from ..fields.quadratic import QuadExtField

    if isinstance(base, PrimeField):
        return HostPrime(base.spec.modulus)
    if isinstance(base, QuadExtField):
        return HostQuadExt(_host_field_of(base.base), base.nonresidue_host)
    if isinstance(base, CubicExtField):
        return HostCubicExt(_host_field_of(base.base), base.nonresidue_host)
    raise TypeError(f"no host mirror for {base}")
