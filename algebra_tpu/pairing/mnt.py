"""MNT4/MNT6-family ate pairings, batched over pairs.

Re-design of the reference's MNT engines
(ec/src/models/mnt4/{mod,g1,g2}.rs and the structurally identical
mnt6/*): the "flipped" Miller loop with extended-projective double/add
coefficient recurrences (mnt4/mod.rs:54-137) fused into a lax.scan, G1
preparation carrying twisted coordinates (mnt4/g1.rs:24-41), and the
two-chunk final exponentiation f^((p^k/2 - 1)) then w1*p + w0
(mnt4/mod.rs:165-197).  The two families differ only in the coefficient
field (Fp2 vs Fp3) and target tower (Fp4 = 2-over-2 vs Fp6 = 2-over-3) —
one generic engine serves both (``MNT4 = MNTEngine`` over Fp2/Fp4,
``MNT6`` over Fp3/Fp6).

Like the reference, this repo instantiates no concrete MNT pairing
parameters (test-curves ships only the MNT fields and the MNT4-753 G1;
the pairing constants live in the downstream curves repo) — the engine
mirrors the reference's family-level surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class MNTEngine:
    def __init__(
        self,
        g1,
        g2,
        target,  # QuadExtField over the coefficient field (Fp4 or Fp6)
        twist_host,  # Fp2 host value: TWIST
        twist_coeff_a_host,  # Fp2 host value: TWIST_COEFF_A
        ate_loop_count,  # big-endian digits in {-1, 0, 1} (incl. leading 1)
        ate_is_loop_count_neg: bool,
        final_exponent_last_chunk_1: int,
        final_exponent_last_chunk_w0_abs: int,
        final_exponent_last_chunk_w0_is_neg: bool,
    ):
        self.g1 = g1
        self.g2 = g2
        self.target = target
        self.coeff_field = target.base
        self.fq = g1.base
        self.twist_host = twist_host
        self.twist_coeff_a_host = twist_coeff_a_host
        self.ate = [int(d) for d in ate_loop_count]
        self.ate_neg = bool(ate_is_loop_count_neg)
        self.w1 = int(final_exponent_last_chunk_1)
        self.w0_abs = int(final_exponent_last_chunk_w0_abs)
        self.w0_neg = bool(final_exponent_last_chunk_w0_is_neg)

    # ---------------------------------------------------------------- steps
    #
    # The extended-projective recurrences are hand-decomposed into fused
    # ``dot_multi`` waves over the coefficient field (a few multi-output
    # Montgomery kernels per step instead of ~13 tower muls + ~15 linear
    # kernels), with the verbatim formulas as fallback.  The derivations
    # use the loop invariant t == z^2 (r0 has t = z = 1; both steps
    # maintain nt = nz^2), which collapses every (u+v)^2-u^2-v^2 trick
    # back to its 2uv product.

    def _double_step(self, r, shape):
        """(mod.rs doubling_for_flipped_miller_loop:54-90)."""
        from ..fields import dot as dot_mod

        F2 = self.coeff_field
        x, y, z, t = r
        w1 = dot_mod.dot_multi(F2, [
            [(1, t, t)],
            [(1, x, x)],
            [(1, y, y)],
            [(1, y, z)],   # nz = (y+z)^2 - c - z^2 == 2yz
        ])
        if w1 is None:
            return self._double_step_generic(r, shape)
        a, b, c, yz = w1
        taC = F2.constant(self.twist_coeff_a_host)
        # taa = TWIST_COEFF_A * a; e = (x+c)^2 - b - d == 2xc;
        # nt = nz^2 = 4(yz)^2; c_h = (nz+t)^2 - nt - a == 2*nz*t = 4*yz*t
        taa, e, nt, c_h = dot_mod.dot_multi(F2, [
            [(1, taC, a)],
            [(2, x, c)],
            [(4, yz, yz)],
            [(4, yz, t)],
        ])
        nz = F2.double(yz)
        # with f = 3b + taa, g = f^2:
        #   nx  = g - 4e = 9b^2 + 6b*taa + taa^2 - 8xc
        #   c_j = (f+t)^2 - g - a == 2ft = 6bt + 2*taa*t
        #   c_l = (f+x)^2 - g - b == 2fx = 6bx + 2*taa*x
        nx, c_j, c_l = dot_mod.dot_multi(F2, [
            [(9, b, b), (6, b, taa), (1, taa, taa), (-8, x, c)],
            [(6, b, t), (2, taa, t)],
            [(6, b, x), (2, taa, x)],
        ])
        s = F2.sub(F2.double(e), nx)
        # ny = f*(2e - nx) - 8d, d = c^2
        (ny,) = dot_mod.dot_multi(F2, [
            [(3, b, s), (1, taa, s), (-8, c, c)],
        ])
        coeff = dict(c_h=c_h, c_4c=F2.double(F2.double(c)), c_j=c_j, c_l=c_l)
        return (nx, ny, nz, nt), coeff

    def _double_step_generic(self, r, shape):
        F2 = self.coeff_field
        x, y, z, t = r
        a = F2.square(t)
        b = F2.square(x)
        c = F2.square(y)
        d = F2.square(c)
        e = F2.sub(F2.sub(F2.square(F2.add(x, c)), b), d)
        ta = F2.constant(self.twist_coeff_a_host, shape)
        f = F2.add(F2.add(F2.double(b), b), F2.mul(ta, a))
        g = F2.square(f)
        d8 = F2.double(F2.double(F2.double(d)))
        nx = F2.sub(g, F2.double(F2.double(e)))
        ny = F2.sub(F2.mul(f, F2.sub(F2.double(e), nx)), d8)
        nz = F2.sub(F2.sub(F2.square(F2.add(y, z)), c), F2.square(z))
        nt = F2.square(nz)
        coeff = dict(
            c_h=F2.sub(F2.sub(F2.square(F2.add(nz, t)), nt), a),
            c_4c=F2.double(F2.double(c)),
            c_j=F2.sub(F2.sub(F2.square(F2.add(f, t)), g), a),
            c_l=F2.sub(F2.sub(F2.square(F2.add(f, x)), g), b),
        )
        return (nx, ny, nz, nt), coeff

    def _add_step(self, r, qx, qy):
        """(mod.rs mixed_addition_for_flipped_miller_loop:92-120)."""
        from ..fields import dot as dot_mod

        F2 = self.coeff_field
        x, y, z, t = r
        w1 = dot_mod.dot_multi(F2, [
            [(1, z, qy)],  # (z+qy)^2 - qy^2 - t == 2*z*qy  (t == z^2)
            [(1, t, qx)],
        ])
        if w1 is None:
            return self._add_step_generic(r, qx, qy)
        zqy, b = w1
        h = F2.sub(b, x)
        # d = 2*z*qy*t; i = h^2; nz = (z+h)^2 - t - i == 2zh
        d, i, nz = dot_mod.dot_multi(F2, [
            [(2, zqy, t)],
            [(1, h, h)],
            [(2, z, h)],
        ])
        l1 = F2.sub(d, F2.double(y))
        # e = 4i; j = h*e; v = x*e
        # nx = l1^2 - j - 2v = l1^2 - 4hi - 8xi; nt = nz^2
        j, v, nx, nt = dot_mod.dot_multi(F2, [
            [(4, h, i)],
            [(4, x, i)],
            [(1, l1, l1), (-4, h, i), (-8, x, i)],
            [(1, nz, nz)],
        ])
        s = F2.sub(v, nx)
        # ny = l1*(v - nx) - 2*y*j
        (ny,) = dot_mod.dot_multi(F2, [
            [(1, l1, s), (-2, y, j)],
        ])
        return (nx, ny, nz, nt), dict(c_l1=l1, c_rz=nz)

    def _add_step_generic(self, r, qx, qy):
        F2 = self.coeff_field
        x, y, z, t = r
        a = F2.square(qy)
        b = F2.mul(t, qx)
        d = F2.mul(F2.sub(F2.sub(F2.square(F2.add(z, qy)), a), t), t)
        h = F2.sub(b, x)
        i = F2.square(h)
        e = F2.double(F2.double(i))
        j = F2.mul(h, e)
        v = F2.mul(x, e)
        l1 = F2.sub(d, F2.double(y))
        nx = F2.sub(F2.sub(F2.square(l1), j), F2.double(v))
        ny = F2.sub(F2.mul(l1, F2.sub(v, nx)), F2.mul(j, F2.double(y)))
        nz = F2.sub(F2.sub(F2.square(F2.add(z, h)), t), i)
        nt = F2.square(nz)
        return (nx, ny, nz, nt), dict(c_l1=l1, c_rz=nz)

    # ---------------------------------------------------------------- loop
    def miller_loop(self, p_aff, q_aff):
        """Batched flipped-ate Miller loop (mod.rs ate_miller_loop:122-163)
        with preparation fused in; lanes with infinity inputs yield 1."""
        F2, F4 = self.coeff_field, self.target
        px, py, p_inf = p_aff
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(px)

        twist = F2.constant(self.twist_host, shape)
        # G1 prepared (g1.rs:24-41): x_twist = TWIST * x, y_twist = TWIST * y
        x_twist = F2.mul_by_base(twist, px)
        y_twist = F2.mul_by_base(twist, py)
        # G2 prepared (g2.rs:41-47): x/y over twist
        twist_inv = F2.inverse(twist)
        x_over_twist = F2.mul(qx, twist_inv)
        y_over_twist = F2.mul(qy, twist_inv)
        neg_y_over_twist = F2.neg(y_over_twist)

        # l1_coeff = embed(px) - x_over_twist  (mnt4/mod.rs:123)
        from ..fields.cubic import CubicExtField

        arity = 3 if isinstance(F2, CubicExtField) else 2
        embedded = (px,) + tuple(self.fq.zero(shape) for _ in range(arity - 1))
        l1_coeff = F2.sub(embedded, x_over_twist)

        r0 = (qx, qy, F2.one(shape), F2.one(shape))
        f0 = F4.one(shape)
        digits = jnp.asarray(self.ate[1:], jnp.int8)  # big-endian, skip MSB

        def sel4(mask, a, b):
            return tuple(F2.select(mask, u, v) for u, v in zip(a, b))

        def body(carry, d):
            f, r = carry
            r, dc = self._double_step(r, shape)
            g_rr = (
                F2.add(F2.sub(F2.neg(dc["c_4c"]), F2.mul(dc["c_j"], x_twist)),
                       dc["c_l"]),
                F2.mul(dc["c_h"], y_twist),
            )
            f = F4.mul(F4.square(f), g_rr)

            is_neg = jnp.broadcast_to(d == -1, shape)
            qy_sel = F2.select(is_neg, F2.neg(qy), qy)
            y_over_sel = F2.select(is_neg, neg_y_over_twist, y_over_twist)
            r_add, ac = self._add_step(r, qx, qy_sel)
            g_rq = (
                F2.mul(ac["c_rz"], y_twist),
                F2.neg(
                    F2.add(F2.mul(y_over_sel, ac["c_rz"]),
                           F2.mul(l1_coeff, ac["c_l1"]))
                ),
            )
            f_add = F4.mul(f, g_rq)
            m = jnp.broadcast_to(d != 0, shape)
            f = F4.select(m, f_add, f)
            r = sel4(m, r_add, r)
            return (f, r), None

        (f, r), _ = jax.lax.scan(body, (f0, r0), digits)

        if self.ate_neg:
            # add -R to R: minus_r affine from r, then one more add step
            rx, ry, rz, rt = r
            rz_inv = F2.inverse(rz)
            rz2 = F2.square(rz_inv)
            rz3 = F2.mul(rz_inv, rz2)
            mx = F2.mul(rx, rz2)
            my = F2.neg(F2.mul(ry, rz3))
            _, ac = self._add_step(r, mx, my)
            g = (
                F2.mul(ac["c_rz"], y_twist),
                F2.neg(
                    F2.add(F2.mul(y_over_twist, ac["c_rz"]),
                           F2.mul(l1_coeff, ac["c_l1"]))
                ),
            )
            f = F4.inverse(F4.mul(f, g))

        skip = jnp.logical_or(p_inf, q_inf)
        return F4.select(skip, F4.one(shape), f)

    # ------------------------------------------------------------ prepared G2
    def prepare_g2(self, q_aff):
        """G2Prepared for the flipped ate loop: run the double/add
        coefficient recurrence once per Q, stacking the per-step
        coefficients (the reference's AteDoubleCoefficients /
        AteAdditionCoefficients, mnt4/g2.rs:24-90), together with
        x/y over twist and the ate_neg tail-add coefficients.  Opaque
        pytree for ``miller_loop_prepared``."""
        F2 = self.coeff_field
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(jax.tree_util.tree_leaves(qx)[0])

        twist = F2.constant(self.twist_host, shape)
        twist_inv = F2.inverse(twist)
        x_over_twist = F2.mul(qx, twist_inv)
        y_over_twist = F2.mul(qy, twist_inv)

        r0 = (qx, qy, F2.one(shape), F2.one(shape))
        digits = jnp.asarray(self.ate[1:], jnp.int8)

        def sel4(mask, a, b):
            return tuple(F2.select(mask, u, v) for u, v in zip(a, b))

        def body(r, d):
            r, dc = self._double_step(r, shape)
            is_neg = jnp.broadcast_to(d == -1, shape)
            qy_sel = F2.select(is_neg, F2.neg(qy), qy)
            r_add, ac = self._add_step(r, qx, qy_sel)
            m = jnp.broadcast_to(d != 0, shape)
            r = sel4(m, r_add, r)
            return r, (dc, ac)

        r, (dcs, acs) = jax.lax.scan(body, r0, digits)

        tail_ac = None
        if self.ate_neg:
            rx, ry, rz, rt = r
            rz_inv = F2.inverse(rz)
            rz2 = F2.square(rz_inv)
            rz3 = F2.mul(rz_inv, rz2)
            mx = F2.mul(rx, rz2)
            my = F2.neg(F2.mul(ry, rz3))
            _, tail_ac = self._add_step(r, mx, my)
        return dict(
            dcs=dcs, acs=acs, tail_ac=tail_ac,
            x_over_twist=x_over_twist, y_over_twist=y_over_twist,
            q_inf=q_inf,
        )

    def miller_loop_prepared(self, p_aff, prepared):
        """Flipped ate loop from precomputed coefficients — bit-identical
        output to ``miller_loop`` (mnt4/mod.rs:122-163 consuming
        ``G2Prepared``); only the target square + two g-evaluations per
        step remain."""
        F2, F4 = self.coeff_field, self.target
        px, py, p_inf = p_aff
        shape = self.fq.batch_shape(px)

        twist = F2.constant(self.twist_host, shape)
        x_twist = F2.mul_by_base(twist, px)
        y_twist = F2.mul_by_base(twist, py)

        from ..fields.cubic import CubicExtField

        arity = 3 if isinstance(F2, CubicExtField) else 2
        embedded = (px,) + tuple(self.fq.zero(shape) for _ in range(arity - 1))
        l1_coeff = F2.sub(embedded, prepared["x_over_twist"])

        y_over_twist = prepared["y_over_twist"]
        neg_y_over_twist = F2.neg(y_over_twist)
        digits = jnp.asarray(self.ate[1:], jnp.int8)

        def body(f, step):
            dc, ac, d = step
            g_rr = (
                F2.add(F2.sub(F2.neg(dc["c_4c"]), F2.mul(dc["c_j"], x_twist)),
                       dc["c_l"]),
                F2.mul(dc["c_h"], y_twist),
            )
            f = F4.mul(F4.square(f), g_rr)
            is_neg = jnp.broadcast_to(d == -1, shape)
            y_over_sel = F2.select(is_neg, neg_y_over_twist, y_over_twist)
            g_rq = (
                F2.mul(ac["c_rz"], y_twist),
                F2.neg(
                    F2.add(F2.mul(y_over_sel, ac["c_rz"]),
                           F2.mul(l1_coeff, ac["c_l1"]))
                ),
            )
            f_add = F4.mul(f, g_rq)
            m = jnp.broadcast_to(d != 0, shape)
            f = F4.select(m, f_add, f)
            return f, None

        f, _ = jax.lax.scan(
            body, F4.one(shape), (prepared["dcs"], prepared["acs"], digits)
        )

        if self.ate_neg:
            ac = prepared["tail_ac"]
            g = (
                F2.mul(ac["c_rz"], y_twist),
                F2.neg(
                    F2.add(F2.mul(y_over_twist, ac["c_rz"]),
                           F2.mul(l1_coeff, ac["c_l1"]))
                ),
            )
            f = F4.inverse(F4.mul(f, g))

        skip = jnp.logical_or(p_inf, prepared["q_inf"])
        return F4.select(skip, F4.one(shape), f)

    # ------------------------------------------------------------ final exp
    def final_exponentiation(self, f):
        """Easy chunk then f^(w1*p + w0) (mnt4/mod.rs:165-212 and the
        mnt6 analog).  MNT4 (k=4): easy = q^2 - 1; MNT6 (k=6):
        easy = (q^3 - 1)(q + 1) — the extra (q+1) Frobenius factor is
        the one structural difference between the two engines."""
        F4 = self.target
        f_inv = F4.inverse(f)
        first = self._first_chunk(f, f_inv)
        first_inv = self._first_chunk(f_inv, f)
        return self._last_chunk(first, first_inv)

    def _first_chunk(self, elt, elt_inv):
        F4 = self.target
        # elt^(q^{k/2}) == quadratic conjugate over the coefficient field
        base = F4.mul(F4.cyclotomic_inverse(elt), elt_inv)
        from ..fields.cubic import CubicExtField

        if isinstance(self.coeff_field, CubicExtField):  # MNT6
            base = F4.mul(F4.frobenius(base, 1), base)
        return base

    def _last_chunk(self, elt, elt_inv):
        F4 = self.target
        elt_q = F4.frobenius(elt, 1)
        w1_part = F4.cyclotomic_exp(elt_q, self.w1)
        base = elt_inv if self.w0_neg else elt
        w0_part = F4.cyclotomic_exp(base, self.w0_abs)
        return F4.mul(w1_part, w0_part)

    def pairing(self, p_aff, q_aff):
        return self.final_exponentiation(self.miller_loop(p_aff, q_aff))


MNT4 = MNTEngine  # target = Fp4 (quadratic over Fp2), coeffs in Fp2
MNT6 = MNTEngine  # target = Fp6 (quadratic over Fp3), coeffs in Fp3
