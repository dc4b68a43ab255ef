"""BW6-family pairing (G2 over Fp, target Fp6 = 2-over-3), batched.

Re-design of the reference's BW6 engine (ec/src/models/bw6/{mod,g2}.rs,
eprint 2020/351): TWO Miller loops — f_{u+1,Q} over the bits of
ATE_LOOP_COUNT_1 and f_{u^3-u^2-u,Q} over the signed digits of
ATE_LOOP_COUNT_2 — combined as f_1 * frobenius(f_2) (Alg. 5), with the
Alg. 6 hard part built from nine x-power towers.  Both loops run as
lax.scans; line steps are the Fp homogeneous-projective recurrences
(bw6/g2.rs:128-173).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class BW6:
    def __init__(
        self,
        g1,
        g2,  # SWCurve over Fp (same base field as g1)
        fp6,  # Fp6Over3Field
        x_abs: int,
        x_is_negative: bool,
        ate_loop_count_1: int,  # u+1 (plain binary loop)
        ate_loop_count_1_is_neg: bool,
        ate_loop_count_2,  # little-endian signed digits of u^3-u^2-u
        ate_loop_count_2_is_neg: bool,
        twist_type: str = "M",
    ):
        self.g1 = g1
        self.g2 = g2
        self.fp6 = fp6
        self.fq = g1.base
        self.x_abs = int(x_abs)
        self.x_is_negative = bool(x_is_negative)
        self.ate1 = int(ate_loop_count_1)
        self.ate1_neg = bool(ate_loop_count_1_is_neg)
        self.ate2 = [int(d) for d in ate_loop_count_2]
        self.ate2_neg = bool(ate_loop_count_2_is_neg)
        self.twist_type = twist_type
        self.g2_b_host = g2.b_host

    # ---------------------------------------------------------------- steps
    #
    # Like the BLS12/BN steps (common.py), the homogeneous-projective
    # recurrences are hand-decomposed into fused ``dot_multi`` waves —
    # a few multi-output Montgomery kernels per step instead of ~20
    # chained mul/add kernels — with the generic formulas as fallback.

    def _double_step(self, r, shape):
        """bw6/g2.rs:128-151 (no half constants: doubled variants)."""
        from ..fields import dot as dot_mod

        F = self.fq
        x, y, z = r
        w1 = dot_mod.dot_multi(F, [
            [(1, x, y)],
            [(1, y, y)],
            [(1, z, z)],
            [(1, y, z)],   # h = (y+z)^2 - b - c == 2yz
            [(1, x, x)],
        ])
        if w1 is None:
            return self._double_step_generic(r, shape)
        a, b, c, yz, j = w1
        bC = F.constant(self.g2_b_host)
        (e,) = dot_mod.dot_multi(F, [[(3, bC, c)]])
        # with f = 3e, g = b + f:
        #   nx = 2a(b - f)         = 2ab - 6ae
        #   ny = g^2 - 12e^2       = b^2 + 6be - 3e^2
        #   nz = 4b * h            = 8 * b * yz
        nx, ny, nz = dot_mod.dot_multi(F, [
            [(2, a, b), (-6, a, e)],
            [(1, b, b), (6, b, e), (-3, e, e)],
            [(8, b, yz)],
        ])
        i = F.sub(e, b)
        j3 = F.add(F.double(j), j)
        neg_h = F.neg(F.double(yz))
        if self.twist_type == "M":
            coeffs = (i, j3, neg_h)
        else:
            coeffs = (neg_h, j3, i)
        return (nx, ny, nz), coeffs

    def _double_step_generic(self, r, shape):
        F = self.fq
        x, y, z = r
        a = F.mul(x, y)
        b = F.square(y)
        b4 = F.double(F.double(b))
        c = F.square(z)
        e = F.mul(F.constant(self.g2_b_host, shape), F.add(F.double(c), c))
        f = F.add(F.double(e), e)
        g = F.add(b, f)
        h = F.sub(F.square(F.add(y, z)), F.add(b, c))
        i = F.sub(e, b)
        j = F.square(x)
        e2sq = F.square(F.double(e))
        nx = F.mul(F.double(a), F.sub(b, f))
        ny = F.sub(F.square(g), F.add(F.double(e2sq), e2sq))
        nz = F.mul(b4, h)
        if self.twist_type == "M":
            coeffs = (i, F.add(F.double(j), j), F.neg(h))
        else:
            coeffs = (F.neg(h), F.add(F.double(j), j), i)
        return (nx, ny, nz), coeffs

    def _add_step(self, r, q_aff):
        """bw6/g2.rs:153-173."""
        from ..fields import dot as dot_mod

        F = self.fq
        x, y, z = r
        qx, qy = q_aff
        w1 = dot_mod.dot_multi(F, [
            [(1, qy, z)],
            [(1, qx, z)],
        ])
        if w1 is None:
            return self._add_step_generic(r, q_aff)
        qyz, qxz = w1
        theta = F.sub(y, qyz)
        lam = F.sub(x, qxz)
        c, d = dot_mod.dot_multi(F, [[(1, theta, theta)], [(1, lam, lam)]])
        e, f, g, jc = dot_mod.dot_multi(F, [
            [(1, lam, d)],
            [(1, z, c)],
            [(1, x, d)],
            [(1, theta, qx), (-1, lam, qy)],
        ])
        # h = e + f - 2g:
        #   nx = lam*h; ny = theta(g - h) - e*y; nz = z*e
        nx, ny, nz = dot_mod.dot_multi(F, [
            [(1, lam, e), (1, lam, f), (-2, lam, g)],
            [(3, theta, g), (-1, theta, e), (-1, theta, f), (-1, e, y)],
            [(1, z, e)],
        ])
        neg_theta = F.neg(theta)
        if self.twist_type == "M":
            coeffs = (jc, neg_theta, lam)
        else:
            coeffs = (lam, neg_theta, jc)
        return (nx, ny, nz), coeffs

    def _add_step_generic(self, r, q_aff):
        F = self.fq
        x, y, z = r
        qx, qy = q_aff
        theta = F.sub(y, F.mul(qy, z))
        lam = F.sub(x, F.mul(qx, z))
        c = F.square(theta)
        d = F.square(lam)
        e = F.mul(lam, d)
        f = F.mul(z, c)
        g = F.mul(x, d)
        h = F.sub(F.add(e, f), F.double(g))
        nx = F.mul(lam, h)
        ny = F.sub(F.mul(theta, F.sub(g, h)), F.mul(e, y))
        nz = F.mul(z, e)
        j = F.sub(F.mul(theta, qx), F.mul(lam, qy))
        if self.twist_type == "M":
            coeffs = (j, F.neg(theta), lam)
        else:
            coeffs = (lam, F.neg(theta), j)
        return (nx, ny, nz), coeffs

    def _ell(self, f, coeffs, px, py):
        F = self.fq
        c0, c1, c2 = coeffs
        if self.twist_type == "M":
            return self.fp6.mul_by_014(f, c0, F.mul(c1, px), F.mul(c2, py))
        return self.fp6.mul_by_034(f, F.mul(c0, py), F.mul(c1, px), c2)

    # ---------------------------------------------------------------- loops
    def _loop(self, digits_le_signed, p_xy, q_xy, shape, skip_first_square):
        """Shared scan: digits processed MSB->LSB; d in {-1,0,1}."""
        F6, F = self.fp6, self.fq
        px, py = p_xy
        qx, qy = q_xy
        r0 = (qx, qy, F.one(shape))
        f0 = F6.one(shape)
        n = len(digits_le_signed)
        sched = [digits_le_signed[n - 1 - j - 1] for j in range(n - 1)]
        digits = jnp.asarray(sched, jnp.int8)

        def sel_pt(mask, a, b):
            return tuple(F.select(mask, u, v) for u, v in zip(a, b))

        def body(carry, d):
            f, r = carry
            f = F6.square(f)  # harmless at step 0 (f == 1)
            r, coeffs = self._double_step(r, shape)
            f = self._ell(f, coeffs, px, py)
            is_neg = jnp.broadcast_to(d == -1, shape)
            qy_sel = F.select(is_neg, F.neg(qy), qy)
            r_add, coeffs_add = self._add_step(r, (qx, qy_sel))
            f_add = self._ell(f, coeffs_add, px, py)
            m = jnp.broadcast_to(d != 0, shape)
            f = F6.select(m, f_add, f)
            r = sel_pt(m, r_add, r)
            return (f, r), None

        (f, _), _ = jax.lax.scan(body, (f0, r0), digits)
        return f

    def _prep_loop(self, digits_le_signed, q_xy, shape):
        """Coefficient recurrence for one loop, coefficients stacked
        along a leading step axis (the reference precomputes exactly
        this once per Q: bw6/g2.rs:23-121)."""
        F = self.fq
        qx, qy = q_xy
        r0 = (qx, qy, F.one(shape))
        n = len(digits_le_signed)
        sched = [digits_le_signed[n - 1 - j - 1] for j in range(n - 1)]
        digits = jnp.asarray(sched, jnp.int8)

        def sel_pt(mask, a, b):
            return tuple(F.select(mask, u, v) for u, v in zip(a, b))

        def body(r, d):
            r, c_dbl = self._double_step(r, shape)
            is_neg = jnp.broadcast_to(d == -1, shape)
            qy_sel = F.select(is_neg, F.neg(qy), qy)
            r_add, c_add = self._add_step(r, (qx, qy_sel))
            m = jnp.broadcast_to(d != 0, shape)
            r = sel_pt(m, r_add, r)
            return r, (c_dbl, c_add)

        _, coeffs = jax.lax.scan(body, r0, digits)
        return coeffs

    def _loop_prepared(self, digits_le_signed, p_xy, coeffs, shape):
        """One loop consuming precomputed coefficients — only the Fp6
        square + two sparse line multiplications per step remain."""
        F6 = self.fp6
        px, py = p_xy
        n = len(digits_le_signed)
        sched = [digits_le_signed[n - 1 - j - 1] for j in range(n - 1)]
        digits = jnp.asarray(sched, jnp.int8)

        def body(f, step):
            c_dbl, c_add, d = step
            f = F6.square(f)
            f = self._ell(f, c_dbl, px, py)
            f_add = self._ell(f, c_add, px, py)
            m = jnp.broadcast_to(d != 0, shape)
            f = F6.select(m, f_add, f)
            return f, None

        f, _ = jax.lax.scan(
            body, F6.one(shape), (coeffs[0], coeffs[1], digits)
        )
        return f

    def prepare_g2(self, q_aff):
        """G2Prepared: run both loops' line-coefficient recurrences once
        and stack the per-step coefficients (bw6/g2.rs:49-121), for
        reuse across Miller loops with the same Q (the SNARK-verifier
        pattern).  Opaque pytree for ``miller_loop_prepared``."""
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(jax.tree_util.tree_leaves(qx)[0])
        bits1 = [1 if b == "1" else 0 for b in bin(self.ate1)[2:]]
        c1 = self._prep_loop(list(reversed(bits1)), (qx, qy), shape)
        c2 = self._prep_loop(self.ate2, (qx, qy), shape)
        return (c1, c2, q_inf)

    def miller_loop_prepared(self, p_aff, prepared):
        """Alg. 5 combined loop from precomputed coefficients —
        bit-identical output to ``miller_loop``."""
        F6 = self.fp6
        px, py, p_inf = p_aff
        c1, c2, q_inf = prepared
        shape = self.fq.batch_shape(px)
        bits1 = [1 if b == "1" else 0 for b in bin(self.ate1)[2:]]
        f1 = self._loop_prepared(list(reversed(bits1)), (px, py), c1, shape)
        if self.ate1_neg:
            f1 = F6.cyclotomic_inverse(f1)
        f2 = self._loop_prepared(self.ate2, (px, py), c2, shape)
        if self.ate2_neg:
            f2 = F6.cyclotomic_inverse(f2)
        f2 = F6.frobenius(f2, 1)
        f = F6.mul(f1, f2)
        skip = jnp.logical_or(p_inf, q_inf)
        return F6.select(skip, F6.one(shape), f)

    def miller_loop(self, p_aff, q_aff):
        """Alg. 5 of eprint 2020/351 (bw6/mod.rs:54-127), batched."""
        F6 = self.fp6
        px, py, p_inf = p_aff
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(px)

        # loop 1: plain binary over ATE_LOOP_COUNT_1
        bits1 = [1 if b == "1" else 0 for b in bin(self.ate1)[2:]]
        f1 = self._loop(list(reversed(bits1)), (px, py), (qx, qy), shape, True)
        if self.ate1_neg:
            f1 = F6.cyclotomic_inverse(f1)
        # loop 2: signed digits
        f2 = self._loop(self.ate2, (px, py), (qx, qy), shape, True)
        if self.ate2_neg:
            f2 = F6.cyclotomic_inverse(f2)
        f2 = F6.frobenius(f2, 1)
        f = F6.mul(f1, f2)
        skip = jnp.logical_or(p_inf, q_inf)
        return F6.select(skip, F6.one(shape), f)

    # ------------------------------------------------------------ final exp
    def _exp_by_x(self, f):
        r = self.fp6.cyclotomic_exp(f, self.x_abs)
        if self.x_is_negative:
            r = self.fp6.cyclotomic_inverse(r)
        return r

    def final_exponentiation(self, f):
        F6 = self.fp6
        f_inv = F6.inverse(f)
        first = self._first_chunk(f, f_inv)
        return self._last_chunk(first)

    def _first_chunk(self, elt, elt_inv):
        """(q^3 - 1)(q + 1) (bw6/mod.rs:170-186)."""
        F6 = self.fp6
        q3 = F6.cyclotomic_inverse(elt)  # elt^(q^3)
        over = F6.mul(q3, elt_inv)
        alpha = F6.frobenius(over, 1)
        return F6.mul(alpha, over)

    def _last_chunk(self, f):
        """Alg. 6 hard part (bw6/mod.rs:189-290)."""
        F6 = self.fp6
        conj = F6.cyclotomic_inverse
        f0 = f
        f0p = F6.frobenius(f0, 1)
        f1 = self._exp_by_x(f0)
        f1p = F6.frobenius(f1, 1)
        f2 = self._exp_by_x(f1)
        f2p = F6.frobenius(f2, 1)
        f3 = self._exp_by_x(f2)
        f3p = F6.frobenius(f3, 1)
        f4 = self._exp_by_x(f3)
        f4p = F6.frobenius(f4, 1)
        f5 = self._exp_by_x(f4)
        f5p = F6.frobenius(f5, 1)
        f6 = self._exp_by_x(f5)
        f6p = F6.frobenius(f6, 1)
        f7 = self._exp_by_x(f6)
        f7p = F6.frobenius(f7, 1)
        f8p = self._exp_by_x(f7p)
        f9p = self._exp_by_x(f8p)

        result1 = F6.mul(F6.mul(f3p, f6p), conj(f5p))
        result2 = F6.square(result1)
        f4_2p = F6.mul(f4, f2p)
        tmp1 = conj(F6.mul(F6.mul(F6.mul(F6.mul(f0, f1), f3), f4_2p), f8p))
        result3 = F6.mul(F6.mul(F6.mul(result2, f5), f0p), tmp1)
        result4 = F6.square(result3)
        result5 = F6.mul(F6.mul(result4, f9p), conj(f7))
        result6 = F6.square(result5)
        f2_4p = F6.mul(f2, f4p)
        f4_2p_5p = F6.mul(f4_2p, f5p)
        tmp2 = conj(F6.mul(F6.mul(f2_4p, f3), f3p))
        result7 = F6.mul(
            F6.mul(F6.mul(F6.mul(result6, f4_2p_5p), f6), f7p), tmp2
        )
        result8 = F6.square(result7)
        tmp3 = conj(F6.mul(f0p, f9p))
        result9 = F6.mul(F6.mul(F6.mul(F6.mul(result8, f0), f7), f1p), tmp3)
        result10 = F6.square(result9)
        f6p_8p = F6.mul(f6p, f8p)
        f5_7p = F6.mul(f5, f7p)
        result11 = F6.mul(F6.mul(F6.mul(result10, f5_7p), f2p), conj(f6p_8p))
        result12 = F6.square(result11)
        f3_6 = F6.mul(f3, f6)
        f1_7 = F6.mul(f1, f7)
        tmp5 = conj(F6.mul(f1_7, f2))
        result13 = F6.mul(F6.mul(F6.mul(result12, f3_6), f9p), tmp5)
        result14 = F6.square(result13)
        tmp6 = conj(F6.mul(F6.mul(f4_2p, f5_7p), f6p_8p))
        result15 = F6.mul(
            F6.mul(F6.mul(F6.mul(F6.mul(result14, f0), f0p), f3p), f5p), tmp6
        )
        result16 = F6.square(result15)
        result17 = F6.mul(F6.mul(result16, f1p), conj(f3_6))
        result18 = F6.square(result17)
        tmp8 = conj(F6.mul(F6.mul(f2_4p, f4_2p_5p), f9p))
        result19 = F6.mul(
            F6.mul(F6.mul(F6.mul(result18, f1_7), f5_7p), f0p), tmp8
        )
        return result19

    def pairing(self, p_aff, q_aff):
        return self.final_exponentiation(self.miller_loop(p_aff, q_aff))
