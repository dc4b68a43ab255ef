"""BN-family (Barreto–Naehrig) ate pairing, batched over pairs.

Re-design of the reference's BN engine (ec/src/models/bn/{mod,g2}.rs):
the optimal-ate Miller loop runs over the signed binary digits of
|6X + 2| (ATE_LOOP_COUNT), with two extra Frobenius-twisted addition
steps (q1 = pi(Q), q2 = -pi^2(Q)) after the loop; the final
exponentiation hard part is the Fuentes-Castaneda et al. chain
(bn/mod.rs:183-219).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import PairingEngine


class Bn(PairingEngine):
    def __init__(
        self,
        g1,
        g2,
        fq12,
        x_abs: int,
        x_is_negative: bool,
        ate_loop_count,  # little-endian digits in {-1, 0, 1} of |6X+2|
        twist_mul_by_q_x_host,  # Fq2 host value: xi^((p-1)/3)
        twist_mul_by_q_y_host,  # Fq2 host value: xi^((p-1)/2)
        twist_type: str = "D",
    ):
        super().__init__(g1, g2, fq12, twist_type)
        self.x_abs = int(x_abs)
        self.x_is_negative = bool(x_is_negative)
        self.ate_loop_count = [int(d) for d in ate_loop_count]
        self.twist_mul_by_q_x_host = twist_mul_by_q_x_host
        self.twist_mul_by_q_y_host = twist_mul_by_q_y_host

    def _mul_by_char(self, q_aff, shape):
        """q -> Frobenius-twisted point pi(q) (bn/g2.rs mul_by_char)."""
        F2 = self.fq2
        x, y = q_aff
        x = F2.frobenius(x, 1)
        x = F2.mul(x, F2.constant(self.twist_mul_by_q_x_host, shape))
        y = F2.frobenius(y, 1)
        y = F2.mul(y, F2.constant(self.twist_mul_by_q_y_host, shape))
        return (x, y)

    # ------------------------------------------------------------ miller loop
    def miller_loop(self, p_aff, q_aff):
        """Optimal-ate loop over ATE_LOOP_COUNT digits as a lax.scan
        (compile-size O(1) in the loop length; see bls12.py)."""
        import jax

        F2, F12 = self.fq2, self.fq12
        px, py, p_inf = p_aff
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(px)

        q = (qx, qy)
        r0 = (qx, qy, F2.one(shape))
        f0 = F12.one(shape)
        ate = self.ate_loop_count
        n = len(ate)
        # schedule: step j processes i = n-1-j; digit = ate[i-1]
        digits = jnp.asarray(
            [ate[n - 1 - j - 1] for j in range(n - 1)], dtype=jnp.int8
        )

        def sel_pt(mask, a, b):
            return tuple(F2.select(mask, x, y) for x, y in zip(a, b))

        def body(carry, d):
            f, r = carry
            f = F12.square(f)  # harmless on the first step (f == 1)
            r, coeffs = self._double_step(r, shape)
            f = self._ell(f, coeffs, px, py)
            # conditional add with q (d == 1) or -q (d == -1)
            neg_mask = jnp.broadcast_to(d == -1, shape)
            q_sel = (qx, F2.select(neg_mask, F2.neg(qy), qy))
            r_add, coeffs_add = self._add_step(r, q_sel)
            f_add = self._ell(f, coeffs_add, px, py)
            m = jnp.broadcast_to(d != 0, shape)
            f = F12.select(m, f_add, f)
            r = sel_pt(m, r_add, r)
            return (f, r), None

        (f, r), _ = jax.lax.scan(body, (f0, r0), digits)
        if self.x_is_negative:
            f = F12.cyclotomic_inverse(f)
            r = (r[0], F2.neg(r[1]), r[2])
        q1 = self._mul_by_char(q, shape)
        q2 = self._mul_by_char(q1, shape)
        q2 = (q2[0], F2.neg(q2[1]))
        r, coeffs = self._add_step(r, q1)
        f = self._ell(f, coeffs, px, py)
        r, coeffs = self._add_step(r, q2)
        f = self._ell(f, coeffs, px, py)

        skip = jnp.logical_or(p_inf, q_inf)
        return F12.select(skip, F12.one(shape), f)

    # ------------------------------------------------------------ prepared G2
    def prepare_g2(self, q_aff):
        """G2Prepared for the BN schedule: the per-digit line
        coefficients plus the two Frobenius-twisted tail steps
        (bn/g2.rs ell_coeffs).  Opaque pytree for
        ``miller_loop_prepared``."""
        import jax

        F2 = self.fq2
        qx, qy, q_inf = q_aff
        shape = self.fq.batch_shape(jax.tree_util.tree_leaves(qx)[0])

        r0 = (qx, qy, F2.one(shape))
        ate = self.ate_loop_count
        n = len(ate)
        digits = jnp.asarray(
            [ate[n - 1 - j - 1] for j in range(n - 1)], dtype=jnp.int8
        )

        def sel_pt(mask, a, b):
            return tuple(F2.select(mask, x, y) for x, y in zip(a, b))

        def body(r, d):
            r, c_dbl = self._double_step(r, shape)
            neg_mask = jnp.broadcast_to(d == -1, shape)
            q_sel = (qx, F2.select(neg_mask, F2.neg(qy), qy))
            r_add, c_add = self._add_step(r, q_sel)
            m = jnp.broadcast_to(d != 0, shape)
            r = sel_pt(m, r_add, r)
            return r, (c_dbl, c_add)

        r, coeffs = jax.lax.scan(body, r0, digits)
        if self.x_is_negative:
            r = (r[0], F2.neg(r[1]), r[2])
        q1 = self._mul_by_char((qx, qy), shape)
        q2 = self._mul_by_char(q1, shape)
        q2 = (q2[0], F2.neg(q2[1]))
        r, c1 = self._add_step(r, q1)
        _, c2 = self._add_step(r, q2)
        return (coeffs[0], coeffs[1], c1, c2, q_inf)

    def miller_loop_prepared(self, p_aff, prepared):
        """Optimal-ate loop from precomputed coefficients — identical
        output to ``miller_loop``."""
        import jax

        F12 = self.fq12
        px, py, p_inf = p_aff
        coeffs_dbl, coeffs_add, c1, c2, q_inf = prepared
        shape = self.fq.batch_shape(px)
        ate = self.ate_loop_count
        n = len(ate)
        digits = jnp.asarray(
            [ate[n - 1 - j - 1] for j in range(n - 1)], dtype=jnp.int8
        )

        def body(f, step):
            c_dbl, c_add, d = step
            f = F12.square(f)
            f = self._ell(f, c_dbl, px, py)
            f_add = self._ell(f, c_add, px, py)
            m = jnp.broadcast_to(d != 0, shape)
            f = F12.select(m, f_add, f)
            return f, None

        f, _ = jax.lax.scan(
            body, F12.one(shape), (coeffs_dbl, coeffs_add, digits)
        )
        if self.x_is_negative:
            f = F12.cyclotomic_inverse(f)
        f = self._ell(f, c1, px, py)
        f = self._ell(f, c2, px, py)
        skip = jnp.logical_or(p_inf, q_inf)
        return F12.select(skip, F12.one(shape), f)

    # ----------------------------------------------------- final exponentiation
    def _exp_by_neg_x(self, f):
        r = self.fq12.cyclotomic_exp(f, self.x_abs)
        if not self.x_is_negative:
            r = self.fq12.cyclotomic_inverse(r)
        return r

    def final_exponentiation(self, f):
        F12 = self.fq12
        r = self._easy_part(f)
        # hard part: Fuentes-Castaneda et al. (bn/mod.rs:183-219)
        y0 = self._exp_by_neg_x(r)
        y1 = F12.cyclotomic_square(y0)
        y2 = F12.cyclotomic_square(y1)
        y3 = F12.mul(y2, y1)
        y4 = self._exp_by_neg_x(y3)
        y5 = F12.cyclotomic_square(y4)
        y6 = self._exp_by_neg_x(y5)
        y3 = F12.cyclotomic_inverse(y3)
        y6 = F12.cyclotomic_inverse(y6)
        y7 = F12.mul(y6, y4)
        y8 = F12.mul(y7, y3)
        y9 = F12.mul(y8, y1)
        y10 = F12.mul(y8, y4)
        y11 = F12.mul(y10, r)
        y12 = F12.frobenius(y9, 1)
        y13 = F12.mul(y12, y11)
        y8f = F12.frobenius(y8, 2)
        y14 = F12.mul(y8f, y13)
        r = F12.cyclotomic_inverse(r)
        y15 = F12.mul(r, y9)
        y15 = F12.frobenius(y15, 3)
        y16 = F12.mul(y15, y14)
        return y16
