"""Mixed-radix evaluation domains: sizes 2^a * q^b for fields with a small
subgroup base q (poly/src/domain/mixed_radix.rs:27, e.g. MNT6-753 q=5).

The FFT is a trace-time-recursive Cooley-Tukey decimation in time: at
each level the coefficient axis splits into r residue classes (r = q
while q | n, else 2), the sub-transforms recurse, and the combine step is
an r x r DFT matrix applied over twiddled sub-results — all batched field
ops.  Twiddle tables are built host-side (domain sizes are static and
small: the reference benches mixed-radix only to 2^17)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..bigint import batch_int_to_limbs, int_to_limbs
from ..fields.prime import PrimeField
from ..ops import mont
from ..utils.jit import jit_method


def mixed_radix_factor(spec, num_coeffs: int):
    """Smallest supported size 2^a q^b >= num_coeffs, or None
    (mixed_radix.rs best size selection)."""
    q = spec.small_subgroup_base
    if q is None:
        return None
    best = None
    for b in range(spec.small_subgroup_base_adicity + 1):
        qb = q**b
        for a in range(spec.two_adicity + 1):
            size = (1 << a) * qb
            if size >= num_coeffs and (best is None or size < best):
                best = size
    return best


def best_mixed_radix_size(spec, num_coeffs: int):
    return mixed_radix_factor(spec, num_coeffs)


class MixedRadixEvaluationDomain:
    def __init__(self, field: PrimeField, size: int, offset: int = 1):
        spec = field.spec
        w = spec.get_root_of_unity(size)
        if w is None:
            raise ValueError(f"{spec.name}: no subgroup of order {size}")
        self.field = field
        self.spec = spec
        self.size = size
        p = spec.modulus
        self.group_gen = w
        self.group_gen_inv = pow(w, -1, p)
        self.size_inv = pow(size, -1, p)
        self.offset = offset % p
        self.offset_inv = pow(self.offset, -1, p)
        self.offset_pow_size = pow(self.offset, size, p)
        self._plan_cache = {}

    # ------------------------------------------------------------------ fft
    def _pad(self, coeffs):
        n = jax.tree_util.tree_leaves(coeffs)[0].shape[-1]
        if n > self.size:
            raise ValueError("input longer than domain")
        if n < self.size:
            pad = [(0, 0)] * coeffs.ndim
            pad[-1] = (0, self.size - n)
            coeffs = jnp.pad(coeffs, pad)
        return coeffs

    def fft(self, coeffs):
        coeffs = self._pad(coeffs)
        return self._fft_impl(coeffs)

    @jit_method
    def _fft_impl(self, coeffs):
        spec = self.spec
        if self.offset != 1:
            table = _power_table(spec, self.offset, self.size)
            coeffs = mont.mul(spec, coeffs, table)
        return _mixed_fft(spec, coeffs, self.size, self.group_gen)

    def ifft(self, evals):
        if jax.tree_util.tree_leaves(evals)[0].shape[-1] != self.size:
            raise ValueError("ifft input must have domain size")
        return self._ifft_impl(evals)

    @jit_method
    def _ifft_impl(self, evals):
        spec = self.spec
        x = _mixed_fft(spec, evals, self.size, self.group_gen_inv)
        n_inv = self.field.constant(self.size_inv)
        x = mont.mul(spec, x, n_inv)
        if self.offset != 1:
            table = _power_table(spec, self.offset_inv, self.size)
            x = mont.mul(spec, x, table)
        return x

    # ------------------------------------------------------------- elements
    def element(self, i: int) -> int:
        return (self.offset * pow(self.group_gen, i, self.spec.modulus)) % (
            self.spec.modulus
        )

    def elements(self):
        table = _power_table(self.spec, self.group_gen, self.size)
        if self.offset != 1:
            table = mont.mul(self.spec, table, self.field.constant(self.offset))
        return table

    def evaluate_vanishing_polynomial(self, tau):
        t = mont.pow_fixed(self.spec, tau, self.size)
        return mont.sub(
            self.spec,
            t,
            self.field.constant(self.offset_pow_size, self.field.batch_shape(tau)),
        )

    def __repr__(self):
        return f"MixedRadixEvaluationDomain(size={self.size}, field={self.spec.name})"


def _power_table(spec, base: int, n: int) -> jnp.ndarray:
    """[L, n] Montgomery powers base^0..base^{n-1}, built host-side."""
    p = spec.modulus
    vals = []
    acc = 1
    for _ in range(n):
        vals.append(spec.to_mont(acc))
        acc = (acc * base) % p
    return jnp.asarray(batch_int_to_limbs(vals, spec.n_limbs))


def _mixed_fft(spec, x, n: int, omega: int):
    """Recursive mixed-radix DIT over the -1 axis (natural in/out order)."""
    if n == 1:
        return x
    q = spec.small_subgroup_base or 2
    r = q if (q > 1 and n % q == 0) else 2
    m = n // r
    p = spec.modulus
    omega_r = pow(omega, m, p)  # r-th root of unity
    sub_omega = pow(omega, r, p)

    subs = [
        _mixed_fft(spec, x[..., t::r], m, sub_omega) for t in range(r)
    ]
    # twiddle: T_t[k] = omega^{t k} * S_t[k]
    twiddled = [subs[0]]
    for t in range(1, r):
        table = _power_table(spec, pow(omega, t, p), m)
        twiddled.append(mont.mul(spec, subs[t], table))
    # combine: X[s*m + k] = sum_t (omega_r^{t s}) * T_t[k]
    parts = []
    for s in range(r):
        acc = twiddled[0]
        for t in range(1, r):
            w_int = pow(omega_r, t * s, p)
            w = jnp.asarray(int_to_limbs(spec.to_mont(w_int), spec.n_limbs))
            acc = mont.add(spec, acc, mont.mul(spec, twiddled[t], w))
        parts.append(acc)
    return jnp.concatenate(parts, axis=-1)
