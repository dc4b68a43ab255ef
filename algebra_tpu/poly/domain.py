"""FFT evaluation domains over prime fields.

TPU-native re-design of the reference's ``EvaluationDomain`` hierarchy
(poly/src/domain/mod.rs:30, radix2/mod.rs:15, general.rs:26): a domain is
a host object holding the subgroup constants and device-side twiddle
tables; fft/ifft are jit-cached staged butterfly pipelines over batched
limb arrays (axis -2 = coefficient index).

Supported: radix-2 subgroups and cosets (with degree-padding semantics
matching the reference: inputs shorter than the domain are zero-padded),
Lagrange-coefficient evaluation, vanishing polynomials, element tables.
Mixed-radix domains are provided in mixed_radix.py; GeneralEvaluationDomain
dispatches between them by size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField
from ..ops import mont, ntt
from ..utils.jit import jit_method


class Radix2EvaluationDomain:
    """Multiplicative subgroup <g> of size 2^k (optionally shifted by a
    coset offset h), with natural-order fft/ifft."""

    def __init__(self, field: PrimeField, size: int, offset: int = 1):
        if size < 1 or size & (size - 1):
            raise ValueError("Radix2 domain size must be a power of two")
        spec = field.spec
        w = spec.get_root_of_unity(size)
        if w is None:
            raise ValueError(
                f"field {spec.name} has no subgroup of order {size} "
                f"(two-adicity {spec.two_adicity})"
            )
        self.field = field
        self.spec = spec
        self.size = size
        self.log_size = size.bit_length() - 1
        p = spec.modulus
        self.group_gen = w
        self.group_gen_inv = pow(w, -1, p)
        self.size_as_field_element = size % p
        self.size_inv = pow(size, -1, p)
        self.offset = offset % p
        self.offset_inv = pow(self.offset, -1, p)
        self.offset_pow_size = pow(self.offset, size, p)
        self._bitrev = jnp.asarray(ntt.bit_reverse_indices(size))
        self._roots = None  # lazily built on device
        self._roots_inv = None

    # ------------------------------------------------------------------ setup
    def _root_tables(self):
        """Build (once, eagerly — never under an active trace) the device
        twiddle tables.  Public entry points call this before their jitted
        bodies so the cached tables are concrete arrays."""
        if self._roots is None:
            half = max(self.size // 2, 1)
            build = jax.jit(
                lambda: (
                    ntt.powers_from_int(self.spec, self.group_gen, half),
                    ntt.powers_from_int(self.spec, self.group_gen_inv, half),
                )
            )
            self._roots, self._roots_inv = build()
        return self._roots, self._roots_inv

    def get_coset(self, offset: int) -> "Radix2EvaluationDomain":
        d = Radix2EvaluationDomain(self.field, self.size, offset)
        d._roots, d._roots_inv = self._root_tables()  # share tables
        return d

    # ------------------------------------------------------------------- fft
    def _pad(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        n = coeffs.shape[-1]
        if n > self.size:
            raise ValueError(f"input length {n} exceeds domain size {self.size}")
        if n < self.size:
            pad = [(0, 0)] * coeffs.ndim
            pad[-1] = (0, self.size - n)
            coeffs = jnp.pad(coeffs, pad)
        return coeffs

    @jit_method
    def _fft_padded(self, coeffs, roots, bitrev):
        # roots/bitrev arrive as ARGUMENTS: baking the 2^(n-1)-entry
        # twiddle table into the program as a constant bloats the HLO past
        # what remote-compile transports accept at 2^24 scale.
        if self.offset != 1:
            table = ntt.powers_from_int(self.spec, self.offset, self.size)
            coeffs = ntt.scale(self.spec, coeffs, table)
        return ntt.fft(self.spec, coeffs, roots, bitrev)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate the polynomial with the given coefficients over the
        domain (natural order h*g^0, h*g^1, ...); zero-pads short inputs
        (reference: poly/src/domain/mod.rs fft semantics).

        Inputs much shorter than the domain take the degree-aware
        O(n log d) path (radix2/fft.rs:22-67)."""
        roots, _ = self._root_tables()
        n_in = coeffs.shape[-1]
        d = 1 << (n_in - 1).bit_length() if n_in > 1 else 1
        if d * 4 <= self.size:
            if n_in < d:
                pad = [(0, 0)] * coeffs.ndim
                pad[-1] = (0, d - n_in)
                coeffs = jnp.pad(coeffs, pad)
            return self._fft_degree_aware(coeffs, roots)
        return self._fft_padded(self._pad(coeffs), roots, self._bitrev)

    @jit_method
    def _fft_degree_aware(self, coeffs, roots):
        if self.offset != 1:
            table = ntt.powers_from_int(
                self.spec, self.offset, coeffs.shape[-1]
            )
            coeffs = ntt.scale(self.spec, coeffs, table)
        return ntt.fft_degree_aware(self.spec, coeffs, self.size, roots)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Interpolate evaluations over the domain back to coefficients."""
        if evals.shape[-1] != self.size:
            raise ValueError("ifft input must have domain size")
        _, roots_inv = self._root_tables()
        return self._ifft_impl(evals, roots_inv, self._bitrev)

    @jit_method
    def _ifft_impl(self, evals: jnp.ndarray, roots_inv, bitrev) -> jnp.ndarray:
        x = ntt.fft(self.spec, evals, roots_inv, bitrev)
        n_inv = self.field.constant(self.size_inv)
        x = mont.mul(self.spec, x, n_inv)
        if self.offset != 1:
            table = ntt.powers_from_int(self.spec, self.offset_inv, self.size)
            x = ntt.scale(self.spec, x, table)
        return x

    # --------------------------------------------------------------- elements
    def element(self, i: int) -> int:
        """i-th domain element (host int, canonical form)."""
        return (self.offset * pow(self.group_gen, i, self.spec.modulus)) % (
            self.spec.modulus
        )

    def elements(self) -> jnp.ndarray:
        """[L, size] device table of all domain elements (Montgomery)."""
        table = ntt.powers_from_int(self.spec, self.group_gen, self.size)
        if self.offset != 1:
            table = mont.mul(self.spec, table, self.field.constant(self.offset))
        return table

    # --------------------------------------------------- vanishing polynomial
    def evaluate_vanishing_polynomial(self, tau):
        """Z_H(tau) = tau^size - offset^size, batched over tau
        (reference: poly/src/domain/mod.rs:252-270)."""
        t = mont.pow_fixed(self.spec, tau, self.size)
        return mont.sub(
            self.spec,
            t,
            self.field.constant(self.offset_pow_size, self.field.batch_shape(tau)),
        )

    def vanishing_polynomial(self):
        """Sparse representation [(degree, coeff_int)] of x^n - h^n."""
        return [(self.size, 1), (0, (-self.offset_pow_size) % self.spec.modulus)]

    # ------------------------------------------------- Lagrange coefficients
    @jit_method
    def evaluate_all_lagrange_coefficients(self, tau: jnp.ndarray) -> jnp.ndarray:
        """[L, size] of L_i(tau) for one point tau (limb vector, shape [L]).

        O(n) with one batched inversion, handling tau inside the domain
        exactly (one-hot output), mirroring
        poly/src/domain/mod.rs:149-222.
        """
        spec, F = self.spec, self.field
        n = self.size
        elements = self.elements()  # h * g^i
        tau_b = jnp.broadcast_to(tau[:, None], elements.shape)
        u = mont.sub(spec, tau_b, elements)  # tau - h g^i
        in_domain = mont.is_zero(spec, u)  # one-hot if tau in domain
        any_in = jnp.any(in_domain)

        u_inv = mont.batch_inverse(spec, u, axis=0)
        # Z(tau) * g^i / (n * h^(n-1)), with Z(tau) = tau^n - h^n
        z_tau = self.evaluate_vanishing_polynomial(tau)
        c = (self.size_inv * pow(self.offset_inv, n - 1, spec.modulus)) % spec.modulus
        scale = mont.mul(spec, z_tau, F.constant(c))  # scalar [L]
        g_pows = ntt.powers_from_int(spec, self.group_gen, n)
        li = mont.mul(spec, mont.mul(spec, g_pows, scale), u_inv)

        one_hot = mont.select(in_domain, F.one((n,)), F.zero((n,)))
        return mont.select(
            jnp.broadcast_to(any_in, (n,)), one_hot, li
        )

    # --------------------------------------------------------------- misc API
    def reindex_by_subdomain(self, other_size: int, index: int) -> int:
        """Map an index of a subdomain of size ``other_size`` into this
        domain: subgroup elements interleave with period |G|/|S|
        (reference: poly/src/domain/mod.rs:283-296)."""
        if self.size < other_size:
            raise ValueError("other domain must be a subdomain (smaller)")
        period = self.size // other_size
        if index < other_size:
            return index * period
        i = index - other_size
        x = period - 1
        return i + (i // x) + 1

    def mul_polynomials_in_evaluation_domain(self, a_evals, b_evals):
        return mont.mul(self.spec, a_evals, b_evals)

    def __repr__(self):
        return (
            f"Radix2EvaluationDomain(size=2^{self.log_size}, "
            f"field={self.spec.name}, offset={'1' if self.offset == 1 else 'coset'})"
        )


def GeneralEvaluationDomain(field: PrimeField, num_coeffs: int, offset: int = 1):
    """Pick the best supported domain of size >= num_coeffs
    (reference: poly/src/domain/general.rs:26,109-124)."""
    size = 1 << (num_coeffs - 1).bit_length()
    if field.spec.get_root_of_unity(size) is not None:
        return Radix2EvaluationDomain(field, size, offset)
    from .mixed_radix import MixedRadixEvaluationDomain, best_mixed_radix_size

    best = best_mixed_radix_size(field.spec, num_coeffs)
    if best is not None:
        return MixedRadixEvaluationDomain(field, best, offset)
    raise ValueError(
        f"no supported evaluation domain of size >= {num_coeffs} for {field.spec.name}"
    )
