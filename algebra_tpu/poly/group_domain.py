"""FFTs over GROUP coefficients (the reference's ``DomainCoeff`` over
curve points, poly/src/domain/mod.rs:30-116 blanket impl — used for G1
Lagrange-basis conversions of SRS / powers-of-tau).

A butterfly over group elements multiplies by the root of unity as a
SCALAR (a field element acting on the group), so each stage costs a
batched fixed-window scalar multiplication instead of a field multiply.
The twiddle scalars are host constants (domain roots), so each stage's
scalar mul unrolls into a windowed double-and-add scan shared by all
lanes — the whole transform is n log n point-adds like the reference's,
but each add is a full vector batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bigint import batch_int_to_limbs
from ..ops.ntt import bit_reverse_indices


def _point_take(curve, P, idx):
    return tuple(jax.tree_util.tree_map(lambda a: a[:, idx], c) for c in P)


def group_fft(curve, domain, points):
    """Forward FFT of a point batch over the domain (natural order).

    points: Jacobian point tuple with the coefficient axis as the batch
    ([L, n] leaves for prime-base curves).  Returns evaluations
    sum_j omega^(ij) * P_j.
    """
    spec = domain.spec
    n = domain.size
    p_mod = spec.modulus
    bitrev = jnp.asarray(bit_reverse_indices(n))
    P = _point_take(curve, points, bitrev)
    log_n = n.bit_length() - 1
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        # twiddle scalars for this stage (host ints)
        w = pow(domain.group_gen, n // m, p_mod)
        scalars = [pow(w, j, p_mod) for j in range(half)]
        sc = jnp.asarray(batch_int_to_limbs(scalars, spec.n_limbs))  # [Ls, half]
        view = tuple(
            jax.tree_util.tree_map(
                lambda a: a.reshape(a.shape[:1] + (n // m, m)), c
            )
            for c in P
        )
        lo = tuple(
            jax.tree_util.tree_map(lambda a: a[:, :, :half], c) for c in view
        )
        hi = tuple(
            jax.tree_util.tree_map(lambda a: a[:, :, half:], c) for c in view
        )
        # t = scalar * hi, with per-position scalars broadcast over groups
        sc_b = jnp.broadcast_to(sc[:, None, :], sc.shape[:1] + (n // m, half))
        t = curve.scalar_mul(hi, sc_b)
        add = curve.add(lo, t)
        sub = curve.add(lo, curve.neg(t))
        P = tuple(
            jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=2).reshape(
                    a.shape[:1] + (n,)
                ),
                ca,
                cb,
            )
            for ca, cb in zip(add, sub)
        )
    return P


def group_ifft(curve, domain, points):
    """Inverse transform: forward with omega^-1 then scale by n^-1."""
    spec = domain.spec

    class _InvDomain:
        size = domain.size
        spec = domain.spec
        group_gen = domain.group_gen_inv

    out = group_fft(curve, _InvDomain, points)
    n_inv = jnp.asarray(batch_int_to_limbs([domain.size_inv], spec.n_limbs))
    n = domain.size
    sc = jnp.broadcast_to(n_inv, (n_inv.shape[0], n))
    return curve.scalar_mul(out, sc)
