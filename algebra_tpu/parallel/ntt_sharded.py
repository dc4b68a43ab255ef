"""Multi-chip NTT: four-step (Bailey) decomposition over a device mesh.

The closest cousin of sequence parallelism (SURVEY.md §2.8): coefficients
are sharded across chips; the one cross-chip exchange is the matrix
transpose between the two local NTT phases, realized as a single
`all_to_all` over the mesh axis — the TPU equivalent of the reference's
in-memory butterfly recombination (poly/src/domain/utils.rs:105
parallel_fft), redesigned for ICI rather than shared memory.

Math (size n = n1*n2, root w):
    c viewed as M[j1, j2] = c[j1 + n1*j2]
    A[j1, k2] = NTT_n2 over j2 of M[j1, :]   (root w^n1)
    B[j1, k2] = w^(j1*k2) * A[j1, k2]        (twiddle)
    O[k1, k2] = NTT_n1 over j1 of B[:, k2]   (root w^n2)
    X[k2 + n2*k1] = O[k1, k2]

Device layout: rows j1 sharded for phase A; `all_to_all` re-shards to
columns k2 for phase B.  Output is returned as the row-major flatten of
O (natural order), sharded over the leading axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..bigint import int_to_limbs
from ..fields.spec import FieldSpec
from ..ops import mont, ntt


def _root_table(spec: FieldSpec, base: int, n: int) -> jnp.ndarray:
    return ntt.powers_from_int(spec, base, max(n // 2, 1))


def sharded_fft(spec: FieldSpec, mesh, coeffs, omega: int, axis: str = "x"):
    """Natural-order forward NTT of limb-major uint32[L, n] coeffs sharded
    over the mesh axis.  omega is the order-n root of unity (host int).

    Returns the evaluations in natural order, sharded over the mesh axis.
    """
    D = mesh.shape[axis]
    L = coeffs.shape[0]
    n = coeffs.shape[1]
    # choose n1 = number of rows = D * rows_per_device; n2 = n / n1.
    # Use n1 as small as possible while divisible by D and keeping
    # n2 <= n1 * something reasonable; simplest: split as square-ish.
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    while n1 % D and n1 < n:
        n1 <<= 1
    n2 = n // n1
    assert n1 * n2 == n and n1 % D == 0, (n1, n2, D)
    p = spec.modulus

    w_n1 = pow(omega, n1, p)  # order-n2 root for phase A
    w_n2 = pow(omega, n2, p)  # order-n1 root for phase B
    rootsA = _root_table(spec, w_n1, n2)
    rootsB = _root_table(spec, w_n2, n1)
    bitrevA = jnp.asarray(ntt.bit_reverse_indices(n2))
    bitrevB = jnp.asarray(ntt.bit_reverse_indices(n1))

    # M[j1, j2] = c[j1 + n1 j2]: c.reshape(n2, n1).T
    # twiddle w^(j1*k2), computed per-shard inside the mapped fn.
    rows_per = n1 // D

    def local(phaseA_block, omega_pows_rows):
        # phaseA_block: [L, rows_per, n2] rows j1 of this device
        a = ntt.fft(spec, phaseA_block, rootsA, bitrevA)  # NTT along j2
        # twiddle: w^(j1 * k2) = (w^(j1))^(k2); omega_pows_rows[:, r] = w^(j1_r)
        tw = ntt.powers_from_device_batch(spec, omega_pows_rows, n2)
        a = mont.mul(spec, a, tw)
        # transpose: to [n1, n2/D] columns of this device
        b = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=True)
        o = ntt.fft(spec, jnp.swapaxes(b, 1, 2), rootsB, bitrevB)  # NTT over j1
        # o: [L, n2/D, n1] = O[k1, k2] for this device's k2 block, k1 minor
        # Want output X[k2 + n2*k1] sharded over the batch: rearrange to
        # [L, n1 * n2/D] with index (k1, k2_local)
        out = jnp.swapaxes(o, 1, 2)  # [L, n1, n2/D]
        return out.reshape(L, n1 * (n2 // D))

    mat = coeffs.reshape(L, n2, n1).swapaxes(1, 2)  # [L, n1, n2]
    # per-row twiddle bases: w^(j1) for each row j1 (host table) [Ls, n1]
    from ..bigint import batch_int_to_limbs

    bases = []
    acc = 1
    for j1 in range(n1):
        bases.append(spec.to_mont(acc))
        acc = (acc * omega) % p
    row_base = jnp.asarray(batch_int_to_limbs(bases, spec.n_limbs))

    from .mesh import shard_map_compat

    mapped = shard_map_compat(
        local, mesh, (P(None, axis), P(None, axis)), P(None, axis)
    )
    out_blocks = mapped(mat, row_base)  # [L, n1*n2/D per device] stacked
    # out_blocks global shape [L, D * n1 * n2/D = n]; device d holds
    # X entries with k2 in its block: index (k1, k2loc) -> k2 = d*k2_per+k2loc
    # Global natural order requires interleaving; produce it with one
    # reshape/transpose (lazy; XLA keeps it sharded until gathered).
    k2_per = n2 // D
    x = out_blocks.reshape(L, D, n1, k2_per)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(L, n)
    # note: index = k1 * n2 + (d * k2_per + k2loc) = natural order
    return x


def sharded_ifft(spec: FieldSpec, mesh, evals, omega: int, size_inv: int, axis="x"):
    """Inverse NTT: forward transform with omega^-1 then scale by n^-1."""
    p = spec.modulus
    x = sharded_fft(spec, mesh, evals, pow(omega, -1, p), axis=axis)
    n_inv = jnp.asarray(int_to_limbs(spec.to_mont(size_inv), spec.n_limbs))
    return mont.mul(spec, x, n_inv)
