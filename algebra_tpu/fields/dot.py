"""Bilinear-form compiler for tower fields.

Turns any tower multiplication (or linear combination of products) into
ONE ``mont.dot_stacked`` kernel over the prime field: flatten operands to
their prime-field coordinate vectors, look up the tower's integer
multiplication tensor T[o, i, j] (c_o = sum_ij T[o,i,j] a_i b_j), and
emit a single stacked column-product + one Montgomery reduction per
output coordinate.

This replaces the reference's nested Karatsuba trait methods
(ff/src/fields/models/{quadratic,cubic}_extension.rs,
fp12_2over3over2.rs) with a formulation native to wide vector units: the
per-operation carry chains that dominated both XLA program size (a
Miller-loop step was ~10^5 HLO ops) and small-batch runtime collapse
into one weight-matrix contraction (the generalization of the
reference's single-reduction ``sum_of_products``,
montgomery_backend.rs:391-495).

The tensor exists whenever every tower nonresidue acts on its base
field's prime coordinates as a SMALL-INTEGER matrix — true for all
pairing towers here (e.g. BLS12-381: u^2 = -1, xi = 1+u, w^2 = v; BN254:
xi = 9+u).  Kinds whose nonresidue is not small-integer structured fall
back to the generic Karatsuba path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_SMALL = 1 << 12  # |entry| bound for "small-integer" classification


# --------------------------------------------------------------------------
# host arithmetic on kind structure (python ints, used only at trace time)
# --------------------------------------------------------------------------


def _host_zero(kind):
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return 0
    return tuple(_host_zero(kind.base) for _ in range(_arity(kind)))


def _arity(kind):
    from .cubic import CubicExtField

    return 3 if isinstance(kind, CubicExtField) else 2


def _host_add(kind, a, b):
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return (a + b) % kind.spec.modulus
    return tuple(_host_add(kind.base, x, y) for x, y in zip(a, b))


def _host_mul(kind, a, b):
    """Schoolbook host multiply following the kind structure."""
    from .cubic import CubicExtField
    from .prime import PrimeField
    from .quadratic import QuadExtField

    if isinstance(kind, PrimeField):
        return (a * b) % kind.spec.modulus
    B = kind.base
    nr = kind.nonresidue_host
    if isinstance(kind, QuadExtField):
        v0 = _host_mul(B, a[0], b[0])
        v1 = _host_mul(B, a[1], b[1])
        c0 = _host_add(B, v0, _host_mul(B, nr, v1))
        c1 = _host_add(B, _host_mul(B, a[0], b[1]), _host_mul(B, a[1], b[0]))
        return (c0, c1)
    if isinstance(kind, CubicExtField):
        def m(x, y):
            return _host_mul(B, x, y)

        def ad(*xs):
            out = xs[0]
            for x in xs[1:]:
                out = _host_add(B, out, x)
            return out

        c0 = ad(m(a[0], b[0]), _host_mul(B, nr, ad(m(a[1], b[2]), m(a[2], b[1]))))
        c1 = ad(m(a[0], b[1]), m(a[1], b[0]), _host_mul(B, nr, m(a[2], b[2])))
        c2 = ad(m(a[0], b[2]), m(a[1], b[1]), m(a[2], b[0]))
        return (c0, c1, c2)
    raise TypeError(f"no host multiply for {type(kind).__name__}")


def _host_flatten(kind, a):
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return [a]
    out = []
    for c in a:
        out.extend(_host_flatten(kind.base, c))
    return out


def _host_unit(kind, i, dim):
    """i-th prime-basis unit vector as a host tower value."""
    coords = [0] * dim
    coords[i] = 1
    return _host_unflatten(kind, coords)


def _host_unflatten(kind, coords):
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return coords[0]
    d = len(coords) // _arity(kind)
    return tuple(
        _host_unflatten(kind.base, coords[k * d : (k + 1) * d])
        for k in range(_arity(kind))
    )


def _as_small_int(p: int, e: int):
    """Field element (canonical int) -> small signed int, or None."""
    if e <= _SMALL:
        return e
    if p - e <= _SMALL:
        return -(p - e)
    return None


# --------------------------------------------------------------------------
# multiplication tensor
# --------------------------------------------------------------------------


def mul_tensor(kind):
    """Integer multiplication tensor {(o, i, j): int} over prime
    coordinates, or None if the tower is not small-int structured.
    Computed by host-multiplying prime-basis unit vectors."""
    from .prime import PrimeField

    if getattr(kind, "_mul_tensor_cache", "unset") != "unset":
        return kind._mul_tensor_cache
    if isinstance(kind, PrimeField):
        kind._mul_tensor_cache = {(0, 0, 0): 1}
        return kind._mul_tensor_cache
    dim = kind.extension_degree() // kind.prime_kind().extension_degree()
    p = kind.characteristic()
    tensor = {}
    ok = True
    try:
        units = [_host_unit(kind, i, dim) for i in range(dim)]
        for i in range(dim):
            for j in range(dim):
                prod = _host_flatten(kind, _host_mul(kind, units[i], units[j]))
                for o, e in enumerate(prod):
                    if e == 0:
                        continue
                    s = _as_small_int(p, e)
                    if s is None:
                        ok = False
                        break
                    tensor[(o, i, j)] = s
                if not ok:
                    break
            if not ok:
                break
    except TypeError:
        ok = False
    kind._mul_tensor_cache = tensor if ok else None
    return kind._mul_tensor_cache


# --------------------------------------------------------------------------
# device-side flatten / unflatten
# --------------------------------------------------------------------------


def flatten_coords(kind, a):
    """Tower element -> list of [L, *batch] prime coordinate arrays."""
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return [a]
    out = []
    for c in a:
        out.extend(flatten_coords(kind.base, c))
    return out


def unflatten_coords(kind, coords):
    from .prime import PrimeField

    if isinstance(kind, PrimeField):
        return coords[0]
    d = len(coords) // _arity(kind)
    return tuple(
        unflatten_coords(kind.base, coords[k * d : (k + 1) * d])
        for k in range(_arity(kind))
    )


# --------------------------------------------------------------------------
# the dot entry point
# --------------------------------------------------------------------------


def dot(kind, terms):
    """sum of s * (a * b) over terms, computed as ONE prime-field kernel.

    terms: list of (s:int, a, b, a_mask, b_mask) where a/b are elements
    of ``kind`` and the optional masks are per-prime-coordinate bool
    tuples marking structurally nonzero coordinates (None = all).
    Returns an element of ``kind``, or None if the kind has no
    small-integer multiplication tensor or the weight mass exceeds the
    kernel's bound (callers fall back to the generic path).
    """
    out = dot_multi(kind, [terms])
    return None if out is None else out[0]


def dot_multi(kind, groups):
    """Several independent linear-combinations-of-products, ALL fused
    into one prime-field kernel (shared broadcast product + one stacked
    reduction).  ``groups`` is a list of term lists (see ``dot``);
    returns a list of kind elements, or None on fallback.

    This is the workhorse for hand-fused formulas (pairing step
    functions, curve group laws): every output of a formula round
    becomes a weight-matrix row instead of a chain of mul/add kernels.
    """
    from ..ops import mont

    T = mul_tensor(kind)
    if T is None:
        return None
    spec = kind.prime_kind().spec
    dim = kind.extension_degree() // kind.prime_kind().extension_degree()

    # collect needed products and the weight matrix across all groups
    pairs = {}  # (group_idx, term_idx, i, j) -> column index
    entries = []  # (row, col, w)
    flat = {}
    for g_idx, terms in enumerate(groups):
        for t_idx, term in enumerate(terms):
            s, a, b = term[0], term[1], term[2]
            a_mask = term[3] if len(term) > 3 else None
            b_mask = term[4] if len(term) > 4 else None
            if s == 0:
                continue
            fkey = (g_idx, t_idx)
            flat[fkey] = (
                flatten_coords(kind, a),
                flatten_coords(kind, b),
            )
            symmetric = a is b
            for (o, i, j), w in T.items():
                if a_mask is not None and not a_mask[i]:
                    continue
                if b_mask is not None and not b_mask[j]:
                    continue
                if symmetric and j < i:
                    i, j = j, i  # (i,j)/(j,i) coincide when a == b
                key = (g_idx, t_idx, i, j)
                col = pairs.setdefault(key, len(pairs))
                entries.append((g_idx * dim + o, col, s * w))
    if not pairs:
        return [kind.zero(()) for _ in groups]

    W = np.zeros((dim * len(groups), len(pairs)), np.int64)
    for row, col, w in entries:
        W[row, col] += w
    if int(np.abs(W).sum(axis=1).max()) > mont.dot_mass_limit(spec):
        return None

    # broadcast all coordinates to a common batch shape
    shapes = [c.shape[1:] for fa, fb in flat.values() for c in (*fa, *fb)]
    batch = np.broadcast_shapes(*shapes)
    L = spec.n_limbs

    def bc(c):
        return jnp.broadcast_to(
            mont.expand(c, len(batch)), (L,) + tuple(batch)
        )

    cols_a, cols_b, sq_mask = [], [], []
    for (g_idx, t_idx, i, j), col in sorted(
        pairs.items(), key=lambda kv: kv[1]
    ):
        fa, fb = flat[(g_idx, t_idx)]
        cols_a.append(bc(fa[i]))
        cols_b.append(bc(fb[j]))
        sq_mask.append(fa[i] is fb[j])  # self-products use the
        # upper-triangle squaring columns in the kernel
    A = jnp.stack(cols_a, axis=1)
    B = jnp.stack(cols_b, axis=1)
    out = mont.dot_stacked(spec, A, B, W, square_mask=sq_mask)
    return [
        unflatten_coords(
            kind, [out[:, g * dim + o] for o in range(dim)]
        )
        for g in range(len(groups))
    ]
