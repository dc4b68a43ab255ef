"""GLV endomorphism-accelerated scalar multiplication.

Re-design of the reference's ``GLVConfig`` (ec/src/scalar_mul/glv.rs:4-62
— trait only there; parameters for secp256k1 are instantiated in
curves/instances/secp256k1.py from the standard literature).

k decomposes as k = k1 + k2*lambda with |k1|, |k2| ~ sqrt(r) via the
LLL-reduced basis; phi(x, y) = (beta*x, y) realizes multiplication by
lambda, halving the double-and-add depth.  Decomposition is exact
integer arithmetic on ~256-bit values — host-side for host scalars,
and for device batches a vectorized Babai rounding over 16-bit limbs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bigint import batch_int_to_limbs
from ..curves.sw import scalar_bits_le


def decompose(glv: dict, r: int, k: int):
    """k -> (k1, k2) with k = k1 + k2*lam (mod r), short vectors.

    Babai rounding against the basis rows (a1, b1), (a2, b2)
    (glv.rs scalar_decomposition).
    """
    (a1, b1), (a2, b2) = glv["basis"]
    det = a1 * b2 - a2 * b1
    # c_i = round(k * beta_i) with beta from the inverse basis
    c1 = (b2 * k + det // 2) // det
    c2 = (-b1 * k + det // 2) // det
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + k2 * glv["lam"]) % r == k % r
    return k1, k2


def endomorphism(curve, P):
    """phi(x, y, z) = (beta*x, y, z) (glv.rs endomorphism)."""
    beta = curve.base.constant(curve.glv["beta"], curve.base.batch_shape(P[0]))
    return (curve.base.mul(P[0], beta), P[1], P[2])


def glv_mul_host(curve, P, k: int):
    """P * k via half-length simultaneous double-and-add over the GLV
    decomposition (glv.rs glv_mul).  Host-constant scalar; P a device
    point batch; runs as a scan over the half-width joint digits."""
    r = curve.scalar_modulus
    k1, k2 = decompose(curve.glv, r, int(k) % r)
    P1 = P if k1 >= 0 else curve.neg(P)
    P2 = endomorphism(curve, P)
    if k2 < 0:
        P2 = curve.neg(P2)
    k1, k2 = abs(k1), abs(k2)
    nbits = max(k1.bit_length(), k2.bit_length(), 1)
    shape = curve.batch_shape(P)
    zero = curve.zero(shape)
    both = curve.add(P1, P2)
    # table[0..3] = [0, P1, P2, P1+P2]; joint digit = b1 + 2*b2
    table = tuple(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0),
                               *[pt[i] for pt in (zero, P1, P2, both)])
        for i in range(3)
    )
    digits = jnp.asarray(
        [((k1 >> i) & 1) | (((k2 >> i) & 1) << 1)
         for i in range(nbits - 1, -1, -1)],
        jnp.int32,
    )

    def body(acc, d):
        acc = curve.double(acc)
        entry = tuple(jax.tree_util.tree_map(lambda t: t[d], coord)
                      for coord in table)
        return curve.add(acc, entry), None

    acc, _ = jax.lax.scan(body, zero, digits)
    return acc


_M16 = jnp.uint32(0xFFFF)


def _const_limbs(v: int, L: int):
    """Non-negative host int -> list of L python-int 16-bit limbs."""
    assert v >= 0
    return [(v >> (16 * i)) & 0xFFFF for i in range(L)]


def _mul_const_round_shift(x: jnp.ndarray, g: int, m_limbs: int,
                           out_limbs: int) -> jnp.ndarray:
    """round((x * g) / 2^(16*m_limbs)) over 16-bit limb lanes.

    x: uint32[Lx, n] canonical limbs; g: non-negative host int.
    Returns uint32[out_limbs, n], carries fully propagated.  Column
    accumulators stay in u32: each lo/hi term is < 2^16 and a column
    receives at most 2*min(Lx, Lg) + 1 of them (< 2^23 total).
    """
    Lx, n = x.shape
    Lg = max(1, -(-g.bit_length() // 16))
    gl = _const_limbs(g, Lg)
    ncols = m_limbs + out_limbs + 1
    cols = [None] * ncols
    for j, gj in enumerate(gl):
        if gj == 0:
            continue
        for i in range(Lx):
            k = i + j
            if k >= ncols:
                break
            prod = x[i] * jnp.uint32(gj)
            lo = prod & _M16
            hi = prod >> 16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < ncols:
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros((n,), jnp.uint32)
    cols = [zero if c is None else c for c in cols]
    # rounding: += 2^(16*m_limbs - 1)
    cols[m_limbs - 1] = cols[m_limbs - 1] + jnp.uint32(0x8000)
    carry = zero
    out = []
    for k in range(ncols):
        v = cols[k] + carry
        if k >= m_limbs and len(out) < out_limbs:
            out.append(v & _M16)
        carry = v >> 16
    while len(out) < out_limbs:
        out.append(zero)
    return jnp.stack(out, axis=0)


def _mul_const_mod(x: jnp.ndarray, c: int, W: int) -> jnp.ndarray:
    """(x * c) mod 2^(16*W) over 16-bit limb lanes (c >= 0 host int)."""
    Lx, n = x.shape
    Lc = max(1, -(-c.bit_length() // 16))
    cl = _const_limbs(c, Lc)
    zero = jnp.zeros((n,), jnp.uint32)
    cols = [zero] * W
    for j, cj in enumerate(cl):
        if cj == 0 or j >= W:
            continue
        for i in range(min(Lx, W - j)):
            k = i + j
            prod = x[i] * jnp.uint32(cj)
            cols[k] = cols[k] + (prod & _M16)
            if k + 1 < W:
                cols[k + 1] = cols[k + 1] + (prod >> 16)
    carry = zero
    out = []
    for k in range(W):
        v = cols[k] + carry
        out.append(v & _M16)
        carry = v >> 16
    return jnp.stack(out, axis=0)


def _add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^(16*W), limb-lane arrays of equal shape."""
    W = a.shape[0]
    carry = jnp.zeros(a.shape[1:], jnp.uint32)
    out = []
    for k in range(W):
        v = a[k] + b[k] + carry
        out.append(v & _M16)
        carry = v >> 16
    return jnp.stack(out, axis=0)


def _sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^(16*W)."""
    W = a.shape[0]
    borrow = jnp.zeros(a.shape[1:], jnp.uint32)
    out = []
    for k in range(W):
        v = a[k] - b[k] - borrow
        out.append(v & _M16)
        borrow = (v >> 16) & 1
    return jnp.stack(out, axis=0)


def _to_sign_magnitude(t: jnp.ndarray):
    """Two's-complement mod 2^(16*W) -> (neg [n] bool, magnitude [W, n])."""
    W = t.shape[0]
    neg = (t[W - 1] >> 15) != 0
    inv = (~t) & _M16
    carry = jnp.ones(t.shape[1:], jnp.uint32)
    rows = []
    for k in range(W):
        v = inv[k] + carry
        rows.append(v & _M16)
        carry = v >> 16
    mag_neg = jnp.stack(rows, axis=0)
    return neg, jnp.where(neg[None, :], mag_neg, t)


def decompose_traced(glv: dict, r: int, scalars: jnp.ndarray):
    """Vectorized Babai rounding of traced canonical scalars.

    scalars: uint32[Ls, n] 16-bit limbs, values < r.  Returns
    (neg1 [n], mag1 [W, n], neg2, mag2) with
    k = (-1)^neg1 * mag1 + (-1)^neg2 * mag2 * lambda  (mod r)
    and mag_i < 2^(16*W - 1), W sized from the basis.

    Exact-division rounding c_i = round(k * beta_i / det) is replaced by
    c_i = (k * round(beta_i * 2^m / det) + 2^(m-1)) >> m with
    m = 16 bits above k's width — off by at most 1, which only lengthens
    k1/k2 by one bit (k1 + k2*lam == k (mod r) holds for ANY c_i, glv.rs
    scalar_decomposition contract).  All limb arithmetic is exact; signs
    of the basis entries specialize at trace time.
    """
    (a1, b1), (a2, b2) = glv["basis"]
    det = a1 * b2 - a2 * b1
    if det < 0:  # normalize so the rounding constants are positive-det
        a1, b1, a2, b2, det = -a1, -b1, -a2, -b2, -det
    Ls = scalars.shape[0]
    m_limbs = Ls + 1  # 16 slack bits: |g*k/2^m - k*beta/det| < 1/2^17
    m = 16 * m_limbs
    # sign-magnitude output width: basis entries + 2 bits of slack
    max_basis = max(abs(a1), abs(b1), abs(a2), abs(b2))
    W = -(-(max_basis.bit_length() + 3) // 16)
    c_limbs = W + 1

    def round_mul(beta: int):
        """c = round(k * beta / det) as (neg, magnitude-limb array)."""
        g = (abs(beta) << m) // det  # floor; rounding slack absorbed by m
        mag = _mul_const_round_shift(scalars, g, m_limbs, c_limbs)
        return beta < 0, mag

    n1, c1 = round_mul(b2)
    n2, c2 = round_mul(-b1)

    def acc_k(base, pairs):
        """base - sum((neg_c, c, const)): exact mod 2^(16*W)."""
        t = base
        for neg_c, c, const in pairs:
            term = _mul_const_mod(c, abs(const), W)
            # sign of the whole term: sign(c) XOR sign(const)
            if (const < 0) != neg_c:
                t = _add_mod(t, term)
            else:
                t = _sub_mod(t, term)
        return t

    k_low = scalars[:W] if Ls >= W else jnp.concatenate(
        [scalars, jnp.zeros((W - Ls,) + scalars.shape[1:], jnp.uint32)],
        axis=0)
    # k1 = k - c1*a1 - c2*a2 ;  k2 = -c1*b1 - c2*b2
    t1 = acc_k(k_low, [(n1, c1[:W], a1), (n2, c2[:W], a2)])
    t2 = acc_k(jnp.zeros_like(k_low), [(n1, c1[:W], b1), (n2, c2[:W], b2)])
    neg1, mag1 = _to_sign_magnitude(t1)
    neg2, mag2 = _to_sign_magnitude(t2)
    return neg1, mag1, neg2, mag2


def glv_mul(curve, P, scalars: jnp.ndarray):
    """Batched GLV multiply for traced scalars (glv.rs glv_mul, batched).

    P: Jacobian point batch with batch shape (n,); scalars: uint32[Ls, n]
    canonical 16-bit limbs.  Decomposes on device via
    ``decompose_traced`` then runs a half-width simultaneous
    double-and-add scan over the joint (k1, k2) bits — ~(bits/2 + 2)
    point doublings instead of ``bits`` for plain double-and-add.
    """
    glv = curve.glv
    r = curve.scalar_modulus
    batch = scalars.shape[1:]
    if len(batch) != 1:  # flatten batch dims for the limb helpers
        import numpy as _np

        nb = int(_np.prod(batch)) if batch else 1
        flat = scalars.reshape(scalars.shape[0], nb)
        Pf = jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[0], nb), P)
        out = glv_mul(curve, Pf, flat)
        return jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[:1] + batch), out)
    neg1, mag1, neg2, mag2 = decompose_traced(glv, r, scalars)
    W = mag1.shape[0]
    max_basis = max(abs(v) for row in glv["basis"] for v in row)
    nbits = min(16 * W, max_basis.bit_length() + 3)

    base = curve.base
    P1 = curve.select(neg1, curve.neg(P), P)
    P2 = endomorphism(curve, P)
    P2 = curve.select(neg2, curve.neg(P2), P2)
    both = curve.add(P1, P2)
    zero = curve.zero(curve.batch_shape(P))

    # joint digit per bit: d = bit(k1) + 2*bit(k2) selects
    # [zero, P1, P2, P1+P2] per lane (two nested masked selects)
    def bits_of(mag):
        rows = []
        for i in range(nbits - 1, -1, -1):
            rows.append((mag[i // 16] >> (i % 16)) & 1)
        return jnp.stack(rows, axis=0)  # [nbits, n] MSB first

    b1v = bits_of(mag1) != 0
    b2v = bits_of(mag2) != 0

    def body(acc, bits):
        bb1, bb2 = bits
        acc = curve.double(acc)
        lo = curve.select(bb1, P1, zero)
        hi = curve.select(bb1, both, P2)
        entry = curve.select(bb2, hi, lo)
        return curve.add(acc, entry), None

    acc, _ = jax.lax.scan(body, zero, (b1v, b2v))
    return acc
