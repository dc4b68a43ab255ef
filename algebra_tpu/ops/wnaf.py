"""wNAF scalar multiplication context.

Re-design of the reference's ``WnafContext``
(ec/src/scalar_mul/wnaf.rs:7-70): a table of odd multiples
[1, 3, 5, ...]*2^0? — the reference stores base*2^wi multiples; here we
keep its table shape: table[i] = 2^(w*i) * base for the w-bit digit
decomposition, and each scalar's signed digits select (with negation
masks) from the table.  Host-constant scalars unroll; traced scalar
batches use the fixed_base windowed path instead (wNAF digit recoding of
traced scalars offers no TPU advantage over signed fixed windows).
"""

from __future__ import annotations


def wnaf_digits(k: int, w: int):
    """Signed w-NAF digits of k (little-endian), values odd, |d| < 2^(w-1)
    (the reference's BigInteger::find_wnaf generalization)."""
    out = []
    while k != 0:
        if k & 1:
            d = k % (1 << w)
            if d >= 1 << (w - 1):
                d -= 1 << w
            k -= d
        else:
            d = 0
        out.append(d)
        k >>= 1
    return out


class WnafContext:
    def __init__(self, curve, window_size: int):
        assert window_size >= 2
        self.curve = curve
        self.w = window_size

    def table(self, base):
        """[2^(w-1)] odd multiples of base: [1, 3, 5, ...] * base."""
        c = self.curve
        double_base = c.double(base)
        entries = [base]
        for _ in range((1 << (self.w - 1)) - 1):
            entries.append(c.add(entries[-1], double_base))
        return entries

    def mul(self, base, k: int):
        """base * k for a host-constant scalar via wNAF digits
        (wnaf.rs mul/mul_with_table), as a digit scan over the odd-multiple
        table (compile-size O(1) in the scalar length)."""
        import jax
        import jax.numpy as jnp

        c = self.curve
        digits = wnaf_digits(int(k) % c.scalar_modulus, self.w)
        if not digits:
            return c.zero(c.batch_shape(base))
        tbl = self.table(base)
        stacked = tuple(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *[t[i] for t in tbl])
            for i in range(len(tbl[0]))
        )
        idx = jnp.asarray(
            [(abs(d) - 1) // 2 if d else 0 for d in reversed(digits)], jnp.int32
        )
        neg = jnp.asarray([d < 0 for d in reversed(digits)], jnp.bool_)
        nz = jnp.asarray([d != 0 for d in reversed(digits)], jnp.bool_)
        shape = c.batch_shape(base)

        def body(acc, xs):
            i, is_neg, is_nz = xs
            acc = c.double(acc)
            entry = tuple(jax.tree_util.tree_map(lambda t: t[i], coord)
                          for coord in stacked)
            entry = c.select(jnp.broadcast_to(is_neg, shape), c.neg(entry), entry)
            added = c.add(acc, entry)
            return c.select(jnp.broadcast_to(is_nz, shape), added, acc), None

        acc, _ = jax.lax.scan(body, c.zero(shape), (idx, neg, nz))
        return acc
