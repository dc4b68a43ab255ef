"""Fixed-base MSM: one base point, many scalars.

Re-design of the reference's ``FixedBase``
(ec/src/scalar_mul/fixed_base.rs:9-98): a windowed table of multiples of
the base is built once (sequentially in the window count, vectorized
across table entries), then every scalar's digits index the table with
batched gathers and the windows fold with batched adds — each output
lane is independent, so the whole scalar batch advances in lock-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_table(curve, base, c: int, scalar_bits: int):
    """Point table with leading axes [num_windows, 2^c]:
    table[w, d] = d * 2^(cw) * base.

    (The reference's get_window_table, fixed_base.rs:9-39.)  Built as a
    scan over windows of a scan over entries, so the compiled program is
    O(1) in both dimensions.
    """
    num_windows = -(-scalar_bits // c)

    def win_body(cur, _):
        def ent_body(acc, _):
            return curve.add(acc, cur), acc  # collect d*cur for d = 0..2^c-1

        _, entries = jax.lax.scan(
            ent_body, curve.zero(()), None, length=1 << c
        )
        for _ in range(c):
            cur = curve.double(cur)
        return cur, entries

    _, tables = jax.lax.scan(win_body, base, None, length=num_windows)
    return tables  # point tuple with leading [num_windows, 2^c] per coord


def msm(curve, table, scalars: jnp.ndarray, c: int):
    """scalars: uint32[Ls, n] canonical limb-major limbs -> [n] points =
    k_i * base (the reference's FixedBase::msm, fixed_base.rs:62-98)."""
    L, n = scalars.shape
    scalar_bits = 16 * L
    num_windows = -(-scalar_bits // c)

    # unsigned base-2^c digits per window
    shifts = jnp.arange(16, dtype=jnp.uint32).reshape(1, 16, 1)
    bits = ((scalars[:, None, :] >> shifts) & 1).reshape(16 * L, n)
    digit_list = []
    for w in range(num_windows):
        lo = w * c
        hi = min(lo + c, scalar_bits)
        weights = jnp.asarray(
            [1 << (i - lo) for i in range(lo, hi)], jnp.uint32
        )[:, None]
        digit_list.append((bits[lo:hi] * weights).sum(axis=0))
    digits = jnp.stack(digit_list, axis=0)  # [W, n] uint32

    acc = curve.zero((n,))
    for w in range(num_windows):
        # table leaves are [W, 2^c, L, ...]; the gathered scalar axis n
        # must move to the leading BATCH slot (right after limbs)
        entry = tuple(
            jax.tree_util.tree_map(
                lambda t: jnp.moveaxis(t[w][digits[w]], 0, 1), coord
            )
            for coord in table
        )
        acc = curve.add(acc, entry)
    return acc
