"""Pippenger multi-scalar multiplication, TPU-vectorized.

TPU-native re-design of the reference's ``VariableBaseMSM``
(ec/src/scalar_mul/variable_base/mod.rs:12-288).  The reference's per-window
rayon loop with random-access bucket scatter does not map to TPU; instead:

  * **Signed-digit recoding** (the reference's `make_digits`,
    variable_base/mod.rs:249-288) is computed for ALL windows at once by
    vectorized shifts over the 16-bit scalar limbs.
  * **Bucket accumulation** is conflict-free and gather-based: per window,
    points are sorted by bucket index (one XLA sort of u32 keys), and then
    round r adds the r-th point of every bucket simultaneously — one
    batched mixed-add of width  num_windows x num_buckets  per round.
    The number of rounds is the maximum bucket occupancy (~ n / 2^(c-1)
    for random scalars), so total work is ~ (1 + padding) * n * W adds —
    the same asymptotics as scalar Pippenger, but every add is a full
    vector lane-batch.  All windows are processed together as a leading
    batch axis; there is no per-window loop in the hot path.
  * **Bucket reduction**  sum_m m*S_m = sum_k suffix_k(S)  uses a reverse
    associative scan (log B rounds of [W, B]-wide adds) + a tree sum,
    replacing the reference's serial suffix loop
    (variable_base/mod.rs:124-130).
  * **Window fold** is the usual Horner fold with c doublings per window
    (variable_base/mod.rs:134-148).

Scalars are canonical (non-Montgomery) 16-bit-limb arrays; `msm_mont`
accepts Montgomery-form field elements and converts (the reference's
`msm` -> `into_bigint` -> `msm_bigint` pipeline, mod.rs:20-41).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from . import mont


def ln_without_floats(n: int) -> int:
    """log2(n)*69/100 ~ ln(n) (reference: scalar_mul/mod.rs:17-20)."""
    return max(int(math.log2(max(n, 1)) * 69 / 100), 1)


def default_window_size(n: int) -> int:
    """Window size heuristic c (variable_base/mod.rs:97-101), capped to 16
    so a digit never spans more than two 16-bit limbs."""
    c = 3 if n < 32 else ln_without_floats(n) + 2
    return min(c, 16)


def signed_digits(scalars: jnp.ndarray, c: int, num_windows: int,
                  last_unsigned: bool = False, w_start: int = 0,
                  w_end: int | None = None) -> jnp.ndarray:
    """Signed base-2^c digits of canonical limb scalars.

    scalars: uint32[Ls, n] (16-bit limbs, limb-major, little-endian).
    Returns int32[w_end - w_start, n] with digits in [-2^(c-1), 2^(c-1)].
    Vectorized equivalent of make_digits (variable_base/mod.rs:249-288).

    With ``last_unsigned`` the final window keeps its raw value + carry
    (no recentering, so no extra carry window); the caller guarantees
    that value fits 2^(c-1) (scalar_bits - c*(W-1) <= c-1).

    ``w_start``/``w_end`` restrict the materialized output to a window
    range — earlier windows run carry-only, so peak memory is
    O(n * (w_end - w_start)) instead of O(n * num_windows).
    """
    if w_end is None:
        w_end = num_windows
    L, n = scalars.shape
    zero_row = jnp.zeros((1, n), jnp.uint32)
    padded = jnp.concatenate([scalars, zero_row], axis=0)
    digits = []
    carry = jnp.zeros((n,), jnp.uint32)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.int32(1 << c)
    for w in range(w_end):
        lo = w * c
        k, off = lo // 16, lo % 16
        if k >= L:
            raw = jnp.zeros((n,), jnp.uint32)
        else:
            lo_bits = padded[k] >> off
            hi_bits = jnp.where(
                off == 0, jnp.uint32(0), padded[min(k + 1, L)] << (16 - off)
            )
            raw = (lo_bits | hi_bits) & jnp.uint32((1 << c) - 1)
        d = raw + carry
        if last_unsigned and w == num_windows - 1:
            if w >= w_start:
                digits.append(d.astype(jnp.int32))
            continue
        carry = (d + half) >> c  # 1 iff d >= 2^(c-1)
        if w >= w_start:
            digit = d.astype(jnp.int32) - carry.astype(jnp.int32) * full
            digits.append(digit)
    return jnp.stack(digits, axis=0)


def plan_windows(scalar_bits: int, c0: int, n: int,
                 tree: bool | None = None):
    """Pick (c, W) minimizing a measured cost model.  c is capped at 16
    (digits must span <= 2 limbs); the final unsigned window must fit
    the signed bucket range (leftover <= c - 1).

    Tree path (TPU): score = W * (n*recode + m0(c)*slot + B*bucket) with
    the per-unit costs measured on v5e and stored in config
    (msm_cost_*) — the round-3 version hard-coded launch/lane-add
    guesses; these constants are calibrated from exp/msm_phases.py and
    overridable per backend.  CPU (lockstep path): the original
    launch/lane-add latency model, which tracks XLA:CPU behavior.
    """
    from .. import config

    if tree is None:
        tree = config.msm_affine_tree_enabled()
    best = None
    for c in range(max(4, c0 - 3), min(16, c0 + 2) + 1):
        W = -(-scalar_bits // c)
        leftover = scalar_bits - c * (W - 1)
        if leftover > c - 1:
            continue  # unsigned top value would overflow the bucket range
        B = 1 << (c - 1)
        if tree:
            k, m0, _ = _tree_plan(n, B, 1)
            score = W * (n * config.msm_cost_recode
                         + m0 * config.msm_cost_slot
                         + B * config.msm_cost_bucket)
        else:
            # sequential kernel launches are latency-bound (~1ms each)
            # while arithmetic streams at ~20ns per lane-add.
            launches = 1.3 * n / B + n / (1 << leftover) + 2 * (c - 1)
            lane_adds = (2 * n * W + 2 * (c - 1) * W * B
                         + (n / (1 << leftover)) * B)
            score = launches * 1e-3 + lane_adds * 22e-9
        if best is None or score < best[0]:
            best = (score, c, W)
    if best is None:  # pathological scalar_bits; fall back to c=4
        c = 4
        W = -(-scalar_bits // c)
        while scalar_bits - c * (W - 1) > c - 1:
            W += 1
        return c, W
    return best[1], best[2]


def _tree_plan(n: int, n_buckets: int, num_windows: int,
               budget_slots: int | None = None):
    """(k, m0, group) for the aligned positional-halving bucket phase.

    k: halving levels (bucket counts pad to multiples of 2^k).
    m0: per-window padded slot count, pad_bucket-family aligned and
        divisible by 2^k so every level's slice widths stay in the
        {2^j, 0.75*2^j} kernel-shape buckets with no re-padding.
    group: windows per group, from the family-safe set, sized so peak
        live bytes (~1.7 KB/slot at the level-0 -> level-1 transition:
        packed rows + unpacked halves + affine internals + next level)
        fit in ~13 GB HBM beside the bases.  Streaming callers
        (msm_chunks) pass a smaller budget_slots when large persistent
        base/scalar arrays occupy HBM alongside the chunk transients —
        the measured r5 failure mode at 2^24 was 4.4x/chunk allocation
        churn from exactly that pressure (BENCH_msm_r05.json).
    """
    from .mont_pallas import pad_bucket

    occ = max(1, n // n_buckets)
    k = 0
    while occ > 4 and k < 4:
        occ //= 2
        k += 1
    m0 = n + ((1 << k) - 1) * n_buckets
    m0 = pad_bucket(m0, max(64 << k, 128))
    # empirically ~2.6 KB live per level-0 slot at peak (XLA keeps the
    # gather output, both unpacked halves, affine internals and the next
    # level alive together); 6M slots measured to fit, 6.3M to OOM.
    if budget_slots is None:
        budget_slots = 6 << 20
    allowed = [16, 12, 8, 6, 4, 3, 2, 1]
    if m0 % 3 == 0:  # m0 = 3*2^i: g with a factor 3 would leave the family
        allowed = [16, 8, 4, 2, 1]
    group = 1
    for g in allowed:
        if g <= num_windows and g * m0 <= budget_slots:
            group = g
            break
    return k, m0, group


def _tree_take(value, idx):
    """Gather/slice along the leading BATCH axis of limb-major leaves."""
    return jax.tree_util.tree_map(lambda a: a[:, idx], value)


def _tree_rowmajor(value):
    """Limb-major [L, n] leaves -> point-major [n, L] copies.

    The bucket rounds gather one point per (window, bucket) from HBM;
    on a point-major copy each gathered point is ONE contiguous L-limb
    row (a single cache line for 384-bit fields) instead of L
    column elements strided n*4 bytes apart."""
    return jax.tree_util.tree_map(lambda a: a.T, value)


def _row_take(value, idx):
    """Row-gather point-major [n, L] leaves at idx[...] and restore the
    limb-major layout: returns [L, *idx.shape] leaves."""
    return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a[idx], -1, 0), value)


def msm(curve, bases_aff, scalars: jnp.ndarray, c: int | None = None,
        scalar_bits: int | None = None, slot_budget: int | None = None):
    """Variable-base MSM:  sum_i scalars[i] * bases[i].

    curve: SWCurve kind; bases_aff: affine batch (x, y, inf) of n points;
    scalars: uint32[Ls, n] canonical 16-bit limbs (< 2^scalar_bits;
    default 16*Ls).  Returns a single Jacobian point (batch shape ()).
    slot_budget caps the bucket phase's live tree slots (streaming
    callers shrink it to leave HBM for their persistent arrays).
    """
    B = curve.base
    x, y, inf = bases_aff
    n = scalars.shape[1]
    if n < 64:
        # tiny inputs: direct per-point scalar mul + scan-fold sum (the
        # reference also special-cases small sizes, variable_base/mod.rs
        # window heuristic).  A lax.scan fold compiles ONE add body; the
        # halving tree would inline log2(n) distinct-shape add bodies,
        # which dominates XLA:CPU compile time in the multi-chip dry run.
        P = curve.scalar_mul(curve.from_affine(bases_aff), scalars)
        return scan_sum(curve, P, axis=0)
    if scalar_bits is None:
        scalar_bits = min(16 * scalars.shape[0],
                          curve.scalar_modulus.bit_length())
    if c is None:
        c, num_windows = plan_windows(scalar_bits, default_window_size(n), n)
    else:
        num_windows = -(-scalar_bits // c)
        if scalar_bits - c * (num_windows - 1) > c - 1:
            num_windows += 1  # keep the unsigned top window in range
    n_buckets = 1 << (c - 1)

    # Recode + sort in window GROUPS so the transient per-window arrays
    # (digits, keys, argsort workspace) peak at O(group * n), not
    # O(W * n) — at 2^24 points the all-windows transients alone exceed
    # HBM.  Only `order` (the gather permutation) and `is_neg` persist
    # for all windows.
    group = max(1, min(num_windows, (1 << 26) // max(n, 1)))

    def recode_group(g0, g1):
        digits = signed_digits(scalars, c, num_windows, last_unsigned=True,
                               w_start=g0, w_end=g1)
        mags = jnp.abs(digits).astype(jnp.uint32)  # 0..2^(c-1)
        isneg_g = digits < 0
        # bucket key: magnitude-1 for active points; inactive (digit 0
        # or point at infinity) get key = n_buckets, sorting to the end.
        key = jnp.where(
            jnp.logical_or(mags == 0, inf[None, :]),
            jnp.uint32(n_buckets),
            mags - 1,
        )  # [g, n]
        order_g = jnp.argsort(key, axis=1).astype(jnp.uint32)  # [g, n]
        sorted_key = jnp.take_along_axis(key, order_g, axis=1)
        # run starts/counts WITHOUT searchsorted (whose binary-search
        # while loop costs ~19 gathers of [g, B]): scatter-min the first
        # occurrence position of each key (incl. the inactive sentinel
        # column B), reverse-cummin to fill empty buckets with the next
        # run's start, and difference for the counts.
        g_sz = sorted_key.shape[0]
        first = jnp.full((g_sz, n_buckets + 2), n, jnp.int32)
        first = first.at[
            jnp.arange(g_sz, dtype=jnp.int32)[:, None],
            sorted_key.astype(jnp.int32),
        ].min(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                               sorted_key.shape))
        ext = jax.lax.cummin(first[:, ::-1], axis=1)[:, ::-1]
        start_g = ext[:, :n_buckets]
        counts_g = ext[:, 1 : n_buckets + 1] - start_g
        return order_g, isneg_g, sorted_key, start_g, counts_g

    from .. import config

    if config.msm_affine_tree_enabled() and hasattr(curve, "affine_add"):
        # Sorted-segment affine pairwise tree: the whole bucket phase
        # (including skewed/top windows) runs per window group, so slot
        # metadata AND the level-0 half-width value arrays stay
        # O(group * n) — the values are ~L x32 larger per slot than the
        # u32 metadata, hence the tighter group bound.  The slot budget
        # caps live level-0 memory (~1.2 KB/slot across the packed rows,
        # row gathers, and affine-add internals) under the ~14 GB HBM
        # left beside the bases; 2^24 runs at group=1.
        _, _, group = _tree_plan(n, n_buckets, num_windows, slot_budget)
        # flat 2-D packed point rows [n, 128] (512 B each): measured on
        # v5e, row gathers run ~15 ns/row on 128-u32 2-D arrays vs
        # ~60 ns on narrower/3-D layouts (exp/gather_bench.py), and the
        # flat form avoids XLA's [g, m, 1] tile-padding blowups.  Pad
        # slots need no sentinel row: the first halving level of each
        # stage masks them to infinity from the run metadata.
        from . import rows_pallas

        xy_rows = rows_pallas.pack(B.spec, x, y, inf)
        bucket_parts = None
        fence = None
        for g0 in range(0, num_windows, group):
            xy_rows_g = xy_rows
            if fence is not None:
                # serialize the groups: the group loop exists to bound
                # peak HBM, but without a data dependence XLA schedules
                # all groups' 3 GB expansion buffers CONCURRENTLY
                # (measured 16.7 GB at 2^20 -> OOM)
                xy_rows_g, _ = jax.lax.optimization_barrier(
                    (xy_rows, fence))
            order_g, isneg_g, skey_g, start_g, counts_g = recode_group(
                g0, min(g0 + group, num_windows))
            # fold the digit sign into the permutation's top bit: one
            # gather fetches point index + sign together
            negs = jnp.take_along_axis(isneg_g, order_g.astype(jnp.int32),
                                       axis=1)
            order_signed = order_g | (negs.astype(jnp.uint32) << 31)
            part = _affine_tree_buckets(
                curve, xy_rows_g, order_signed, skey_g, start_g, counts_g,
                n, n_buckets)
            fence = jax.tree_util.tree_leaves(part)[0]
            if bucket_parts is None:
                bucket_parts = [[coord] for coord in part]
            else:
                for lst, coord in zip(bucket_parts, part):
                    lst.append(coord)
        buckets = tuple(
            jax.tree_util.tree_map(lambda *a: jnp.concatenate(a, axis=1), *lst)
            for lst in bucket_parts
        )
        window_sums = _weighted_reduce(curve, buckets)  # [W]
        return _horner_fold(curve, window_sums, c)

    order_parts, isneg_parts, start_parts, count_parts = [], [], [], []
    for g0 in range(0, num_windows, group):
        order_g, isneg_g, _skey, start_g, counts_g = recode_group(
            g0, min(g0 + group, num_windows))
        order_parts.append(order_g)
        isneg_parts.append(isneg_g)
        start_parts.append(start_g)
        count_parts.append(counts_g)
    order = jnp.concatenate(order_parts, axis=0)  # [W, n]
    is_neg = jnp.concatenate(isneg_parts, axis=0)
    start = jnp.concatenate(start_parts, axis=0)  # [W, B]
    counts = jnp.concatenate(count_parts, axis=0).astype(jnp.int32)

    x_row = _tree_rowmajor(x)
    y_row = _tree_rowmajor(y)

    def make_round_body(order_w, start_w, counts_w, isneg_w):
        def round_body(r, acc):
            pos = start_w + r
            valid = r < counts_w
            idx = jnp.take_along_axis(order_w, jnp.clip(pos, 0, n - 1), axis=1)
            gx = _row_take(x_row, idx)
            gy = _row_take(y_row, idx)
            gneg = jnp.take_along_axis(isneg_w, idx, axis=1)
            gy2 = B.select(gneg, B.neg(gy), gy)
            g_inf = jnp.logical_not(valid)
            return curve.add_mixed(acc, (gx, gy2, g_inf))

        return round_body

    # The TOP window covers only the leftover high bits (+ recoding carry),
    # so its digits concentrate in few small buckets: its max occupancy is
    # ~n / 2^(leftover bits), far above the ~n/B of the full windows.  A
    # single lockstep loop would burn max-occupancy rounds on ALL windows;
    # instead: lockstep rounds over every window up to the FULL-window max,
    # then continue the top window alone on a [1, B] slice.
    #
    # Within the full windows the bucket occupancies are ~Poisson(n/B):
    # the max is mean + O(sqrt(mean * log WB)), so lockstep-to-max wastes
    # ~30% of rounds on a tail that touches <2% of buckets.  The lockstep
    # loop therefore stops at the K-th largest count (guaranteeing <= K-1
    # unfinished buckets), and a COMPACTED [K]-wide loop drains the tail.
    from ..utils.vma import match_vma

    zero_pt = match_vma(curve.zero((num_windows, n_buckets)), (x_row, order))
    is_neg_b = jnp.broadcast_to(is_neg, (num_windows, n))
    counts_f = (counts[:-1] if num_windows > 1 else counts).reshape(-1)
    rounds_max = jnp.max(counts_f)
    W_full = num_windows - 1 if num_windows > 1 else num_windows
    WB = W_full * n_buckets
    K = min(max(64, WB // 16), WB)
    compact_tail = WB > 2 * K  # tiny problems: lockstep to the max
    if compact_tail:
        sorted_c = jnp.sort(counts_f)
        rounds_full = sorted_c[WB - K]
    else:
        rounds_full = rounds_max
    buckets = jax.lax.fori_loop(
        0,
        rounds_full,
        make_round_body(order, start, counts, is_neg_b),
        zero_pt,
    )
    if compact_tail:
        buckets = _drain_bucket_tail(
            curve, B, buckets, counts_f, rounds_full, rounds_max, order,
            start, is_neg_b, x_row, y_row, W_full, n_buckets, n, K,
        )
    if num_windows > 1:
        rounds_top = jnp.max(counts[-1])
        top = curve.index_point(buckets, slice(num_windows - 1, None))
        top = jax.lax.fori_loop(
            rounds_full,
            jnp.maximum(rounds_top, rounds_full),
            make_round_body(
                order[-1:], start[-1:], counts[-1:], is_neg_b[-1:]
            ),
            top,
        )
        buckets = tuple(
            jax.tree_util.tree_map(
                lambda full, t: jnp.concatenate([full[:, :-1], t], axis=1),
                coord_full,
                coord_top,
            )
            for coord_full, coord_top in zip(buckets, top)
        )

    # weighted bucket reduction: sum_k (k+1) * S_k via a pairwise merge
    # tree — ~5*B*W lane-adds total (halving widths) instead of the
    # Hillis–Steele double-suffix-scan's 2*B*log2(B)*W, which dominated
    # whole-MSM time at c = 16 (B = 32768).  Costs log2(B) distinct
    # compiled add shapes; B is small in the CPU test/dryrun configs.
    window_sums = _weighted_reduce(curve, buckets)  # [W]
    return _horner_fold(curve, window_sums, c)


def _weighted_reduce(curve, P):
    """Weighted bucket reduction entry point.

    The blocked double scan is ~900 SEQUENTIAL steps of small adds;
    what makes it fast on TPU is not the schedule but the step cost:
    with curve.add routed through the fused Pallas kernel even at small
    batches (config.pallas_min_batch), one step is a single ~50 us
    kernel launch instead of ~600 separate XLA elementwise ops (~1 ms
    measured).  A log-depth pairwise-tree variant was tried and reverted
    — its ~80 distinct-shape add bodies made the axon remote compile
    pathological (>45 min) for a ~40 ms win."""
    return _weighted_tree_reduce(curve, P)


def _horner_fold(curve, window_sums, c: int):
    """Horner fold over windows, most significant first, as a scan
    (unrolling W * c doublings made the XLA graph enormous;
    variable_base/mod.rs:134-148).  lax.scan consumes leaf axis 0, so
    the window axis moves ahead of the limb axis first.  The ~c*W
    sequential batch-() doublings are an inherent floor (no pairing
    scheme reduces the sequential depth; the 2^(c*(W-1)) factor alone
    needs c*(W-1) doublings)."""
    wsums_desc = curve.index_point(window_sums, slice(None, None, -1))
    wsums_scan = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 1, 0), wsums_desc
    )

    def fold(total, wsum):
        for _ in range(c):
            total = curve.double(total)
        return curve.add(total, tuple(wsum)), None

    from ..utils.vma import match_vma

    total, _ = jax.lax.scan(
        fold, match_vma(curve.zero(()), wsums_scan), wsums_scan
    )
    return total


def _batched_inv_fn(base):
    """Batched field inversion hook for the affine bucket phase.

    Prime fields route to the blocked Pallas Montgomery trick (~3 muls
    per lane) on TPU and the associative-scan trick on CPU; other kinds
    (extension towers) fall back to the kind's own inverse."""
    from ..fields.prime import PrimeField
    from .. import config

    if not isinstance(base, PrimeField):
        return base.inverse
    spec = base.spec

    def invert(v):
        batch = v.shape[1:]
        nb = int(np.prod(batch)) if batch else 1
        if config.pallas_enabled() and nb >= config.pallas_min_batch:
            from . import mont_pallas

            return mont_pallas.batch_inverse(spec, v)
        flat = v.reshape(spec.n_limbs, nb)
        out = mont.batch_inverse(spec, flat, axis=0)
        return out.reshape(v.shape)

    return invert


def _rows_level_fn(curve):
    """Packed-row halving-level add (sw_pallas.affine_add_rows) when the
    fused kernels apply (prime base, Pallas on); None -> the composed
    unpack/affine_add/pack fallback."""
    from ..fields.prime import PrimeField
    from .. import config

    B = curve.base
    if not isinstance(B, PrimeField):
        return None
    if not (config.pallas_enabled() or config.pallas_interpret):
        return None
    from ..bigint import int_to_limbs
    from . import sw_pallas

    a_mont = None
    if not curve.a_is_zero:
        spec = B.spec
        a_mont = tuple(int(v) for v in int_to_limbs(
            (int(curve.a_host) * spec.R) % spec.modulus, spec.n_limbs))
    return lambda V, valid, inv_fn: sw_pallas.affine_add_rows(
        B.spec, a_mont, V, valid, inv_fn)


# measured v5e unit costs for the stage-vs-lockstep tradeoff (NOTES r5):
# an affine-tree slot (expansion DMA + one level's share of adds) ~40 ns;
# a lockstep Jacobian round ~110 ns per (window, bucket) lane
# (14.5 ms at [4, 32768], exp/msm_finish_probe.py) + ~2 ms fixed.
_STAGE_SLOT_NS = 40e-9
_ROUND_LANE_NS = 1.1e-7
_STAGE_FIXED_S = 2e-3
_ROUND_FIXED_S = 2e-3


def _extra_stages(n: int, n_buckets: int, k1: int) -> list[int]:
    """Schedule of additional 1-level halving stages after the first
    k1-level stage: keep halving (with re-expansion between stages)
    while the affine re-halving is CHEAPER than the lockstep rounds it
    replaces (each k=1 stage halves the statistical max occupancy, so
    it saves ~cmax/2 rounds that sweep every bucket lane).  The
    schedule is static (shapes must be); adversarial digit
    distributions just fall through to more lockstep rounds —
    correctness never depends on it."""
    occ = n / max(n_buckets, 1)
    # the capped lockstep runs to the ~94th percentile count (the K-th
    # largest with K = WB/16; the compacted drain absorbs the tail), so
    # score stages against the PERCENTILE, not the max
    cpct = int(occ + 1.6 * math.sqrt(occ) + 2)
    cpct = -(-cpct // (1 << k1))
    n_cur = (n + ((1 << k1) - 1) * n_buckets) // (1 << k1)
    ks = []
    while cpct > 2 and len(ks) < 4:
        m_s = n_cur + n_buckets  # U=2 padded slot count (per window)
        stage_cost = m_s * _STAGE_SLOT_NS + _STAGE_FIXED_S
        rounds_saved = cpct - (cpct + 1) // 2
        saved = rounds_saved * (n_buckets * _ROUND_LANE_NS + _ROUND_FIXED_S)
        if saved <= stage_cost:
            break
        ks.append(1)
        cpct = (cpct + 1) // 2
        n_cur = m_s // 2
    return ks


def _affine_tree_buckets(curve, xy_rows, order_signed, sorted_key, start,
                         counts, n: int, n_buckets: int):
    """Bucket sums for one window group via MULTI-STAGE aligned
    positional halving over sorted packed point rows.

    After the per-window sort each bucket's points form one contiguous
    run, so the whole phase works on contiguous-run layouts:

      stage A   rows_sorted = xy_rows[order] with the digit signs folded
                into y (one random row gather + one elementwise pass) —
                after this, every later data movement is run-structured.
      stage s   counts pad to multiples of U = 2^ks and runs EXPAND into
                the padded slot layout with rows_pallas.expand_units:
                one U-row DMA per unit (11.8 ns/row measured vs 30.3 for
                the composed jnp expansion, exp/gather_pallas.py), pad
                slots masked to infinity inside the first level's fused
                kernels (no sentinel rows, no extra HBM pass).  Then ks
                gather-free halving levels: pure strided slices + one
                fused batched affine add each.
      finish    the few remaining over-occupancy slots drain with capped
                lockstep Jacobian mixed-add rounds + a compacted tail —
                usually <= 2 rounds thanks to the extra stages
                (_extra_stages), whose affine re-halving costs ~13 field
                muls per surviving slot vs ~19 muls per LANE-round in
                lockstep (the round sweeps every bucket, occupied or
                not; measured 14.5 ms/round at [4, 32768] on v5e,
                exp/msm_finish_probe.py).

    This replaced (r4->r5) a single-stage tree whose lockstep finish was
    ~40% of the bucket phase, and (r3->r4) a per-level gather/scatter
    compaction whose profile was ~70% dynamic-gather issue cost.

    The reference's analogue is the rayon per-window scatter loop
    (ec/src/scalar_mul/variable_base/mod.rs:110-130); the affine add is
    the batched chord/tangent law with amortized blocked inversion
    (~10 field muls/lane vs ~19 for Jacobian mixed adds).
    """
    B = curve.base
    spec = B.spec
    g = order_signed.shape[0]
    L = spec.n_limbs
    inv_fn = _batched_inv_fn(B)
    from .mont_pallas import pad_bucket
    from . import rows_pallas

    k, m0, _ = _tree_plan(n, n_buckets, 1)
    stages = ([k] if k > 0 else []) + _extra_stages(n, n_buckets, k)
    rows_level = _rows_level_fn(curve)

    # ---- stage A: rows in sorted order, signs folded into y
    idx = (order_signed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    negs = (order_signed >> 31) != 0
    src = rows_pallas.negate_y(
        spec, xy_rows[idx.reshape(-1)], negs.reshape(-1))  # [g*n, 128]
    n_cur = n
    counts_c = counts.astype(jnp.int32)  # [g, B]
    start_c = start.astype(jnp.int32)
    w_rows = jnp.arange(g, dtype=jnp.int32)[:, None]
    bucket_ids = jnp.broadcast_to(
        jnp.arange(n_buckets, dtype=jnp.int32)[None, :], (g, n_buckets))

    for ks in stages:
        U = 1 << ks
        counts_p = ((counts_c + U - 1) >> ks) << ks
        start_p = jnp.cumsum(counts_p, axis=1) - counts_p  # exclusive
        m_s = pad_bucket(n_cur + (U - 1) * n_buckets, max(64 << ks, 128))
        mu = m_s // U

        # run id per UNIT (scatter-max at unit starts + cummax fill;
        # zero-count runs occupy no units, so the max picks the real
        # occupant of a shared start position)
        seed = jnp.zeros((g, mu), jnp.int32)
        seed = seed.at[w_rows, start_p >> ks].max(bucket_ids, mode="drop")
        run_u = jax.lax.cummax(seed, axis=1)  # [g, mu]

        su = jnp.take_along_axis(start_p, run_u, axis=1)
        sc = jnp.take_along_axis(start_c, run_u, axis=1)
        cc = jnp.take_along_axis(counts_c, run_u, axis=1)
        ju = jnp.arange(mu, dtype=jnp.int32)[None, :]
        us = sc + (ju * U - su)  # src slot within the window
        goff_src = (jnp.arange(g, dtype=jnp.int32) * n_cur)[:, None]
        us_flat = jnp.clip((us + goff_src).reshape(-1), 0, g * n_cur - U)
        V = rows_pallas.expand_units(src, us_flat.astype(jnp.int32), U)

        # slot validity (pad slots + fully-pad units read garbage rows;
        # the first level masks them to infinity) — broadcast per unit,
        # no per-slot gathers
        bnd = su + cc  # [g, mu] first invalid slot of each unit's run
        slot_j = jnp.arange(m_s, dtype=jnp.int32).reshape(1, mu, U)
        valid = (slot_j < bnd[:, :, None]).reshape(-1)  # [g*m_s]

        for lvl in range(ks):
            vmask = valid if lvl == 0 else None
            if rows_level is not None:
                V = rows_level(V, vmask, inv_fn)
                continue
            Pl = rows_pallas.unpack(spec, V[0::2])
            Pr = rows_pallas.unpack(spec, V[1::2])
            if vmask is not None:
                Pl = (Pl[0], Pl[1],
                      jnp.logical_or(Pl[2], jnp.logical_not(vmask[0::2])))
                Pr = (Pr[0], Pr[1],
                      jnp.logical_or(Pr[2], jnp.logical_not(vmask[1::2])))
            P3 = curve.affine_add(Pl, Pr, inv_fn)
            V = rows_pallas.pack(spec, *P3)

        src = V
        n_cur = m_s >> ks
        counts_c = counts_p >> ks
        start_c = start_p >> ks

    # ---- finish: capped lockstep mixed-add rounds + compacted drain
    mk = n_cur
    ck = counts_c
    V = src
    start_k = start_c
    goff_mk = (jnp.arange(g, dtype=jnp.int32) * mk)[:, None]

    def fetch_slots(pos, validr):
        rows = V[(goff_mk + jnp.minimum(pos, mk - 1)).reshape(-1)]
        gx, gy, ginf = rows_pallas.unpack(spec, rows)
        gx = gx.reshape(L, g, n_buckets)
        gy = gy.reshape(L, g, n_buckets)
        ginf = jnp.logical_or(ginf.reshape(g, n_buckets),
                              jnp.logical_not(validr))
        return (gx, gy, ginf)

    def slot_round(r, acc):
        return curve.add_mixed(acc, fetch_slots(start_k + r, r < ck))

    from ..utils.vma import match_vma

    zero_pt = match_vma(curve.zero((g, n_buckets)), (V, ck))
    counts_f = ck.reshape(-1)
    rounds_max = jnp.max(counts_f).astype(jnp.int32)
    WB = g * n_buckets
    K = min(max(64, WB // 16), WB)
    if WB > 2 * K:
        rounds_full = jnp.sort(counts_f)[WB - K].astype(jnp.int32)
    else:
        rounds_full = rounds_max
    buckets = jax.lax.fori_loop(0, rounds_full, slot_round, zero_pt)
    if WB > 2 * K:
        buckets = _drain_slot_tail(
            curve, buckets, V, counts_f, start_k, goff_mk, rounds_full,
            rounds_max, g, n_buckets, mk, K)
    return buckets


def _drain_slot_tail(curve, buckets, V, counts_f, start_k, goff_mk, r0, r1,
                     g, n_buckets, mk, K):
    """Finish the <= K-1 overfull (window, bucket) pairs left by the
    capped lockstep loop, on a COMPACTED [K]-wide batch reading the flat
    packed slot rows."""
    from . import rows_pallas

    spec = curve.base.spec
    L = spec.n_limbs
    surv = jnp.argsort(-counts_f.astype(jnp.int32))[:K]
    w_idx = surv // n_buckets
    start_cc = start_k.reshape(-1)[surv]
    counts_cc = counts_f[surv]
    base_off = (w_idx * mk).astype(jnp.int32)

    compact = tuple(
        jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[0], -1)[:, surv], coord
        )
        for coord in buckets
    )

    def body(r, acc):
        pos = jnp.minimum(start_cc + r, mk - 1)
        rows = V[base_off + pos]  # [K, 128]
        gx, gy, ginf = rows_pallas.unpack(spec, rows)
        ginf = jnp.logical_or(ginf, r >= counts_cc)
        return curve.add_mixed(acc, (gx, gy, ginf))

    compact = jax.lax.fori_loop(r0, r1, body, compact)
    return tuple(
        jax.tree_util.tree_map(
            lambda a, comp: a.reshape(a.shape[0], -1)
            .at[:, surv]
            .set(comp)
            .reshape(a.shape),
            coord,
            comp_c,
        )
        for coord, comp_c in zip(buckets, compact)
    )


def _drain_bucket_tail(curve, base, buckets, counts_f, r0, r1, order, start,
                       is_neg_b, x_row, y_row, W_full, n_buckets, n, K):
    """Finish the <= K-1 overfull (window, bucket) pairs the capped
    lockstep loop left behind, on a COMPACTED [K]-wide batch: gather the
    surviving accumulators, run rounds [r0, r1), scatter them back.
    Entries picked only to pad K out no-op via the valid mask."""
    surv = jnp.argsort(-counts_f)[:K]  # flat w * n_buckets + b
    w_idx = surv // n_buckets
    start_c = start[:W_full].reshape(-1)[surv]
    counts_c = counts_f[surv]
    order_flat = order[:W_full].reshape(-1)  # [W_full * n]
    isneg_flat = is_neg_b[:W_full].reshape(-1)

    compact = tuple(
        jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[0], -1)[:, surv], coord
        )
        for coord in buckets
    )

    def body(r, acc):
        pos = jnp.clip(start_c + r, 0, n - 1)
        valid = r < counts_c
        idxp = order_flat[w_idx * n + pos]  # point indices [K]
        gx = _row_take(x_row, idxp)
        gy = _row_take(y_row, idxp)
        gneg = isneg_flat[w_idx * n + idxp]
        gy2 = base.select(gneg, base.neg(gy), gy)
        return curve.add_mixed(acc, (gx, gy2, jnp.logical_not(valid)))

    compact = jax.lax.fori_loop(r0, r1, body, compact)
    return tuple(
        jax.tree_util.tree_map(
            lambda a, c: a.reshape(a.shape[0], -1)
            .at[:, surv]
            .set(c)
            .reshape(a.shape),
            coord,
            comp,
        )
        for coord, comp in zip(buckets, compact)
    )


def _weighted_tree_reduce(curve, P):
    """Weighted bucket reduction  sum_k (k+1) * S_k  along the last
    batch axis of a [W, B] bucket array (B a power of two), as a
    blocked double suffix-accumulate scan.

    Split k = b*G + i (blocks of G ~ sqrt(B) buckets):
        sum_k (k+1) S_k = sum_b innerW_b + G * sum_b b * T_b
    where T_b is block b's plain sum and innerW_b its locally
    (i+1)-weighted sum.  The inner scan (i descending, 2 adds/step on
    [W, B/G] lanes) yields T and innerW for every block at once; the
    outer scan (b descending, 3 adds/step on [W] lanes) accumulates
    sum_b b*T_b and sum_b innerW_b; log2(G) doublings apply the G.

    ~2*W*B lane-adds total — the same order as a pairwise merge tree —
    but exactly TWO compiled add bodies regardless of B.  Shrinking-
    width trees compile a distinct body per level, which XLA:CPU pays
    through LLVM (~1 min/level) and TPU pays ~0.5-1 min/level through
    the axon remote Mosaic compiler; this replaces the reference's
    serial suffix loop (variable_base/mod.rs:124-130) either way.
    Returns the [W] window sums.
    """
    leaves = jax.tree_util.tree_leaves(P)
    W, B = leaves[0].shape[-2], leaves[0].shape[-1]
    if B == 1:
        return curve.index_point(P, (slice(None), 0))
    G = min(B, 1 << (((B - 1).bit_length() + 1) // 2))  # ~sqrt(B), pow2
    nb = B // G

    # leaves [L, W, B] -> scan layout [G, L, W, nb] (scan consumes axis 0)
    Pr = tuple(
        jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(
                a.reshape(a.shape[:-1] + (nb, G)), -1, 0
            ),
            coord,
        )
        for coord in P
    )
    zb = curve.zero((W, nb))

    def inner(carry, s):
        accT, accW = carry
        accT = curve.add(accT, tuple(s))  # suffix sum within the block
        accW = curve.add(accW, accT)  # sum of suffixes = (i+1)-weighted
        return (accT, accW), None

    from ..utils.vma import match_vma

    (T, innerW), _ = jax.lax.scan(
        inner, match_vma((zb, zb), Pr), Pr, reverse=True
    )

    # leaves [L, W, nb] -> [nb, L, W]
    to_scan = lambda Q: tuple(
        jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -1, 0), coord)
        for coord in Q
    )
    zw = curve.zero((W,))

    def outer(carry, s):
        accT, accB, accI = carry
        tb, wb = s
        accB = curve.add(accB, accT)  # += strictly-later suffix -> b*T_b
        accT = curve.add(accT, tuple(tb))
        accI = curve.add(accI, tuple(wb))
        return (accT, accB, accI), None

    xs = (to_scan(T), to_scan(innerW))
    (_, accB, accI), _ = jax.lax.scan(
        outer, match_vma((zw, zw, zw), xs), xs, reverse=True
    )
    for _ in range(G.bit_length() - 1):  # * G (a power of two)
        accB = curve.double(accB)
    return curve.add(accI, accB)


def scan_sum(curve, P, axis: int = 0):
    """Sequential fold of a point batch along one axis via lax.scan.

    O(n) sequential adds but only ONE compiled add body — the right
    trade for small n (partial-point reductions, dry runs, CPU tests);
    use ``_tree_sum`` for large batches on real hardware."""
    ax = axis + 1 if axis >= 0 else axis
    P0 = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, ax, 0), P)
    rest = jax.tree_util.tree_leaves(P0)[0].shape[2:]

    def body(acc, p):
        return curve.add(acc, tuple(p)), None

    from ..utils.vma import match_vma

    total, _ = jax.lax.scan(body, match_vma(curve.zero(rest), P0), P0)
    return total


def _tree_sum(curve, P, axis: int):
    """Tree reduction of a point batch along one BATCH axis via curve.add."""
    axis = axis + 1 if axis >= 0 else axis
    n = jax.tree_util.tree_leaves(P)[0].shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, 0, half, axis=axis), P
        )
        hi = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, half, 2 * half, axis=axis), P
        )
        combined = curve.add(tuple(lo), tuple(hi))
        if n % 2:
            last = jax.tree_util.tree_map(
                lambda a: jax.lax.slice_in_dim(a, n - 1, n, axis=axis), P
            )
            combined = jax.tree_util.tree_map(
                lambda c_, l: jnp.concatenate([c_, l], axis=axis), combined, last
            )
            n = half + 1
        else:
            n = half
        P = combined
    return jax.tree_util.tree_map(lambda a: jnp.squeeze(a, axis=axis), P)


@functools.lru_cache(maxsize=None)
def _chunk_jit(curve, c, slot_budget=None):
    return jax.jit(lambda b, s: msm(curve, b, s, c=c,
                                    slot_budget=slot_budget))


@functools.lru_cache(maxsize=None)
def _add_jit(curve):
    return jax.jit(lambda p, q: curve.add(p, tuple(q)))


def msm_chunks(curve, bases_aff, scalars: jnp.ndarray, chunk: int = 1 << 20,
               c: int | None = None):
    """Streaming MSM over chunked inputs: device-sized chunks are MSM'd
    independently and their partial points accumulated — the reference's
    ``msm_chunks`` / ChunkedPippenger streaming mode
    (variable_base/mod.rs:54-85, stream_pippenger.rs:10-60).  Each
    partial is one Jacobian point, so checkpoint/resume costs 3 field
    elements per chunk boundary.

    Chunks run as SEPARATE jit dispatches (cached per (curve, c)): when
    the whole loop sat inside one jit, XLA's scheduler interleaved the
    independent chunk computations and kept several chunks' level-0
    buffers live at once (measured 20.8 GB at 2^22 vs one chunk's
    ~10 GB).  Under an enclosing jit the inner jits inline and behavior
    matches the traced form.
    """
    n = scalars.shape[1]
    if c is None:
        # plan on the per-chunk size (the naive default_window_size gave
        # c=15 where the measured-cost planner picks 16 — 2.5x slower
        # chunks at 2^20)
        nc = min(n, chunk)
        scalar_bits = min(16 * scalars.shape[0],
                          curve.scalar_modulus.bit_length())
        c, _ = plan_windows(scalar_bits, default_window_size(nc), nc)
    total = None
    x, y, inf = bases_aff
    # shrink the per-chunk slot budget so chunk transients + the
    # persistent base/scalar arrays fit HBM together: without this the
    # 2^24 stream ran 4.4x slower PER CHUNK than a standalone 2^20 from
    # allocation churn (BENCH_msm_r05.json)
    L = jax.tree_util.tree_leaves(x)[0].shape[0]
    persistent = n * (2 * 2 * L * 4 + scalars.shape[0] * 4 + 1)
    budget = int(max(1 << 19, (13.0e9 - persistent) / 2600))
    run = _chunk_jit(curve, c, budget)
    addj = _add_jit(curve)
    eager = not isinstance(scalars, jax.core.Tracer)
    for off in range(0, n, chunk):
        end = min(off + chunk, n)
        part = run(
            (_tree_take(x, slice(off, end)), _tree_take(y, slice(off, end)),
             inf[off:end]),
            scalars[:, off:end],
        )
        if eager:
            # fence each chunk: letting several near-HBM-capacity chunk
            # programs queue async measured 2.5x slower end-to-end
            # (allocation churn); a 16-byte fetch serializes cleanly.
            # (block_until_ready does not fence on the axon backend.)
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(part)[0].ravel()[:2]))
        total = part if total is None else addj(total, part)
    return total


def msm_mont(curve, scalar_spec: FieldSpec, bases_aff, scalars_mont, c=None):
    """MSM with Montgomery-form scalar field elements (converts to
    canonical bigints first, like the reference's msm -> msm_bigint)."""
    canonical = mont.from_mont(scalar_spec, scalars_mont)
    return msm(curve, bases_aff, canonical, c=c)
