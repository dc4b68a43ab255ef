"""Every Pallas kernel executed on CPU through the Pallas interpreter,
asserted bit-identical to the pure-jnp path.

This is the CI obligation the reference discharges for its asm backend
(a dedicated `-C target-cpu=native` job runs the same test suite through
the x86_64 assembly path, .github/workflows/ci.yml): the fast path must
be exercised off the special hardware.  Round 3's history shows the
cost of skipping it — a Mosaic compile bug silently blocked every fused
kernel on TPU for a full round while the CPU suite passed on the jnp
fallback.

Covered kernels:
  mont_pallas: _mul_kernel, _butterfly_kernel (both twiddle layouts),
               _prefix/_backward/_fermat (via batch_inverse — also in
               test_batch_inverse.py; repeated here per-spec)
  sw_pallas:   _madd_kernel, _add_kernel, _aff_denom/_aff_post (both
               with and without the neg-mask operands)
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from algebra_tpu import config
from algebra_tpu.bigint import batch_int_to_limbs
from algebra_tpu.curves.instances import bls12_381, mnt4_753
from algebra_tpu.ops import mont, mont_pallas, sw_pallas

SPECS = [
    pytest.param(bls12_381.fr_spec, id="bls12_381.Fr-16limb"),
    pytest.param(bls12_381.fq_spec, id="bls12_381.Fq-24limb"),
    pytest.param(mnt4_753.fq_spec, id="mnt4_753.Fq-48limb"),
]


@pytest.fixture
def interpret():
    """Run the body with Pallas interpret mode ON (kernels execute via
    the interpreter on CPU), restoring the flag afterwards."""
    config.pallas_interpret = True
    try:
        yield
    finally:
        config.pallas_interpret = False


def _rand_elems(spec, n, seed):
    rng = random.Random(seed)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    return vals, jnp.asarray(batch_int_to_limbs(vals, spec.n_limbs))


@pytest.mark.parametrize("spec", SPECS)
def test_mul_kernel_interpret(spec, interpret):
    n = 130  # pad path: 130 -> 256 lanes
    _, a = _rand_elems(spec, n, 101)
    _, b = _rand_elems(spec, n, 202)
    got = mont_pallas.mul(spec, a, b, block=128)
    ref = mont.mul(spec, a, b)
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.parametrize("spec", SPECS)
def test_square_kernel_interpret(spec, interpret):
    """_lm_sq (upper-triangle squaring) via the Fermat ladder is checked
    in batch_inverse below; here check mul(a, a) == square directly."""
    _, a = _rand_elems(spec, 128, 303)
    got = mont_pallas.mul(spec, a, a, block=128)
    ref = mont.square(spec, a)
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.parametrize("spec", SPECS)
def test_batch_inverse_interpret(spec, interpret):
    vals, a = _rand_elems(spec, 140, 404)
    a = a.at[:, 7].set(0)  # zero lane -> zero
    got = mont_pallas.batch_inverse(spec, a)
    ref = mont.inv(spec, a)
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.parametrize("half", [32, 128, 256])
def test_butterfly_kernel_interpret(half, interpret):
    """Both twiddle layouts: half < block (in-kernel tiling) and
    half >= block (blocked twiddles)."""
    spec = bls12_381.fr_spec
    n_half = 256
    _, lo = _rand_elems(spec, n_half, 505)
    _, hi = _rand_elems(spec, n_half, 606)
    _, w = _rand_elems(spec, half, 707)
    got_lo, got_hi = mont_pallas.butterfly_stage(spec, lo, hi, w, block=128)
    w_full = jnp.tile(w, (1, n_half // half))
    t = mont.mul(spec, hi, w_full)
    ref_lo = mont.add(spec, lo, t)
    ref_hi = mont.sub(spec, lo, t)
    assert (np.asarray(got_lo) == np.asarray(ref_lo)).all()
    assert (np.asarray(got_hi) == np.asarray(ref_hi)).all()


# ---------------------------------------------------------------- curves


def _point_batch(curve, n, seed, with_inf=True):
    """Affine batch (x, y, inf) with an infinity lane and a duplicate
    pair (exceptional-case coverage)."""
    rng = random.Random(seed)
    pts = curve.random_host(rng, n)
    aff = curve.from_host(pts)
    if with_inf:
        # lane 3: infinity
        x, y, inf = aff
        inf = inf.at[3].set(True)
        aff = (x, y, inf)
    return aff


def test_madd_kernel_interpret(interpret):
    curve = bls12_381.g1()
    spec = curve.base.spec
    n = 128
    P = curve.from_affine(_point_batch(curve, n, 808))
    aff = _point_batch(curve, n, 909)
    # exceptional lanes: Q == P (doubling path) at lane 5
    x2, y2, inf2 = aff
    Pa = curve.to_affine(P)
    x2 = x2.at[:, 5].set(Pa[0][:, 5])
    y2 = y2.at[:, 5].set(Pa[1][:, 5])
    aff = (x2, y2, inf2)
    got = sw_pallas.madd(spec, P, aff)
    ref = curve.add_mixed(P, aff)  # jnp path (pallas disabled on CPU)
    for g, r in zip(got, ref):
        assert (np.asarray(g) == np.asarray(r)).all()


def test_double_kernel_interpret(interpret):
    curve = bls12_381.g1()
    spec = curve.base.spec
    n = 128
    P = curve.from_affine(_point_batch(curve, n, 555))
    # infinity lane: from_affine maps inf to z == 0
    got = sw_pallas.double(spec, P)
    ref = curve.double(P)
    for g, r in zip(got, ref):
        assert (np.asarray(g) == np.asarray(r)).all()


def test_add_kernel_interpret(interpret):
    curve = bls12_381.g1()
    spec = curve.base.spec
    n = 128
    P = curve.from_affine(_point_batch(curve, n, 111))
    Q = curve.from_affine(_point_batch(curve, n, 222))
    # doubling lane
    Q = curve.select(jnp.arange(n) == 5, P, Q)
    got = sw_pallas.add(spec, P, Q)
    ref = curve.add(P, Q)
    for g, r in zip(got, ref):
        assert (np.asarray(g) == np.asarray(r)).all()


@pytest.mark.parametrize("with_neg", [False, True])
def test_affine_add_kernels_interpret(with_neg, interpret):
    curve = bls12_381.g1()
    spec = curve.base.spec
    n = 128
    P = _point_batch(curve, n, 333)
    Q = _point_batch(curve, n, 444)
    # tangent lane (P == Q), opposite lane (P == -Q)
    x2, y2, i2 = Q
    x2 = x2.at[:, 5].set(P[0][:, 5])
    y2 = y2.at[:, 5].set(P[1][:, 5])
    x2 = x2.at[:, 6].set(P[0][:, 6])
    y2 = y2.at[:, 6].set(curve.affine_neg((P[0], P[1], P[2]))[1][:, 6])
    Q = (x2, y2, i2)
    neg1 = neg2 = None
    if with_neg:
        rng = np.random.default_rng(777)
        neg1 = jnp.asarray(rng.integers(0, 2, n).astype(bool))
        neg2 = jnp.asarray(rng.integers(0, 2, n).astype(bool))

    def inv_fn(v):
        return mont.inv(spec, v)

    got = sw_pallas.affine_add(spec, None, P, Q, inv_fn,
                               neg1=neg1, neg2=neg2, block=128)
    ref = curve.affine_add(P, Q, inv_fn, neg1=neg1, neg2=neg2)
    for g, r in zip(got, ref):
        assert (np.asarray(g) == np.asarray(r)).all()


@pytest.mark.parametrize("spec", SPECS)
def test_row_pack_unpack_interpret(spec, interpret):
    """rows_pallas pack/unpack/negate_y kernels vs their jnp fallbacks."""
    from algebra_tpu.ops import rows_pallas

    n = 130
    _, x = _rand_elems(spec, n, 661)
    _, y = _rand_elems(spec, n, 662)
    inf = jnp.asarray(np.arange(n) % 7 == 3)
    rows = rows_pallas.pack(spec, x, y, inf, block=128)
    config.pallas_interpret = False  # jnp fallback as oracle
    try:
        ref = rows_pallas.pack(spec, x, y, inf)
    finally:
        config.pallas_interpret = True
    assert (np.asarray(rows) == np.asarray(ref)).all()

    gx, gy, ginf = rows_pallas.unpack(spec, rows, block=128)
    assert (np.asarray(gx) == np.asarray(x)).all()
    assert (np.asarray(gy) == np.asarray(y)).all()
    assert (np.asarray(ginf) == np.asarray(inf)).all()

    neg = jnp.asarray(np.arange(n) % 3 == 1)
    got = rows_pallas.negate_y(spec, rows, neg, block=128)
    config.pallas_interpret = False
    try:
        ref = rows_pallas.negate_y(spec, rows, neg)
    finally:
        config.pallas_interpret = True
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_affine_add_rows_interpret(interpret):
    """Packed-row halving-level kernels (_affr_denom/_affr_post) and the
    unit-DMA expansion kernel vs their composed/jnp oracles."""
    import random as _random

    import jax.numpy as jnp

    from algebra_tpu.curves.instances import bls12_381
    from algebra_tpu.ops import msm as msm_mod, rows_pallas, sw_pallas

    curve = bls12_381.g1()
    spec = curve.base.spec
    rng = _random.Random(3)
    n = 256
    pts = curve.random_host(rng, 64)
    lst = []
    for _ in range(n):
        r = rng.random()
        if r < 0.1:
            lst.append(None)          # infinity lanes
        elif r < 0.25:
            lst.append(pts[3])        # duplicates -> tangent adds
        else:
            lst.append(pts[rng.randrange(64)])
    aff = curve.from_host(lst)
    V = rows_pallas.pack(spec, aff[0], aff[1], aff[2])
    valid = jnp.asarray(np.asarray(
        [rng.random() > 0.2 for _ in range(n)]))
    inv_fn = msm_mod._batched_inv_fn(curve.base)

    out_rows = sw_pallas.affine_add_rows(spec, None, V, valid, inv_fn)
    gx, gy, gi = rows_pallas.unpack(spec, out_rows)

    Pl = rows_pallas.unpack(spec, V[0::2])
    Pr = rows_pallas.unpack(spec, V[1::2])
    Pl = (Pl[0], Pl[1], jnp.logical_or(Pl[2], jnp.logical_not(valid[0::2])))
    Pr = (Pr[0], Pr[1], jnp.logical_or(Pr[2], jnp.logical_not(valid[1::2])))
    wx, wy, wi = curve.affine_add(Pl, Pr, inv_fn)
    assert np.array_equal(np.asarray(gx), np.asarray(wx))
    assert np.array_equal(np.asarray(gy), np.asarray(wy))
    assert np.array_equal(np.asarray(gi), np.asarray(wi))

    # no-valid variant (later levels)
    out2 = sw_pallas.affine_add_rows(spec, None, V, None, inv_fn)
    Pl2 = rows_pallas.unpack(spec, V[0::2])
    Pr2 = rows_pallas.unpack(spec, V[1::2])
    w2 = curve.affine_add(Pl2, Pr2, inv_fn)
    g2 = rows_pallas.unpack(spec, out2)
    for got, want in zip(g2, w2):
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_expand_units_interpret(interpret):
    """rows_pallas.expand_units DMA kernel vs the jnp composed gather."""
    from algebra_tpu.ops import rows_pallas

    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.integers(0, 2**32, (3000, 128), dtype=np.uint32))
    U = 8
    us = jnp.asarray(rng.integers(0, 3000 - U, (1500,), dtype=np.int32))
    got = rows_pallas.expand_units(src, us, U)
    idx = (np.asarray(us)[:, None] + np.arange(U)[None, :]).reshape(-1)
    assert np.array_equal(np.asarray(got), np.asarray(src)[idx])
