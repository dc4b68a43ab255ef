"""Device-batched hash-to-curve equals the host golden pipeline
(which is itself validated bit-exactly against the IETF suite JSON
vectors in test_hash_to_curve.py)."""

from algebra_tpu.hashing import bls12_381 as h2c_host
from algebra_tpu.hashing.device_map import g1_hash_batch, g2_hash_batch


def test_device_g1_hash_matches_host():
    msgs = [b"", b"abc", b"abcdef0123456789"]
    x, y, inf = g1_hash_batch(msgs)
    curve_host = h2c_host.g1_hasher()
    import numpy as np

    from algebra_tpu.curves.instances import bls12_381

    curve = bls12_381.g1()
    xs = curve.base.to_int(x)
    ys = curve.base.to_int(y)
    infs = np.asarray(inf)
    got = [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]
    want = [curve_host.hash(m) for m in msgs]
    assert got == want


def test_device_g2_hash_matches_host():
    msgs = [b"", b"abc", b"abcdef0123456789"]
    x, y, inf = g2_hash_batch(msgs)
    curve_host = h2c_host.g2_hasher()
    import numpy as np

    from algebra_tpu.curves.instances import bls12_381

    curve = bls12_381.g2()
    xs = curve.base.to_int(x)
    ys = curve.base.to_int(y)
    infs = np.asarray(inf)
    got = [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]
    want = [curve_host.hash(m) for m in msgs]
    assert got == want
