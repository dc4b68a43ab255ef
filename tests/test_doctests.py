"""Run the executable API examples (algebra_tpu/examples.py) under
doctest — the reference's doc-test CI parity (its examples compile and
run in `cargo test`; ours run here)."""

import doctest

import algebra_tpu.examples


def test_api_examples():
    res = doctest.testmod(algebra_tpu.examples, verbose=False)
    assert res.attempted > 15
    assert res.failed == 0
