"""Token-bucket refill math vs reference Bucket semantics (O2)."""

import numpy as np

from pyspider_spark.kernels.bucket import refill, refill_scalar


def test_refill_caps_at_burst():
    assert refill_scalar(0.0, 0.0, 1000.0, rate=1.0, burst=10.0) == 10.0


def test_refill_linear_below_burst():
    assert refill_scalar(2.0, 100.0, 103.0, rate=1.0, burst=10.0) == 5.0
    assert refill_scalar(0.0, 0.0, 2.5, rate=2.0, burst=10.0) == 5.0


def test_refill_no_negative_dt():
    # clock never goes backwards on the logical clock, but be safe
    assert refill_scalar(3.0, 10.0, 5.0, rate=1.0, burst=10.0) == 3.0


def test_refill_vectorized_matches_scalar():
    tokens = np.array([0.0, 2.0, 9.5])
    last = np.array([0.0, 0.0, 0.0])
    out = refill(tokens, last, 3.0, rate=1.0, burst=10.0)
    expect = [refill_scalar(t, l, 3.0, 1.0, 10.0) for t, l in zip(tokens, last)]
    assert np.allclose(out, expect)
