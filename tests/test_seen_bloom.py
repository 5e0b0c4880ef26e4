"""Bloom shard unit behavior: no false negatives ever; fpp sane."""

import numpy as np

from eget_crawler_for_overflow_spark.operators.seen import BloomShard


def test_no_false_negatives():
    b = BloomShard(expected_n=10_000)
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, 10_000, dtype=np.int64).view(np.uint64)
    b.add(keys)
    assert b.maybe_contains(keys).all()


def test_false_positive_rate_reasonable():
    b = BloomShard(expected_n=10_000)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, 10_000, dtype=np.int64).view(np.uint64)
    b.add(keys)
    probe = (
        rng.integers(2**62, 2**63, 20_000, dtype=np.int64).view(np.uint64)
    )
    fpp = b.maybe_contains(probe).mean()
    assert fpp < 0.01  # 13 bits/key, k=7 → ~1e-3 theoretical


def test_empty_shard():
    b = BloomShard(expected_n=100)
    assert not b.maybe_contains(np.array([1, 2, 3], dtype=np.uint64)).any()
    assert b.maybe_contains(np.array([], dtype=np.uint64)).shape == (0,)
