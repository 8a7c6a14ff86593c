"""Bloom/cuckoo seen-set property tests (SURVEY.md §5.5, J1/A7)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aspseek_spark.functions.hashing import (
    CuckooFilter,
    bloom_fill_ratio,
    bloom_set,
    bloom_test,
    empty_bloom,
    hash_bases,
)

M, K = 1 << 16, 5


def _set(bits, keys):
    h1, h2 = hash_bases(keys)
    return bloom_set(bits, h1, h2, M, K)


def _probe(bits, keys):
    h1, h2 = hash_bases(keys)
    return bloom_test(bits, h1, h2, M, K)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=50), max_size=200))
def test_bloom_no_false_negatives(keys):
    bits = empty_bloom(M)
    _set(bits, keys)
    if keys:
        assert _probe(bits, keys).all()


def test_bloom_no_false_negatives_int64_bases():
    """The engine feeds JVM xxhash64 bases (signed int64, often negative);
    the uint64 reinterpret + odd-step must preserve no-false-negatives."""
    rng = np.random.default_rng(7)
    h1 = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    h2 = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    bits = empty_bloom(M)
    bloom_set(bits, h1, h2, M, K)
    assert bloom_test(bits, h1, h2, M, K).all()


def test_bloom_fpp_within_budget():
    bits = empty_bloom(M)
    ins = [f"http://h{i}.test/p{i}" for i in range(1000)]
    _set(bits, ins)
    probe = [f"http://x{i}.test/q{i}" for i in range(20000)]
    fpp = _probe(bits, probe).mean()
    # m/n=65.5 bits/key, k=5 → theoretical fpp ≈ 3e-5; allow slack
    assert fpp < 0.005, fpp
    assert 0.0 < bloom_fill_ratio(bits) < 0.2


def test_bloom_or_merge_equals_joint_build():
    a, b = empty_bloom(M), empty_bloom(M)
    k1 = [f"u{i}" for i in range(100)]
    k2 = [f"v{i}" for i in range(100)]
    _set(a, k1)
    _set(b, k2)
    merged = a | b
    joint = empty_bloom(M)
    _set(joint, k1 + k2)
    assert np.array_equal(merged, joint)


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(2048)
    keys = [f"http://h{i}.test/p{i}" for i in range(2000)]
    assert all(cf.insert(k) for k in keys)
    assert all(cf.contains(k) for k in keys)
    for k in keys[:500]:
        assert cf.delete(k)
    # deleted keys are (probabilistically) gone; remaining keys must stay
    assert all(cf.contains(k) for k in keys[500:])
    fp = sum(cf.contains(f"zz{i}") for i in range(5000)) / 5000
    assert fp < 0.01


def test_cuckoo_roundtrip_bytes():
    cf = CuckooFilter(256)
    for i in range(100):
        cf.insert(f"k{i}")
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), 256)
    assert all(cf2.contains(f"k{i}") for i in range(100))
