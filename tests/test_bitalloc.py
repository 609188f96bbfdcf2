"""Property + golden tests for the exact bit-allocation ILP solver
(replacing GLPK, reference VAQ.cpp:338-524)."""

import numpy as np
import pytest

from vaq_tpu.bitalloc import (allocate_bits, fixup_under_budget, next_pow2,
                              smoothness_bounds)


def test_next_pow2():
    # 2^floor(log2 |x|), 0 at 0 (Math.hpp:183-188).
    assert next_pow2(0) == 0
    assert next_pow2(1.0) == 1
    assert next_pow2(1.9) == 1
    assert next_pow2(2.0) == 2
    assert next_pow2(7.9) == 4
    assert next_pow2(8.0) == 8
    assert next_pow2(0.6) == 0  # 2^-1 → int() → 0


def test_smoothness_bounds():
    v = np.array([8.0, 4.0, 4.0, 1.0])
    ks = smoothness_bounds(v)
    assert list(ks) == [2, 1, 4]


def _check_valid(bits, v, budget, min_bits, max_bits, pct=1.0):
    cum = np.cumsum(v)
    lbs = np.where(cum <= pct, min_bits, 0)
    ks = smoothness_bounds(v)
    assert bits.sum() == budget
    assert np.all(bits <= max_bits)
    assert np.all(bits >= lbs)
    assert np.all(bits[:-1] - bits[1:] <= ks)


def test_uniform_variance_gives_uniform_bits():
    v = np.full(8, 1 / 8)
    bits = allocate_bits(v, 32, 0, 8)
    _check_valid(bits, v, 32, 0, 8)
    # With uniform variance any split is optimal but the smoothness chain
    # (k_i = 1) keeps it near-uniform.
    assert bits.max() - bits.min() <= 2


def test_skewed_variance_front_loads_bits():
    v = np.array([0.5, 0.25, 0.12, 0.06, 0.03, 0.02, 0.01, 0.01])
    v = v / v.sum()
    bits = allocate_bits(v, 24, 0, 8)
    _check_valid(bits, v, 24, 0, 8)
    assert bits[0] >= bits[-1]
    # Objective should beat uniform allocation.
    uniform = np.full(8, 3)
    assert (v * bits).sum() >= (v * uniform).sum() - 1e-12


def test_exactness_vs_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(20):
        m = rng.integers(3, 6)
        v = np.sort(rng.random(m))[::-1]
        v = v / v.sum()
        budget = int(rng.integers(m, m * 4))
        max_bits = 4
        min_bits = int(rng.integers(0, 2))
        ks = smoothness_bounds(v)
        lbs = np.where(np.cumsum(v) <= 1.0, min_bits, 0)

        # brute force over all assignments
        best = -np.inf
        feasible = False
        import itertools
        for x in itertools.product(range(max_bits + 1), repeat=m):
            x = np.array(x)
            if x.sum() != budget:
                continue
            if np.any(x < lbs) or np.any(x[:-1] - x[1:] > ks):
                continue
            feasible = True
            best = max(best, (v * x).sum())
        if not feasible:
            with pytest.raises(ValueError):
                allocate_bits(v, budget, min_bits, max_bits)
            continue
        bits = allocate_bits(v, budget, min_bits, max_bits)
        _check_valid(bits, v, budget, min_bits, max_bits)
        assert (v * bits).sum() == pytest.approx(best, abs=1e-9)


def test_run_demos_shape():
    # min7max8 over 32 subspaces with a 256-bit budget: forced to 8 bits each.
    v = np.sort(np.random.default_rng(1).random(32))[::-1]
    v = v / v.sum()
    bits = allocate_bits(v, 256, 7, 8)
    assert bits.sum() == 256
    assert np.all((bits >= 7) & (bits <= 8))


def test_infeasible_budget():
    v = np.full(4, 0.25)
    with pytest.raises(ValueError):
        allocate_bits(v, 40, 0, 8)   # 40 > 4*8


def test_fixup_under_budget():
    bits = np.array([4, 4, 0, 0])
    out = fixup_under_budget(bits, 10, 8)
    assert out.sum() >= 10
