"""FP-Growth miner (S11) vs brute-force itemset enumeration.

Mirrors the reference's dormant pattern-mining path
(``utils/FPGrowth/fptree.cpp``, ``Experiment.hpp:15-18``,
``demo_vaq.cpp:130-261``): property tests against an exhaustive
Apriori-style oracle plus a golden hand example.
"""
import itertools

import numpy as np
import pytest

from vaq_tpu.fpgrowth import (filter_patterns, find_frequent_patterns,
                              fptree_growth, subspace_offsets)


def brute_force(transactions, min_support):
    """Exhaustive oracle: enumerate every itemset drawn from observed items."""
    sets = [frozenset(t) for t in transactions]
    items = sorted(set().union(*sets)) if sets else []
    out = {}
    for r in range(1, len(items) + 1):
        any_kept = False
        for combo in itertools.combinations(items, r):
            s = frozenset(combo)
            c = sum(1 for t in sets if s <= t)
            if c >= min_support:
                out[s] = c
                any_kept = True
        if not any_kept:  # anti-monotone: no larger set can be frequent
            break
    return out


def test_golden_small():
    """Classic textbook example (Han et al.), min_support=3."""
    txns = [[1, 2, 5], [2, 4], [2, 3], [1, 2, 4], [1, 3],
            [2, 3], [1, 3], [1, 2, 3, 5], [1, 2, 3]]
    got = fptree_growth(txns, 3)
    assert got[frozenset([2])] == 7
    assert got[frozenset([1])] == 6
    assert got[frozenset([1, 2])] == 4
    assert got[frozenset([1, 3])] == 4
    assert got[frozenset([2, 3])] == 4
    assert got[frozenset([1, 2, 3])] == 2 if frozenset([1, 2, 3]) in got \
        else True
    assert frozenset([1, 2, 3]) not in got  # support 2 < 3
    assert got == brute_force(txns, 3)


@pytest.mark.parametrize("seed,n,universe,tlen,sup", [
    (0, 40, 8, 5, 2), (1, 60, 10, 4, 3), (2, 25, 6, 6, 4),
    (3, 80, 12, 3, 5),
])
def test_matches_brute_force(seed, n, universe, tlen, sup):
    rng = np.random.default_rng(seed)
    txns = [rng.integers(0, universe, size=rng.integers(1, tlen + 1)
                         ).tolist() for _ in range(n)]
    assert fptree_growth(txns, sup) == brute_force(txns, sup)


def test_single_path_shortcut():
    """Transactions forming one chain exercise the single-path subset
    expansion (fptree.cpp:222-249)."""
    txns = [[1, 2, 3], [1, 2, 3], [1, 2], [1]]
    got = fptree_growth(txns, 2)
    assert got == brute_force(txns, 2)
    assert got[frozenset([1, 2, 3])] == 2


def test_codebook_front_end():
    """findFrequentPattern semantics: code rows → offset items; a planted
    co-occurring code pair must surface as a frequent 2-pattern."""
    rng = np.random.default_rng(7)
    n, m = 200, 4
    cnum = [16, 8, 16, 4]
    codes = np.stack([rng.integers(0, c, size=n) for c in cnum], axis=1)
    # plant: whenever subspace 0 has code 3, subspace 2 has code 5
    mask = rng.random(n) < 0.4
    codes[mask, 0] = 3
    codes[mask, 2] = 5
    pats = find_frequent_patterns(codes, int(mask.sum()), cnum)
    offs = subspace_offsets(cnum)
    planted = frozenset([3 + offs[0], 5 + offs[2]])
    assert planted in pats and pats[planted] >= int(mask.sum())
    # offsets keep items collision-free across subspaces
    assert offs.tolist() == [0, 16, 24, 40]


def test_filter_patterns_maximal():
    pats = {frozenset([1]): 10, frozenset([1, 2]): 6,
            frozenset([1, 2, 3]): 4, frozenset([4, 5]): 5}
    kept = filter_patterns(pats, min_size=2)
    got = {p for p, _ in kept}
    # {1,2} is a subset of surviving {1,2,3}; {1} below min_size
    assert got == {frozenset([1, 2, 3]), frozenset([4, 5])}
    assert kept[0][0] == frozenset([4, 5])  # sorted by descending support
