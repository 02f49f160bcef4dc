"""WFSTCompletion (suggest/fst/WFSTCompletionLookup.java topology):
brute-force parity + best-first pruning bound."""

import numpy as np

from lucene_ray.search.suggest import WFSTCompletion


def _vocab(n=30000, seed=5):
    rng = np.random.default_rng(seed)
    words = set()
    for _ in range(n):
        words.add(
            "".join("abcdefgh"[i] for i in rng.integers(0, 8, rng.integers(2, 12)))
        )
    words = sorted(words)
    return words, [int(rng.integers(0, 10_000)) for _ in words]


def test_topn_matches_brute_force():
    words, weights = _vocab()
    fst = WFSTCompletion(words, weights)
    wmap = dict(zip(words, weights))
    for p in ["a", "ab", "abc", "b", "cd", "", "hgf", "zz", "abcd"]:
        brute = sorted(
            ((w, t) for t, w in wmap.items() if t.startswith(p)),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        assert fst.top_n(p, 10)[0] == [(t, w) for w, t in brute], p


def test_best_first_pruning_bound():
    words, weights = _vocab()
    fst = WFSTCompletion(words, weights)
    subtree = sum(1 for t in words if t.startswith("a"))
    _, expanded = fst.top_n("a", 5)
    # max-weight pushing must explore a tiny fraction of the subtree
    assert expanded < subtree / 20, (expanded, subtree)


def test_ties_break_lexicographically():
    fst = WFSTCompletion(["aa", "ab", "b", "aac"], [5, 5, 5, 9])
    got, _ = fst.top_n("", 4)
    assert got == [("aac", 9), ("aa", 5), ("ab", 5), ("b", 5)]


def test_missing_prefix_and_exact_terminal():
    fst = WFSTCompletion(["car", "cart"], [3, 7])
    assert fst.top_n("carx", 5) == ([], 0)
    assert fst.top_n("cart", 5)[0] == [("cart", 7)]
    assert fst.top_n("car", 5)[0] == [("cart", 7), ("car", 3)]
