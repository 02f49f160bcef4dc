"""Taxonomy side-car (index/taxonomy.py): ordinal stability across
commits, parents-before-children, rollup == brute recount, deterministic
assignment under permuted input order."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.index.taxonomy import TaxonomyReader, TaxonomyWriter, load_taxonomy


def test_ordinals_are_forever(tmp_path):
    p = str(tmp_path / "tax.json")
    w = TaxonomyWriter(p)
    first = w.add_categories(["py/github", "py/gitlab", "go/github"])
    w.commit()
    # a later writer adds more categories: existing ordinals unchanged
    w2 = TaxonomyWriter(p)
    second = w2.add_categories(["rs/crates", "py/github"])
    w2.commit()
    r = load_taxonomy(p)
    for path, o in first.items():
        assert r.ordinal(path) == o
    assert second["py/github"] == first["py/github"]
    assert r.ordinal("rs/crates") > max(first.values())


def test_parents_precede_children_and_prefixes_exist(tmp_path):
    w = TaxonomyWriter(str(tmp_path / "t.json"))
    w.add_categories(["a/b/c", "a/x", "q/r"])
    r = w.reader()
    assert r.ordinal("") == 0 and r.parents[0] == -1
    for path in ("a", "a/b", "a/b/c", "a/x", "q", "q/r"):
        o = r.ordinal(path)
        assert o > 0
        parent = path.rsplit("/", 1)[0] if "/" in path else ""
        assert r.parents[o] == r.ordinal(parent) < o


def test_assignment_deterministic_under_permutation(tmp_path):
    paths = [f"l{i % 5}/s{i}" for i in range(40)]
    w1 = TaxonomyWriter(str(tmp_path / "t1.json"))
    w1.add_categories(paths)
    rng = np.random.default_rng(3)
    w2 = TaxonomyWriter(str(tmp_path / "t2.json"))
    w2.add_categories([paths[i] for i in rng.permutation(len(paths))])
    assert w1.paths == w2.paths and w1.parents == w2.parents


def test_rollup_matches_brute_recount(tmp_path):
    w = TaxonomyWriter(str(tmp_path / "t.json"))
    leaf_paths = [f"l{a}/s{b}" for a in range(4) for b in range(6)]
    w.add_categories(leaf_paths)
    r = w.reader()
    rng = np.random.default_rng(11)
    docs = rng.integers(0, len(leaf_paths), size=5000)
    counts = np.zeros(len(r), np.int64)
    for d in docs:
        counts[r.ordinal(leaf_paths[d])] += 1
    rolled = r.rollup(counts)
    # parent counts == sum over the children; root == total
    for a in range(4):
        want = sum(
            int((docs == i).sum())
            for i, p in enumerate(leaf_paths)
            if p.startswith(f"l{a}/")
        )
        assert rolled[r.ordinal(f"l{a}")] == want
    assert rolled[0] == len(docs)


def test_missing_label_raises(tmp_path):
    r = TaxonomyReader(["", "a"], np.array([-1, 0]))
    assert r.ordinal("nope") == -1
    with pytest.raises(IndexError):
        r.path(99)
