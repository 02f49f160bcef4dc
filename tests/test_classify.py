"""SimpleNaiveBayesClassifier analogue: distributed training over segments,
planted separable classes, brute log-likelihood differential."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index_local
from lucene_ray.search.classify import NaiveBayesClassifier

SPORT = ["match", "team", "goal", "score", "league", "coach", "season", "win"]
TECH = ["server", "query", "index", "cache", "deploy", "cluster", "shard", "bug"]


@pytest.fixture(scope="module")
def labeled_idx(tmp_path_factory, ray_session):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(200):
        lab = "sport" if i % 2 == 0 else "tech"
        vocab = SPORT if lab == "sport" else TECH
        # 80% class words, 20% shared noise
        words = [
            vocab[rng.integers(0, len(vocab))] if rng.random() < 0.8 else "common"
            for _ in range(30)
        ]
        rows.append(
            {"repo": "r", "path": f"p{i}", "commit": "c", "lang": lab,
             "content": " ".join(words)}
        )
    d = tmp_path_factory.mktemp("nb_corpus")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "c.parquet"), row_group_size=50)
    out = str(tmp_path_factory.mktemp("nb_idx"))
    build_index_local(str(d), out, docs_per_segment=60)
    return out, str(d / "c.parquet")


def test_nb_classifies_planted(labeled_idx):
    clf = NaiveBayesClassifier(labeled_idx[0], "lang")
    assert clf.assign_class("the team scored a goal this season")[0] == "sport"
    assert clf.assign_class("deploy the index to the query cluster")[0] == "tech"
    # held-out accuracy on fresh samples
    rng = np.random.default_rng(7)
    correct = 0
    for i in range(40):
        lab = "sport" if i % 2 == 0 else "tech"
        vocab = SPORT if lab == "sport" else TECH
        text = " ".join(vocab[rng.integers(0, len(vocab))] for _ in range(15))
        correct += clf.assign_class(text)[0] == lab
    assert correct >= 38


def test_nb_matches_brute_loglikelihood(labeled_idx):
    """The distributed training must reproduce the exact closed-form
    log-likelihood from a driver-side recount."""
    import duckdb

    idx, corpus = labeled_idx
    clf = NaiveBayesClassifier(idx, "lang")
    # brute model from the source corpus (content is not a stored field;
    # the index stores its sha256)
    tbl = pq.read_table(corpus)
    texts = tbl.column("content").to_pylist()
    labels = tbl.column("lang").to_pylist()
    from collections import Counter, defaultdict

    tfs = defaultdict(Counter)
    dc = Counter(labels)
    vocab = set()
    for t, lab in zip(texts, labels):
        toks = clf.analyzer.tokens(t)
        tfs[lab].update(toks)
        vocab.update(toks)
    probe = "team goal deploy common"
    toks = clf.analyzer.tokens(probe)
    want = {}
    for c in sorted(dc):
        ll = np.log(dc[c] / len(labels))
        denom = sum(tfs[c].values()) + len(vocab)
        for w in toks:
            ll += np.log((tfs[c][w] + 1) / denom)
        want[c] = ll
    got_c, got_ll = clf.assign_class(probe)
    best = max(want, key=want.get)
    assert got_c == best
    assert np.isclose(got_ll, want[best], rtol=1e-12)


def test_knn_classifier_majority(labeled_idx):
    """kNN vote semantics on the separable corpus: planted phrases
    classify to their class, the vote score is votes/k, and stored-doc
    texts classify as their own label."""
    from lucene_ray.search.classify import KNNClassifier

    idx, src = labeled_idx
    clf = KNNClassifier(idx, "lang", k=7)
    got, score = clf.assign_class("the team scored a goal this season")
    assert got == "sport" and 0 < score <= 1.0
    got, score = clf.assign_class("deploy the index to the query cluster")
    assert got == "tech" and 0 < score <= 1.0
    # self-classification over stored docs
    t = pq.read_table(src, columns=["lang", "content"])
    right = 0
    rows = list(zip(t.column("lang").to_pylist(), t.column("content").to_pylist()))
    for lab, text in rows[:30]:
        got, _ = clf.assign_class(text)
        right += got == lab
    assert right >= 27
