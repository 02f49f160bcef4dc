"""NGramPhraseQuery rewrite (core/search/NGramPhraseQuery.java): the
sparse phrase (every n-th gram + the last) matches the same docs with
the same frequencies as the full consecutive-gram phrase."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index_local
from lucene_ray.search.multiterm import (
    ngram_phrase_rewrite,
    phrase_matches_segment,
    positional_phrase_matches_segment,
)
from lucene_ray.search.searcher import IndexSearcher


def _grams(word, n=2):
    return [word[i : i + n] for i in range(len(word) - n + 1)]


@pytest.fixture()
def gram_idx(tmp_path):
    # docs whose whitespace tokens ARE character bigrams at consecutive
    # positions — the NGramTokenizer field shape the query assumes
    words = ["searching", "searcher", "research", "archery", "chartreuse",
             "searching", "parched"]
    rows = [
        {"id": str(i), "text": " ".join(_grams(w))} for i, w in enumerate(words)
    ]
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "c.parquet"))
    out = str(tmp_path / "idx")
    build_index_local(
        str(d), out, docs_per_segment=3, content_column="text",
        meta_columns=("id",), index_options="positions",
    )
    return out


def test_rewrite_rule_matches_reference():
    assert ngram_phrase_rewrite(("ab", "bc", "cd", "de", "ef"), 2) == (
        ("ab", "cd", "ef"), (0, 2, 4),
    )
    assert ngram_phrase_rewrite(("ab", "bc", "cd", "de"), 2) == (
        ("ab", "cd", "de"), (0, 2, 3),
    )
    # n < 2 or fewer than 3 terms: not optimizable (reference :52-55)
    assert ngram_phrase_rewrite(("ab", "bc"), 2) == (("ab", "bc"), (0, 1))
    assert ngram_phrase_rewrite(("a", "b", "c"), 1) == (
        ("a", "b", "c"), (0, 1, 2),
    )


@pytest.mark.parametrize("query", ["search", "arch", "earch", "chart"])
def test_optimized_equals_full_phrase(gram_idx, query):
    s = IndexSearcher(gram_idx)
    full = tuple(_grams(query))
    sparse, positions = ngram_phrase_rewrite(full, 2)
    assert len(sparse) < len(full) or len(full) < 3
    for reader in s.readers:
        d1, f1 = phrase_matches_segment(reader, full)
        d2, f2 = positional_phrase_matches_segment(reader, sparse, positions)
        assert np.array_equal(d1, d2) and np.array_equal(f1, f2), query


def test_sparse_phrase_decodes_fewer_terms(gram_idx):
    full = tuple(_grams("searching"))          # 8 grams
    sparse, _ = ngram_phrase_rewrite(full, 2)  # 0,2,4,6,7 -> 5 grams
    assert len(sparse) == 5
