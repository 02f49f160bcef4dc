"""ray-lucene: Ray-Data-native inverted-index build + BM25 query engine.

Public API (see README.md):

    from lucene_ray import build_index, IndexSearcher, DistributedSearcher
    from lucene_ray.search.query import TermQuery, PhraseQuery, bool_query
    from lucene_ray.search.parser import parse_query

    manifest = build_index("corpus_dir/", "/tmp/idx")
    hits = IndexSearcher("/tmp/idx").search(TermQuery("spark"), 10)
"""

from .index.build import build_index, build_index_local
from .index.check import check_index
from .index.merge import force_merge, maybe_merge
from .search.searcher import DistributedSearcher, IndexSearcher

__all__ = [
    "build_index",
    "build_index_local",
    "check_index",
    "force_merge",
    "maybe_merge",
    "IndexSearcher",
    "DistributedSearcher",
]
