"""LargeNumHitsTopDocsCollector (misc/search): list-then-queue
accumulation equals TopScoreDocCollector results; strict-greater
admission; the populateResults pop quirk."""
import numpy as np
import pytest

from lucene_ray.pipelines.fulltext import ensure_index
from lucene_ray.search.collector import LargeNumHitsTopDocsCollector
from lucene_ray.search.query import PhraseQuery, TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


def _all_hits(searcher, query):
    """(doc, score) for EVERY match in doc order (COMPLETE, k=maxDoc)."""
    n = sum(r.max_doc for r in searcher.readers)
    hits = searcher.search(query, n, score_mode="COMPLETE")
    return sorted(hits)  # doc order, the order a Collector sees


@pytest.mark.parametrize("k", [3, 10, 50])
def test_matches_top_score_doc_collector(ray_session, k):
    s = IndexSearcher(ensure_index(SF, index_options="positions"))
    for q in (
        TermQuery("join"),
        bool_query(should=[TermQuery("spark"), TermQuery("window")]),
        PhraseQuery(("the", "customer")),
    ):
        stream = _all_hits(s, q)
        c = LargeNumHitsTopDocsCollector(k)
        c.collect_batch([d for d, _ in stream], [float(x) for _, x in stream])
        got = c.top_docs(min(k, c.total_hits))
        want = s.search(q, k, score_mode="COMPLETE")
        assert [d for d, _ in got] == [d for d, _ in want]
        assert [f"{x:.6g}" for _, x in got] == [f"{float(x):.6g}" for _, x in want]
        assert c.total_hits == len(stream)


def test_list_path_below_requested():
    c = LargeNumHitsTopDocsCollector(10)
    for d, sc in [(5, 1.0), (2, 2.0), (9, 2.0), (1, 0.5)]:
        c.collect(d, sc)
    assert c.heap is None  # queue never built
    assert c.top_docs(4) == [(2, 2.0), (9, 2.0), (5, 1.0), (1, 0.5)]


def test_strict_greater_admission_and_tie_policy():
    c = LargeNumHitsTopDocsCollector(2)
    c.collect(1, 1.0)
    c.collect(2, 2.0)          # queue builds here-ish (on 3rd hit path)
    c.collect(3, 1.0)          # equal to worst kept -> NOT admitted
    assert [d for d, _ in c.top_docs(2)] == [2, 1]
    c.collect(4, 1.5)          # strictly above worst -> replaces doc 1
    assert [d for d, _ in c.top_docs(2)] == [2, 4]
    assert c.total_hits == 4


def test_populate_results_pop_quirk():
    # howMany < requested with the queue built: the reference pops the
    # WORST howMany, best-of-those first
    c = LargeNumHitsTopDocsCollector(3)
    for d, sc in [(1, 3.0), (2, 2.0), (3, 1.0), (4, 4.0)]:
        c.collect(d, sc)       # kept: {1:3.0, 2:2.0->replaced? no: 4>1.0 replaces doc3}
    # kept queue = {3.0@1, 2.0@2, 4.0@4}; worst two = 2.0@2, 3.0@1
    assert c.top_docs(2) == [(1, 3.0), (2, 2.0)]
    with pytest.raises(ValueError):
        c.top_docs(0)
    with pytest.raises(ValueError):
        c.top_docs(99)


def test_caching_collector_replays_identically():
    import numpy as np

    from lucene_ray.search.collector import CachingCollector, TopKCollector

    rng = np.random.default_rng(4)
    docs = rng.permutation(5000)[:2000]
    scores = rng.random(2000).astype(np.float32)
    first = TopKCollector(10, total_hits_threshold=np.inf)
    caching = CachingCollector(first, max_ram_mb=16.0)
    for d, s in zip(docs, scores):
        caching.collect(int(d), s)
    assert caching.is_cached()
    replayed = TopKCollector(10, total_hits_threshold=np.inf)
    caching.replay(replayed)
    assert first.top_docs() == replayed.top_docs()


def test_caching_collector_aborts_over_budget():
    import numpy as np
    import pytest

    from lucene_ray.search.collector import CachingCollector, TopKCollector

    caching = CachingCollector(
        TopKCollector(5, total_hits_threshold=np.inf), max_ram_mb=0.0001
    )
    for d in range(100):
        caching.collect(d, np.float32(1.0 / (d + 1)))
    assert not caching.is_cached()
    with pytest.raises(ValueError, match="replay"):
        caching.replay(TopKCollector(5, total_hits_threshold=np.inf))
    # the wrapped collector still collected everything
    assert len(caching.inner.top_docs()) == 5


def test_memory_accounting_bitset_collector():
    """misc/MemoryAccountingBitsetCollector: bitset growth charged to the
    tracker, hard limit raises."""
    import numpy as np
    import pytest

    from lucene_ray.search.collector import (
        CollectorMemoryTracker,
        MemoryAccountingBitsetCollector,
    )

    tr = CollectorMemoryTracker("test", memory_limit=1024)
    c = MemoryAccountingBitsetCollector(tr)
    c.set_next_reader(100)   # 1 segment of 100 docs
    c.set_next_reader(500)   # second segment
    for d in (0, 99, 100, 599):
        c.collect(d)
    assert c.matching_docs().tolist() == [0, 99, 100, 599]
    assert 0 < tr.get_bytes() <= 1024
    # a segment pushing the bitset past the limit aborts collection
    with pytest.raises(MemoryError):
        c.set_next_reader(100_000)
    # negative accounting is illegal state
    tr2 = CollectorMemoryTracker("neg", 100)
    with pytest.raises(ValueError):
        tr2.update_bytes(-5)


def test_multi_and_counting_collectors():
    from lucene_ray.search.collector import (
        CollectionTerminated,
        MultiCollector,
        PositiveScoresOnlyCollector,
        TotalHitCountCollector,
    )
    import pytest

    count = TotalHitCountCollector()
    kept = TotalHitCountCollector()
    pos = PositiveScoresOnlyCollector(kept)
    mc = MultiCollector(count, pos)
    for doc, score in [(0, 1.5), (1, 0.0), (2, -1.0), (3, 2.0)]:
        mc.collect(doc, score)
    assert count.total_hits == 4
    assert kept.total_hits == 2  # zero and negative scores filtered

    class Limited:
        def __init__(self, n):
            self.n, self.seen = n, 0

        def collect(self, doc, score):
            if self.seen >= self.n:
                raise CollectionTerminated()
            self.seen += 1

    a, b = Limited(2), TotalHitCountCollector()
    mc2 = MultiCollector(a, b)
    for d in range(5):
        mc2.collect(d, 1.0)  # a drops out after 2, b keeps collecting
    assert a.seen == 2 and b.total_hits == 5

    only = Limited(1)
    mc3 = MultiCollector(only)
    mc3.collect(0, 1.0)
    with pytest.raises(CollectionTerminated):
        mc3.collect(1, 1.0)  # last collector gone -> whole pass stops
    with pytest.raises(ValueError):
        MultiCollector(None)
