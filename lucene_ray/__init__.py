"""ray-lucene: Ray-Data-native inverted-index build + BM25 query engine.

Public API (see README.md):

    from lucene_ray import build_index, IndexSearcher, DistributedSearcher
    from lucene_ray.search.query import TermQuery, PhraseQuery, bool_query
    from lucene_ray.search.parser import parse_query

    manifest = build_index("corpus_dir/", "/tmp/idx")
    hits = IndexSearcher("/tmp/idx").search(TermQuery("spark"), 10)
"""

def _tune_malloc() -> None:
    """Keep big numpy/Arrow temporaries on the reusable heap.

    glibc serves allocations above M_MMAP_THRESHOLD (default 128KB) via
    mmap and returns the pages to the OS on free, so every large temporary
    (encode/merge section buffers, sort outputs) re-faults its pages.  On
    this sandbox's hypervisor, first-touch anonymous faults intermittently
    collapse ~100x (see BASELINE.md "Host-variance"), which made
    allocation-heavy phases 6-10x slower than the same FLOPs in-place.
    Raising the mmap/trim thresholds makes freed big buffers stay warm in
    the arena and get reused: measured 16-29s -> 2.4-3.0s per 1.8M-posting
    encode in a degraded window, no effect on results.  Runs in every
    process that imports lucene_ray (driver and Ray workers alike); cost
    is a higher heap high-water mark, bounded by the per-task section
    buffers (~hundreds of MB), which the 128GB nodes absorb.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 28)  # M_MMAP_THRESHOLD = 256MB
        libc.mallopt(-1, 1 << 28)  # M_TRIM_THRESHOLD = 256MB
    except Exception:  # non-glibc platform: defaults are fine
        pass


_tune_malloc()

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
