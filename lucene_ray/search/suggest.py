"""Prefix suggester over the term dictionary (lucene/suggest analogue).

Semantics: HighFrequencyDictionary + WFSTCompletionLookup — completions
are the indexed terms under the prefix, weighted by collection doc freq,
top-N by (weight DESC, term ASC).  The reference walks an FST byte prefix
(suggest/fst/WFSTCompletionLookup.java:188-260 lookup;
spell/HighFrequencyDictionary.java term+docFreq source); this engine's
sorted term dictionary gives the same pruning via the [prefix, prefix+FF)
term-id range, so a segment touches only the completions' dictionary
rows, never its postings.

Distribution shape: one task per segment emits (qid, term, df) partials
for every prefix, a Ray groupby sums across segments (vocabulary-bounded,
not corpus-bounded), then per-block partial top-N keeps candidate rows
tiny before the driver's final merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.segment import SegmentReader


def segment_completions(
    reader: SegmentReader, prefixes: list[str]
) -> tuple[list[int], list[str], list[int]]:
    """(qid, term, doc_freq) rows for every dictionary term under each
    prefix in this segment — a dictionary range scan, no postings decode."""
    qids: list[int] = []
    terms: list[str] = []
    weights: list[int] = []
    df = np.asarray(reader.enc.doc_freq)
    for qid, p in enumerate(prefixes):
        lo = p.encode("utf-8")
        hi = lo + b"\xff\xff\xff\xff"
        for tid in reader.term_id_range(lo, hi):
            qids.append(qid)
            terms.append(reader.term_string(tid))
            weights.append(int(df[tid]))
    return qids, terms, weights


def partial_topn(batch: pa.Table, n: int) -> pa.Table:
    """Per-block top-N by (weight DESC, term ASC) within each qid — exact
    pre-reduction because rows are already (qid, term)-unique finals."""
    import pandas as pd

    df = batch.to_pandas()
    df = df.sort_values(["qid", "weight", "term"], ascending=[True, False, True])
    out = df.groupby("qid", sort=True).head(n)
    return pa.Table.from_pandas(out, preserve_index=False)


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (reference
    suggest/spell/JaroWinklerDistance.java; same constants and
    boost-threshold gate as DuckDB's jaro_winkler_similarity, verified
    bit-exact over the spell candidate pairs): Jaro with the half-window
    match rule and half-transposition count, Winkler prefix boost (up to
    4 chars) applied only above the threshold."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1.0 - j)


class WFSTCompletion:
    """Weighted FST-topology completion (reference suggest/fst/
    WFSTCompletionLookup.java + FSTCompletion.java): a byte trie over the
    sorted (term, weight) table with MAX-WEIGHT PUSHING — every node
    carries the best weight in its subtree — so ``top_n(prefix, n)``
    explores best-first by node bound and touches only the arcs on the
    top-n paths instead of enumerating the whole prefix subtree.

    Deviations (documented): the trie is not minimized into a true FST
    (suffix sharing changes nothing for completion lookups), and weights
    are exact ints rather than the reference's discretized buckets.
    Ordering matches the engine's suggesters: weight DESC, term ASC.
    """

    def __init__(self, terms: list[str], weights: list[int]):
        order = sorted(range(len(terms)), key=lambda i: terms[i].encode("utf-8"))
        # node storage: dict label -> child id per node (built sorted, so
        # insertion order is lexicographic); terminal weight; subtree max
        self.children: list[dict[int, int]] = [{}]
        self.term_weight: list[int | None] = [None]
        self.max_weight: list[int] = [-(1 << 62)]
        for i in order:
            bs = terms[i].encode("utf-8")
            w = int(weights[i])
            node = 0
            self.max_weight[0] = max(self.max_weight[0], w)
            for b in bs:
                nxt = self.children[node].get(b)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[node][b] = nxt
                    self.children.append({})
                    self.term_weight.append(None)
                    self.max_weight.append(w)
                else:
                    self.max_weight[nxt] = max(self.max_weight[nxt], w)
                node = nxt
            self.term_weight[node] = w

    def _descend(self, prefix: bytes) -> int | None:
        node = 0
        for b in prefix:
            node = self.children[node].get(b)
            if node is None:
                return None
        return node

    def top_n(self, prefix: str, n: int) -> tuple[list[tuple[str, int]], int]:
        """([(term, weight)] best-first, nodes_expanded) — the expansion
        count is the pruning evidence (<< subtree size for small n).

        Heap entries are (-weight, path, kind): kind 0 EMITS a finished
        term, kind 1 expands a subtree at its pushed max bound.  Equal
        weights pop in lexicographic path order (emit before the subtree
        rooted at the same path), giving weight DESC, term ASC exactly.
        """
        import heapq

        pfx = prefix.encode("utf-8")
        start = self._descend(pfx)
        if start is None:
            return [], 0
        heap: list[tuple[int, bytes, int, int]] = [
            (-self.max_weight[start], pfx, 1, start)
        ]
        out: list[tuple[str, int]] = []
        expanded = 0
        while heap and len(out) < n:
            negw, path, kind, node = heapq.heappop(heap)
            if kind == 0:
                out.append((path.decode("utf-8"), -negw))
                continue
            expanded += 1
            w = self.term_weight[node]
            if w is not None:
                heapq.heappush(heap, (-w, path, 0, node))
            for b, c in self.children[node].items():
                heapq.heappush(
                    heap, (-self.max_weight[c], path + bytes([b]), 1, c)
                )
        return out, expanded
