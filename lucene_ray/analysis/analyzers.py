"""Analyzers: tokenizer + filter chains producing per-document terms.

Reproduces the reference's ``StandardAnalyzer`` chain — ``StandardTokenizer
-> LowerCaseFilter -> StopFilter`` with an EMPTY default stop set and
``maxTokenLength=255`` (reference: lucene/core/src/java/org/apache/lucene/
analysis/standard/StandardAnalyzer.java:37,51-53,85-96) — and a
``SimpleCodeAnalyzer`` whose semantics are exactly expressible in ANSI SQL
(used for the DuckDB oracle comparisons).

An analyzer is instantiated ONCE per Ray actor (tables loaded in __init__)
and invoked per Arrow batch; see lucene_ray/index/build.py.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from . import scanner


class StandardAnalyzer:
    """UAX#29 tokenize -> per-codepoint lowercase -> stop filter.

    ``analyze(text)`` returns ``(terms, tfs, length)`` where ``length`` is the
    number of tokens that survived the chain (the FieldInvertState length used
    for the norm, reference IndexingChain.java:1150-1166; with no graph
    filters there are no position overlaps, so
    ``norm = SmallFloat.intToByte4(length)``).
    """

    def __init__(self, stop_words: frozenset[str] | None = None, max_token_length: int = 255):
        self.tables = scanner.tables()
        # Default stop set is EMPTY, matching StandardAnalyzer.java:51-53
        # (CharArraySet.EMPTY_SET), critical for rank-identity.
        self.stop_words = stop_words or frozenset()
        self.max_token_length = max_token_length

    def tokens(self, text: str) -> list[str]:
        """All chain-surviving tokens, in order."""
        if not text:
            return []
        cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
        spans = scanner.scan_spans(cps, self.max_token_length)
        if not spans:
            return []
        low_text = self.tables.lower[cps].astype("<u4").tobytes().decode("utf-32-le")
        toks = [low_text[s:e] for s, e, _ in spans]
        if self.stop_words:
            toks = [t for t in toks if t not in self.stop_words]
        return toks

    def analyze(self, text: str) -> tuple[list[str], list[int], int]:
        toks = self.tokens(text)
        if not toks:
            return [], [], 0
        counts = Counter(toks)
        terms = list(counts.keys())
        tfs = list(counts.values())
        return terms, tfs, len(toks)

    def normalize(self, term: str) -> str:
        """Query-term normalization (Analyzer.normalize): lowercase only."""
        cps = np.frombuffer(term.encode("utf-32-le"), dtype="<u4")
        return self.tables.lower[cps].astype("<u4").tobytes().decode("utf-32-le")


class SimpleCodeAnalyzer:
    """ASCII identifier tokenizer with exact SQL-oracle parity.

    Semantics: ``regexp_extract_all(lower(text), '[a-z0-9_]+')`` — the Python
    implementation below produces identical tokens for any input because both
    sides lowercase with full Unicode case mapping and then keep only ASCII
    ``[a-z0-9_]`` runs (non-ASCII lowercase output never matches the class).
    Used by the DuckDB-checked query entries in __ray_entry__.py.
    """

    _PAT = re.compile(r"[a-z0-9_]+")

    def __init__(self, stop_words: frozenset[str] | None = None, max_token_length: int = 255):
        self.stop_words = stop_words or frozenset()
        self.max_token_length = max_token_length

    def tokens(self, text: str) -> list[str]:
        toks = self._PAT.findall(text.lower())
        if self.stop_words:
            toks = [t for t in toks if t not in self.stop_words]
        if self.max_token_length:
            toks = [t for t in toks if len(t) <= self.max_token_length]
        return toks

    def analyze(self, text: str) -> tuple[list[str], list[int], int]:
        toks = self.tokens(text)
        if not toks:
            return [], [], 0
        counts = Counter(toks)
        return list(counts.keys()), list(counts.values()), len(toks)

    def normalize(self, term: str) -> str:
        return term.lower()


ANALYZERS = {
    "standard": StandardAnalyzer,
    "simple_code": SimpleCodeAnalyzer,
}


def make_analyzer(name: str = "standard", **kw):
    return ANALYZERS[name](**kw)
