"""SimpleText codec: a human-readable plain-text postings format.

Reference: lucene/codecs/src/java/org/apache/lucene/codecs/simpletext/
``SimpleTextCodec.java`` / ``SimpleTextFieldsWriter.java`` (markers at
:50-57: ``field``, ``  term``, ``    doc``, ``      freq``, ``    pos``,
``END``) / ``SimpleTextFieldsReader.java`` — the debugging codec whose
whole point is that you can ``cat`` a segment.  **Never use in
production** (the reference says the same); it exists to prove the codec
seam: anything that reads postings through the reader protocol
(term_id / term_stats / decode_term_cached / norms) runs unchanged on
top of it.

Round-trip: ``write_simpletext(reader, path)`` dumps a binary segment,
``SimpleTextSegment(path)`` parses it back and serves the reader
protocol; search results are bit-identical to the binary segment.
"""

from __future__ import annotations

import os

import numpy as np

from .. import store

_FIELD = "field "
_TERM = "  term "
_DOC = "    doc "
_FREQ = "      freq "
_POS = "      pos "
_NORM = "norm "
_END = "END"


def write_simpletext(reader, path: str, field: str = "text") -> None:
    """Dump one segment's postings (and norms) as SimpleText."""
    lines: list[str] = []
    lines.append(f"{_FIELD}{field}")
    for tid in range(reader.n_terms):
        lines.append(f"{_TERM}{reader.term_string(tid)}")
        docs, tfs = reader.decode_term_cached(tid)
        if reader.has_positions:
            plist = reader.term_positions(tid)
        for j, (d, f) in enumerate(zip(docs.tolist(), tfs.tolist())):
            lines.append(f"{_DOC}{d}")
            lines.append(f"{_FREQ}{f}")
            if reader.has_positions:
                for p in plist[j].tolist():
                    lines.append(f"{_POS}{p}")
    for b in np.asarray(reader.norms).tolist():
        lines.append(f"{_NORM}{b}")
    lines.append(_END)
    store.write_bytes_atomic(path, ("\n".join(lines) + "\n").encode("utf-8"))


class SimpleTextSegment:
    """Parses a SimpleText dump back into the reader protocol (the
    SimpleTextFieldsReader analogue: linear scan building an in-RAM terms
    index)."""

    def __init__(self, path: str):
        text = store.read_bytes(path).decode("utf-8")
        terms: list[str] = []
        postings: list[tuple[list[int], list[int], list[list[int]]]] = []
        norms: list[int] = []
        cur = None
        has_pos = False
        for line in text.splitlines():
            if line.startswith(_FREQ):
                cur[1].append(int(line[len(_FREQ):]))
                cur[2].append([])
            elif line.startswith(_POS):
                has_pos = True
                cur[2][-1].append(int(line[len(_POS):]))
            elif line.startswith(_DOC):
                cur[0].append(int(line[len(_DOC):]))
            elif line.startswith(_TERM):
                terms.append(line[len(_TERM):])
                cur = ([], [], [])
                postings.append(cur)
            elif line.startswith(_NORM):
                norms.append(int(line[len(_NORM):]))
            elif line.startswith(_FIELD) or line == _END:
                continue
        self._terms = terms  # already in sorted dictionary order
        self._docs = [np.asarray(p[0], np.int64) for p in postings]
        self._tfs = [np.asarray(p[1], np.int64) for p in postings]
        self._pos = [
            [np.asarray(x, np.int64) for x in p[2]] for p in postings
        ]
        self.norms = np.asarray(norms, np.uint8)
        self.max_doc = len(norms)
        self.n_terms = len(terms)
        self.has_positions = has_pos
        self.live = None

    # --- reader protocol ---
    def term_id(self, term: str) -> int | None:
        import bisect

        i = bisect.bisect_left(self._terms, term)
        return i if i < self.n_terms and self._terms[i] == term else None

    def term_string(self, tid: int) -> str:
        return self._terms[tid]

    def term_stats(self, term: str) -> tuple[int, int]:
        tid = self.term_id(term)
        if tid is None:
            return 0, 0
        return len(self._docs[tid]), int(self._tfs[tid].sum())

    def decode_term_cached(self, tid: int):
        return self._docs[tid], self._tfs[tid]

    def term_positions(self, tid: int):
        return self._pos[tid]

    def collection_partials(self) -> dict:
        dfs = sum(len(d) for d in self._docs)
        ttf = sum(int(t.sum()) for t in self._tfs)
        return {
            "doc_count": int((self.norms > 0).sum()),
            "sum_total_term_freq": ttf,
            "sum_doc_freq": dfs,
        }
