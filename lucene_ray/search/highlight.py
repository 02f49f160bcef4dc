"""Sentence-passage highlighting (UnifiedHighlighter analogue).

Reference: lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
FieldHighlighter.java (passage formation over BreakIterator.getSentence-
Instance boundaries) + PassageScorer.java (per-passage term weighting).

Deviations (documented):
- sentence segmentation is a deterministic rule-based splitter (terminator
  run [.!?…] + following whitespace closes a sentence; trailing quotes /
  brackets stay attached) instead of ICU's UAX#29 BreakIterator — no ICU in
  this environment; the fixed-W token-window variant (pipelines.fulltext
  _seg_highlight) remains the oracle-checked driver row.
- passage score = sum over matching terms of count_in_passage * idf(term)
  with ties broken by earliest start; PassageScorer's passage-length
  pivot normalization is omitted (integer-exact scoring for tests).

Match offsets come from the OFFSETS index (index_options="offsets"), not
from re-analysis of the stored text — the posting-based offsets strategy
of the reference's OffsetSource.POSTINGS.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_SENT_END = re.compile(r"[.!?…]+[\"')\]]*\s+")


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Half-open [start, end) char spans of sentences; the whole text is
    one span when no terminator is found.  Spans cover the text minus any
    inter-sentence whitespace; they never overlap and preserve order."""
    if not text:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_END.finditer(text):
        end = m.end()
        # the sentence ends after the terminator run (incl. closing quotes),
        # before the whitespace
        term_end = end - (len(m.group(0)) - len(m.group(0).rstrip()))
        spans.append((start, term_end))
        start = end
    if start < len(text):
        spans.append((start, len(text)))
    return spans


@dataclass(frozen=True)
class Passage:
    start: int
    end: int
    score: float
    n_hits: int
    n_uniq: int
    term_spans: tuple[tuple[str, int, int], ...]  # (term, start, end) per hit


def best_passages(
    text: str,
    matches: dict[str, tuple[np.ndarray, np.ndarray]],
    idf: dict[str, float] | None = None,
    max_passages: int = 3,
) -> list[Passage]:
    """Top passages of one doc: sentences ranked by
    sum(count_t * idf_t), ties by earliest start.

    ``matches``: term -> (start_offsets, end_offsets) char arrays (from
    SegmentReader.term_offset_spans).  ``idf``: per-term weight (default 1
    — pure hit counting)."""
    spans = sentence_spans(text)
    if not spans or not matches:
        return []
    starts = np.array([s for s, _ in spans], dtype=np.int64)
    scored: dict[int, list[tuple[str, int, int]]] = {}
    for term, (os_, oe_) in matches.items():
        for s, e in zip(np.asarray(os_), np.asarray(oe_)):
            i = int(np.searchsorted(starts, s, side="right")) - 1
            if i >= 0 and s < spans[i][1]:
                scored.setdefault(i, []).append((term, int(s), int(e)))
    out = []
    for i, hits in scored.items():
        terms = [t for t, _, _ in hits]
        uniq = set(terms)
        w = idf or {}
        score = sum(terms.count(t) * float(w.get(t, 1.0)) for t in uniq)
        out.append(
            Passage(
                start=spans[i][0],
                end=spans[i][1],
                score=score,
                n_hits=len(hits),
                n_uniq=len(uniq),
                term_spans=tuple(sorted(hits, key=lambda h: h[1])),
            )
        )
    out.sort(key=lambda p: (-p.score, p.start))
    return out[:max_passages]


def format_passage(text: str, p: Passage, pre: str = "<b>", post: str = "</b>") -> str:
    """Render one passage with its hits wrapped (the DefaultPassageFormatter
    shape)."""
    frag = []
    cur = p.start
    for _t, s, e in p.term_spans:
        frag.append(text[cur:s])
        frag.append(pre + text[s:e] + post)
        cur = e
    frag.append(text[cur : p.end])
    return "".join(frag)


def highlight_doc(
    reader,
    local_doc: int,
    text: str,
    terms: list[str],
    idf: dict[str, float] | None = None,
    max_passages: int = 3,
) -> list[Passage]:
    """Best sentence passages for one doc from the offsets index: each
    term's occurrence spans are sliced from the postings (no re-analysis)."""
    matches: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            continue
        docs, _ = reader.decode_term_cached(tid)
        j = int(np.searchsorted(docs, local_doc))
        if j < len(docs) and docs[j] == local_doc:
            matches[t] = reader.term_offset_spans(tid)[j]
    return best_passages(text, matches, idf, max_passages)


# --- FastVectorHighlighter analogue ---------------------------------------

def fvh_fragments(
    reader,
    local_doc: int,
    text: str,
    terms: list[str],
    idf: dict[str, float] | None = None,
    frag_char_size: int = 100,
    max_frags: int = 3,
) -> list[Passage]:
    """FastVectorHighlighter analogue (reference highlighter/vectorhighlight/
    FastVectorHighlighter.java + SimpleFragListBuilder.java +
    ScoreOrderFragmentsBuilder.java): the doc's FORWARD index (term
    vector) decides term membership — one binary search per query term
    against the doc's own tid list, no postings seek for absent terms —
    then occurrence char spans come from the offsets stream, fragments
    are greedy fixed-char windows packed in offset order
    (SimpleFragListBuilder.createFieldFragList), and returned in score
    order (Σ count·idf per fragment, ScoreOrderFragmentsBuilder).
    Requires an index with term_vectors=True and offsets."""
    doc_tids, _tfs = reader.term_vector(local_doc)
    hits: list[tuple[str, int, int]] = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            continue
        j = int(np.searchsorted(doc_tids, tid))
        if j >= len(doc_tids) or doc_tids[j] != tid:
            continue  # the term-vector shortcut: absent term, no postings
        docs, _ = reader.decode_term_cached(tid)
        k = int(np.searchsorted(docs, local_doc))
        os_, oe_ = reader.term_offset_spans(tid)[k]
        hits.extend((t, int(s), int(e)) for s, e in zip(os_, oe_))
    if not hits:
        return []
    hits.sort(key=lambda h: h[1])
    w = idf or {}
    frags: list[Passage] = []
    cur: list[tuple[str, int, int]] = []
    cur_start = 0
    for h in hits:
        if not cur:
            cur = [h]
            cur_start = h[1]
            continue
        if h[2] <= cur_start + frag_char_size:
            cur.append(h)
        else:
            frags.append(_fvh_passage(cur, cur_start, frag_char_size, text, w))
            cur = [h]
            cur_start = h[1]
    frags.append(_fvh_passage(cur, cur_start, frag_char_size, text, w))
    frags.sort(key=lambda p: (-p.score, p.start))
    return frags[:max_frags]


def _fvh_passage(
    hits: list, start: int, frag_char_size: int, text: str, w: dict
) -> Passage:
    terms = [t for t, _, _ in hits]
    uniq = set(terms)
    end = min(len(text), max(start + frag_char_size, max(e for _, _, e in hits)))
    return Passage(
        start=start,
        end=end,
        score=sum(terms.count(t) * float(w.get(t, 1.0)) for t in uniq),
        n_hits=len(hits),
        n_uniq=len(uniq),
        term_spans=tuple(hits),
    )
