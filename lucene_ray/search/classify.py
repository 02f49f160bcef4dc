"""Index-backed classification: SimpleNaiveBayesClassifier analogue.

Reference: lucene/classification SimpleNaiveBayesClassifier.java — classes
come from a stored field; assignClass returns argmax_c of
log(P(c)) + sum_w log(P(w|c)) with add-one smoothing:
P(c) = docCount(c)/docCount, P(w|c) = (tf(w, c) + 1)/(tf(c) + vocabSize)
(SimpleNaiveBayesClassifier.getWordProbability / calculateLogPrior).

Training is distributed: one Ray task per segment emits PARTIAL
(class, term, tf) sums and per-class doc counts — the transpose rides the
term-vector forward index when present, else a postings scan gathered by
the stored class column — reduced by one small groupby.  The model (per
class: token->tf dict + totals) is classes x vocab bounded, broadcast for
batch classification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.analyzers import make_analyzer
from ..index.postings import decode_term
from ..index.segment import SegmentReader


def _segment_partials(batch: pa.Table, class_field: str) -> pa.Table:
    out_cls, out_term, out_tf = [], [], []
    doc_cls, doc_n, doc_len = [], [], []
    for row in batch.to_pylist():
        r = SegmentReader(row["dir"])
        classes = r.stored_column(class_field).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(classes, return_inverse=True)
        live = r.live
        live_mask = np.ones(r.max_doc, bool) if live is None else np.asarray(live, bool)
        for ci, c in enumerate(uniq):
            sel = (inv == ci) & live_mask
            doc_cls.append(str(c))
            doc_n.append(int(sel.sum()))
            doc_len.append(0)
        terms = r.terms_array()
        for tid in range(r.n_terms):
            docs, tfs = decode_term(r.enc, tid)
            keep = live_mask[docs]
            if not keep.all():
                docs, tfs = docs[keep], tfs[keep]
            if not len(docs):
                continue
            agg = np.bincount(inv[docs], weights=tfs, minlength=len(uniq)).astype(
                np.int64
            )
            t = terms[tid].as_py()
            for ci in np.nonzero(agg)[0]:
                out_cls.append(str(uniq[ci]))
                out_term.append(t)
                out_tf.append(int(agg[ci]))
    return pa.table(
        {
            "cls": pa.array(out_cls + doc_cls, pa.string()),
            "term": pa.array(out_term + [""] * len(doc_cls), pa.string()),
            "tf": pa.array(out_tf + doc_n, pa.int64()),
        }
    )


class NaiveBayesClassifier:
    def __init__(self, index_dir: str, class_field: str, analyzer: str = "standard"):
        import ray.data as rd

        from ..index.manifest import read_manifest

        man = read_manifest(index_dir)
        rows = [
            {"dir": s["dir"], "doc_base": s["doc_base"]} for s in man["segments"]
        ]
        part = (
            rd.from_items(rows)
            .map_batches(
                _segment_partials,
                batch_format="pyarrow",
                fn_kwargs={"class_field": class_field},
            )
            .groupby(["cls", "term"])
            .sum("tf")
            .to_pandas()
        )
        self.analyzer = make_analyzer(analyzer)
        self.doc_counts: dict[str, int] = {}
        self.tf: dict[str, dict[str, int]] = {}
        self.class_tokens: dict[str, int] = {}
        vocab: set[str] = set()
        for _, r in part.iterrows():
            c, t, n = r["cls"], r["term"], int(r["sum(tf)"])
            if t == "":
                self.doc_counts[c] = self.doc_counts.get(c, 0) + n
            else:
                self.tf.setdefault(c, {})[t] = n
                self.class_tokens[c] = self.class_tokens.get(c, 0) + n
                vocab.add(t)
        self.vocab_size = len(vocab)
        self.n_docs = sum(self.doc_counts.values())

    def assign_class(self, text: str) -> tuple[str, float]:
        """(class, log-likelihood) = argmax_c log P(c) + sum_w log P(w|c)."""
        toks, tfs, _n = self.analyzer.analyze(text)
        best, best_ll = None, -np.inf
        for c, dc in sorted(self.doc_counts.items()):
            if dc == 0:
                continue
            ll = float(np.log(dc / self.n_docs))
            denom = self.class_tokens.get(c, 0) + self.vocab_size
            ctf = self.tf.get(c, {})
            for w, wtf in zip(toks, tfs):
                ll += wtf * float(np.log((ctf.get(w, 0) + 1) / denom))
            if ll > best_ll:
                best, best_ll = c, ll
        return best, best_ll


class KNNClassifier:
    """KNearestNeighborClassifier analogue (reference
    classification/KNearestNeighborClassifier.java): the text's analyzed
    terms form a SHOULD disjunction, the BM25 top-k neighbors vote —
    class rank = (votes DESC, sum of neighbor scores DESC, label ASC);
    the returned score is votes/k (the reference's normalized count).
    Reuses the ordinary IndexSearcher, so pruning/impacts apply to the
    neighbor search unchanged."""

    def __init__(self, index_dir: str, class_field: str, k: int = 10,
                 analyzer: str = "standard"):
        from .searcher import IndexSearcher

        self.searcher = IndexSearcher(index_dir)
        self.class_field = class_field
        self.k = int(k)
        self.analyzer = make_analyzer(analyzer)
        # per-segment class column, gathered lazily per assign call
        self._cls_cols = [
            r.stored_column(class_field) for r in self.searcher.readers
        ]
        self._bases = [
            s["doc_base"] for s in self.searcher.manifest["segments"]
        ]

    def _label(self, gdoc: int) -> str:
        for col, base in zip(self._cls_cols[::-1], self._bases[::-1]):
            if gdoc >= base:
                return str(col[gdoc - base].as_py())
        raise IndexError(gdoc)

    def assign_class(self, text: str) -> tuple[str, float]:
        from .query import TermQuery, bool_query

        toks, _tfs, _n = self.analyzer.analyze(text)
        if not toks:
            raise ValueError("empty analyzed text")
        q = bool_query(should=[TermQuery(t) for t in sorted(set(toks))])
        hits = self.searcher.search(q, self.k)
        votes: dict[str, int] = {}
        ssum: dict[str, float] = {}
        for doc, score in hits:
            c = self._label(int(doc))
            votes[c] = votes.get(c, 0) + 1
            ssum[c] = ssum.get(c, 0.0) + float(score)
        if not votes:
            raise ValueError("no neighbors matched")
        best = min(votes, key=lambda c: (-votes[c], -ssum[c], c))
        return best, votes[best] / float(self.k)
