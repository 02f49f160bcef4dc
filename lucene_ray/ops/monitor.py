"""Percolator: match a STREAM of documents against registered queries
(lucene/monitor module analogue — Monitor.match(Document...)).

The dataflow is inverted from search: the compiled query set is the small
side (broadcast once per run via the closure / ray.put at scale), and the
corpus streams through stateless map_batches tasks; each batch tokenizes
once (same polars tokenizer as the text ops) and evaluates every query
vectorized — term membership via list.contains, phrases via an exploded
(doc, pos, tok) self-join.  The reference prunes candidate queries with a
presearcher term index (monitor/Presearcher.java); evaluating the
vectorized membership tests IS that prune here: a query's columns never
materialize per-doc state beyond one boolean mask per batch.

Registered query forms: ("term", t) | ("and", [t...]) | ("or", [t...]) |
("and_not", [t...], [neg...]) | ("phrase", [a, b]).

Output is aggregation-friendly: per query (n_matches, sum/min/max of the
matching doc ids) — partials combine across batches with sum/sum/min/max.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

MONITOR_QUERIES: list[tuple] = [
    ("term", "spark"),
    ("and", ["join", "order"]),
    ("and_not", ["vector", "stream"], ["hash"]),
    ("phrase", ["the", "customer"]),
    ("and", ["window", "batch"]),
]


def _tok_expr() -> pl.Expr:
    from .text import _tok_expr as t

    return t()


def _contains(tok: pl.Expr, term: str) -> pl.Expr:
    return tok.list.contains(term)


def match_batch(batch: pa.Table, queries: list[tuple]) -> pa.Table:
    """Per-batch percolation partials: (qid, n_matches, sum_doc, min_doc,
    max_doc) for every registered query (queries with no batch matches
    still emit a zero row so the reduce sees every qid)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = df.select(pl.col("doc_id"), _tok_expr().alias("ts"))

    # exploded positions view, built lazily only if a phrase query exists
    pos_df = None
    if any(q[0] == "phrase" for q in queries):
        pos_df = (
            toks.with_columns(pl.int_ranges(pl.col("ts").list.len()).alias("p"))
            .explode(["ts", "p"])
            .rename({"ts": "tok"})
        )

    out_qid, out_n, out_sum, out_min, out_max = [], [], [], [], []
    for qid, q in enumerate(queries):
        kind = q[0]
        if kind == "term":
            mask = toks.select(_contains(pl.col("ts"), q[1]).alias("m"))["m"]
        elif kind == "and":
            e = pl.lit(True)
            for t in q[1]:
                e = e & _contains(pl.col("ts"), t)
            mask = toks.select(e.alias("m"))["m"]
        elif kind == "or":
            e = pl.lit(False)
            for t in q[1]:
                e = e | _contains(pl.col("ts"), t)
            mask = toks.select(e.alias("m"))["m"]
        elif kind == "and_not":
            e = pl.lit(True)
            for t in q[1]:
                e = e & _contains(pl.col("ts"), t)
            for t in q[2]:
                e = e & ~_contains(pl.col("ts"), t)
            mask = toks.select(e.alias("m"))["m"]
        elif kind == "phrase":
            a, b = q[1]
            pa_ = pos_df.filter(pl.col("tok") == a).select("doc_id", "p")
            pb_ = pos_df.filter(pl.col("tok") == b).select(
                "doc_id", (pl.col("p") - 1).alias("p")
            )
            hit_docs = (
                pa_.join(pb_, on=["doc_id", "p"], how="inner")
                .select("doc_id")
                .unique()["doc_id"]
            )
            mask = toks.select(pl.col("doc_id").is_in(hit_docs).alias("m"))["m"]
        else:  # pragma: no cover
            raise ValueError(kind)
        matched = toks.filter(mask)["doc_id"]
        out_qid.append(qid)
        out_n.append(len(matched))
        out_sum.append(int(matched.sum()) if len(matched) else 0)
        out_min.append(int(matched.min()) if len(matched) else 2**62)
        out_max.append(int(matched.max()) if len(matched) else -1)
    return pa.table(
        {
            "qid": pa.array(out_qid, pa.int64()),
            "n_matches": pa.array(out_n, pa.int64()),
            "sum_doc": pa.array(out_sum, pa.int64()),
            "min_doc": pa.array(out_min, pa.int64()),
            "max_doc": pa.array(out_max, pa.int64()),
        }
    )


def percolate_counts(ds, queries: list[tuple] | None = None) -> pa.Table:
    """Stream the dataset through the registered queries; reduce partials
    to one row per query: (qid, n_matches, sum_doc, min_doc, max_doc)."""
    from ray.data.aggregate import Max, Min, Sum

    queries = queries if queries is not None else MONITOR_QUERIES
    part = (
        ds.map_batches(
            lambda b: match_batch(b, queries), batch_format="pyarrow"
        )
        .groupby("qid")
        .aggregate(
            Sum("n_matches"), Sum("sum_doc"), Min("min_doc"), Max("max_doc")
        )
        .to_pandas()
    )
    part = part.rename(
        columns={
            "sum(n_matches)": "n_matches",
            "sum(sum_doc)": "sum_doc",
            "min(min_doc)": "min_doc",
            "max(max_doc)": "max_doc",
        }
    ).sort_values("qid")
    # zero-match queries keep sentinel min/max; normalize to -1
    part.loc[part["n_matches"] == 0, ["min_doc", "max_doc"]] = -1
    return pa.Table.from_pandas(part.reset_index(drop=True), preserve_index=False)


def compile_query(spec: tuple):
    """Registered-query spec -> first-class Query object (the exact path)."""
    from ..search.query import PhraseQuery, TermQuery, bool_query

    kind = spec[0]
    if kind == "term":
        return TermQuery(spec[1])
    if kind == "and":
        return bool_query(must=[TermQuery(t) for t in spec[1]])
    if kind == "or":
        return bool_query(should=[TermQuery(t) for t in spec[1]])
    if kind == "and_not":
        return bool_query(
            must=[TermQuery(t) for t in spec[1]],
            must_not=[TermQuery(t) for t in spec[2]],
        )
    if kind == "phrase":
        return PhraseQuery(tuple(spec[1]))
    raise ValueError(f"unknown query spec {spec!r}")


class ExactPercolator:
    """Actor-pool percolation stage for ARBITRARY Query objects: each actor
    compiles the registered queries once (__init__), then every document in
    a batch is indexed into a MemoryIndex and evaluated exactly — the
    reference Monitor.match shape (each doc batch goes into a one-doc
    memory index, monitor/Monitor.java + memory/MemoryIndex.java).  The
    vectorized match_batch above is the bulk fast path; this is the
    fallback for query types it cannot express (fuzzy, intervals, nested
    boolean trees...).  Emits the same partial shape, so the same reduce
    applies."""

    def __init__(self, queries: list[tuple] | None = None):
        specs = queries if queries is not None else MONITOR_QUERIES
        self.compiled = [compile_query(s) for s in specs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.memory import MemoryIndex

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {qid: [] for qid in range(len(self.compiled))}
        for doc_id, text in zip(doc_ids, texts):
            mi = MemoryIndex(text or "")
            for qid, q in enumerate(self.compiled):
                if mi.matches(q):
                    rows[qid].append(doc_id)
        qids, n, s, lo, hi = [], [], [], [], []
        for qid, docs in rows.items():
            qids.append(qid)
            n.append(len(docs))
            s.append(sum(docs))
            lo.append(min(docs) if docs else (1 << 62))
            hi.append(max(docs) if docs else -(1 << 62))
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "n_matches": pa.array(n, pa.int64()),
                "sum_doc": pa.array(s, pa.int64()),
                "min_doc": pa.array(lo, pa.int64()),
                "max_doc": pa.array(hi, pa.int64()),
            }
        )


def percolate_counts_exact(ds, queries: list[tuple] | None = None) -> pa.Table:
    """percolate_counts via the MemoryIndex exact path (actor pool)."""
    from ray.data.aggregate import Max, Min, Sum

    part = (
        ds.map_batches(
            ExactPercolator,
            fn_constructor_kwargs={"queries": queries},
            batch_format="pyarrow",
            concurrency=(1, 4),
            batch_size=256,
        )
        .groupby("qid")
        .aggregate(
            Sum("n_matches"), Sum("sum_doc"), Min("min_doc"), Max("max_doc")
        )
        .to_pandas()
    )
    part = part.rename(
        columns={
            "sum(n_matches)": "n_matches",
            "sum(sum_doc)": "sum_doc",
            "min(min_doc)": "min_doc",
            "max(max_doc)": "max_doc",
        }
    ).sort_values("qid")
    part.loc[part["n_matches"] == 0, ["min_doc", "max_doc"]] = -1
    return pa.Table.from_pandas(part.reset_index(drop=True), preserve_index=False)
