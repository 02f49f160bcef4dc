"""DiversifiedTopDocsCollector analogue: per-key cap invariant and
brute-force parity (per-key top-m then global top-k)."""

import duckdb
import numpy as np

from lucene_ray.pipelines import fulltext as ft

SF = "/root/testdata/sf0.001"


def test_diversified_cap_and_parity(ray_session):
    t = ft.diversified_topk(SF).to_pandas()
    lang = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    j = t.merge(lang, on="doc_id")
    # cap invariant: no (qid, lang) appears more than M times
    assert (
        j.groupby(["qid", "lang"]).size() <= ft.DIVERSIFY_MAX_PER_KEY
    ).all()
    # parity vs the undiversified ranking: greedy scan of the full
    # (score desc, doc asc) order keeping only under-cap keys
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    searcher = IndexSearcher(ft.ensure_index(SF))
    lang_by_doc = dict(zip(lang["doc_id"], lang["lang"]))
    for qid, term in enumerate(ft.QUERY_TERMS):
        full = searcher.search(TermQuery(term), 10_000)
        kept, counts = [], {}
        for doc, _s in full:
            k = lang_by_doc[doc]
            if counts.get(k, 0) < ft.DIVERSIFY_MAX_PER_KEY:
                counts[k] = counts.get(k, 0) + 1
                kept.append(doc)
            if len(kept) == 10:
                break
        got = t[t["qid"] == qid].sort_values("rnk")["doc_id"].tolist()
        assert got == kept, f"qid {qid}"
