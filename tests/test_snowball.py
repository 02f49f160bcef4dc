"""Snowball English (Porter2, Snowball 3.0.0) stemmer + the session's new
analysis-common filters and stream analyzers.

Golden vectors below are hand-derived by executing the published algorithm
rules (snowballstem.org English stemmer, 3.0 revision — the one the
reference vendors in tartarus/snowball/ext/EnglishStemmer.java)."""

import numpy as np

from lucene_ray.analysis.analyzers import (
    CustomChainAnalyzer,
    make_analyzer,
    make_term_filter,
)
from lucene_ray.analysis.snowball import porter2_stem


def test_porter2_exception1():
    assert porter2_stem("skis") == "ski"
    assert porter2_stem("skies") == "sky"
    assert porter2_stem("idly") == "idl"
    assert porter2_stem("gently") == "gentl"
    assert porter2_stem("ugly") == "ugli"
    assert porter2_stem("early") == "earli"
    assert porter2_stem("only") == "onli"
    assert porter2_stem("singly") == "singl"
    for inv in ("sky", "news", "howe", "atlas", "cosmos", "bias", "andes"):
        assert porter2_stem(inv) == inv


def test_porter2_short_words_unchanged():
    assert porter2_stem("a") == "a"
    assert porter2_stem("is") == "is"
    assert porter2_stem("by") == "by"


def test_porter2_step0_1a():
    assert porter2_stem("caresses") == "caress"
    assert porter2_stem("ties") == "tie"
    assert porter2_stem("cries") == "cri"
    assert porter2_stem("gas") == "gas"
    assert porter2_stem("gaps") == "gap"
    assert porter2_stem("kiwis") == "kiwi"
    assert porter2_stem("this") == "this"
    # step 0 possessives
    assert porter2_stem("dog's") == "dog"
    assert porter2_stem("dogs'") == "dog"


def test_porter2_step1b():
    assert porter2_stem("agreed") == "agre"  # eed->ee in R1, then step-5 e
    assert porter2_stem("succeed") == "succeed"  # succ/proc/exc guard
    assert porter2_stem("succeeded") == "succeed"
    assert porter2_stem("proceed") == "proceed"
    assert porter2_stem("exceed") == "exceed"
    assert porter2_stem("bled") == "bled"  # no vowel before suffix
    assert porter2_stem("sing") == "sing"
    assert porter2_stem("motoring") == "motor"
    assert porter2_stem("conflated") == "conflat"  # at+e, then step-5 e
    assert porter2_stem("troubling") == "troubl"
    assert porter2_stem("sized") == "size"  # short stem keeps its e
    assert porter2_stem("hopping") == "hop"  # double collapse
    assert porter2_stem("hoping") == "hope"  # short word gains e
    assert porter2_stem("adding") == "add"  # 3.0: [aeo]+double keeps double
    assert porter2_stem("scanning") == "scan"
    # 3.0 ing-invariants (old exception2 list)
    for inv in ("inning", "outing", "canning", "evening", "earring", "herring"):
        assert porter2_stem(inv) == inv
    # 3.0 C+ying -> C+ie
    assert porter2_stem("dying") == "die"
    assert porter2_stem("lying") == "lie"
    assert porter2_stem("tying") == "tie"
    assert porter2_stem("flying") == "fli"
    assert porter2_stem("saying") == "say"
    assert porter2_stem("crying") == "cri"


def test_porter2_step1c():
    assert porter2_stem("cry") == "cri"
    assert porter2_stem("say") == "say"
    assert porter2_stem("by") == "by"


def test_porter2_steps2to5():
    assert porter2_stem("relational") == "relat"
    assert porter2_stem("generously") == "generous"  # gener R1 prefix
    assert porter2_stem("generate") == "generat"
    assert porter2_stem("communism") == "communism"  # commun R1 prefix
    assert porter2_stem("quickly") == "quick"  # valid li-ending
    assert porter2_stem("biologist") == "biolog"  # 3.0 ogist->og
    assert porter2_stem("geologist") == "geolog"
    assert porter2_stem("demonstrative") == "demonstr"  # ative in R2
    assert porter2_stem("controlling") == "control"
    assert porter2_stem("rolls") == "roll"  # ll not in R2
    assert porter2_stem("nationalism") == "nation"
    # "organ" is a 3.0 R1 prefix: R2 starts after "iz", so step 4 keeps
    # "ize" and step 5 strips only the e (classic porter2 gave "organ")
    assert porter2_stem("organization") == "organiz"


def test_porter2_y_marking():
    # y after vowel is consonant-marked: toying -> toy (not toi)
    assert porter2_stem("toying") == "toy"
    assert porter2_stem("enjoying") == "enjoy"
    assert porter2_stem("yearly") == "year"  # step-2 li after valid r
    # no uppercase Y ever leaks
    for w in ("yearly", "toying", "dying", "boyhood", "saying"):
        assert "Y" not in porter2_stem(w)


def test_scandinavian_fold():
    f = make_term_filter("scandinavian_fold")
    # the reference javadoc's own equivalence examples
    for v in ("blåbærsyltetøj", "blåbärsyltetöj", "blaabaarsyltetoej", "blabarsyltetoj"):
        assert f(v) == "blabarsyltetoj"
    for v in ("räksmörgås", "ræksmørgås", "ræksmörgaos", "raeksmoergaas", "raksmorgas"):
        assert f(v) == "raksmorgas"


def test_type_token_filter():
    drop_num = make_term_filter("type_token", types=["<NUM>"])
    assert drop_num("hello") == "hello"
    assert drop_num("42") is None
    keep_num = make_term_filter("type_token", types=["<NUM>"], use_whitelist=True)
    assert keep_num("hello") is None
    assert keep_num("42") == "42"


def test_stemmer_override():
    f = make_term_filter(
        "stemmer_override", rules={"mice": "mouse"}, then="porter"
    )
    assert f("mice") == "mouse"  # dictionary hit skips the stemmer
    assert f("running") == "run"  # non-hit flows to the stemmer


def test_keyword_marker_in_chain():
    a = CustomChainAnalyzer(
        filters=[("keyword_marker", {"words": ["running"]}), ("porter", {})]
    )
    assert a.map_term("running") == "running"  # protected
    assert a.map_term("jumping") == "jump"


def test_snowball_filter_and_analyzer():
    f = make_term_filter("snowball")
    assert f("running") == "run"
    a = make_analyzer("english_snowball")
    # stop words drop; possessive strips before stemming
    assert a.tokens("The dog's generously dying") == ["dog", "generous", "die"]
    assert a.normalize("generously") == "generous"


def _stream_counts(a, texts):
    vocab, tids, doc_ids, *_ = a._batch_token_stream(texts)
    out = {}
    for t, d in zip(tids, doc_ids):
        out.setdefault(int(d), []).append(vocab[int(t)])
    return out


def test_fingerprint_analyzer():
    a = make_analyzer("fingerprint")
    assert a.tokens("the quick brown fox and the lazy fox") == [
        "and brown fox lazy quick the"
    ]
    assert a.tokens("") == []
    # over-cap doc emits nothing
    small = make_analyzer("fingerprint", max_output_token_size=5)
    assert small.tokens("alpha beta") == []
    # batch stream agrees with per-doc tokens
    texts = ["b a c a", "z y", "", "dup dup dup"]
    per_doc = _stream_counts(a, texts)
    for i, t in enumerate(texts):
        assert per_doc.get(i, []) == a.tokens(t)
    # lengths: 1 for docs with output
    vocab, tids, doc_ids, positions, lengths, n_docs, _s, _e = a._batch_token_stream(
        texts
    )
    assert lengths.tolist() == [1, 1, 0, 1]
    assert positions.tolist() == [0, 0, 0]


def test_keyword_repeat_analyzer():
    a = make_analyzer("keyword_repeat")
    # "keys" stems to "key": both emitted; "key" emits once
    assert a.tokens("keys key") == ["keys", "key", "key"]
    vocab, tids, doc_ids, positions, lengths, n_docs, _s, _e = (
        a._batch_token_stream(["keys key"])
    )
    emitted = sorted(
        (vocab[int(t)], int(p)) for t, p in zip(tids, positions)
    )
    # stem rides position 0 (posInc 0 with the original)
    assert emitted == [("key", 0), ("key", 1), ("keys", 0)]
    # norm length counts originals only
    assert lengths.tolist() == [2]


def test_porter2_stream_end_to_end(tmp_path, ray_session):
    """english_snowball threads through build -> search like any analyzer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(
                    [
                        "running quickly through fields",
                        "the runner runs",
                        "ran fast",
                        "generously donated",
                        "a generous donation",
                        "nothing relevant here",
                    ]
                ),
            }
        ),
        str(corpus / "docs.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index_local(
        str(corpus), idx, analyzer="english_snowball", content_column="text",
        meta_columns=("doc_id",), docs_per_segment=3,
    )
    s = IndexSearcher(idx)
    # "running" and "runs" both stem to "run" (query side normalizes too)
    a = make_analyzer("english_snowball")
    assert {d for d, _ in s.search(TermQuery(a.normalize("running")), 10)} == {0, 1}
    # "generously" and "generous" meet at "generous"
    assert {d for d, _ in s.search(TermQuery(a.normalize("generously")), 10)} == {3, 4}


def test_synonym_graph_analyzer():
    from lucene_ray.analysis.analyzers import SynonymGraphAnalyzer

    a = SynonymGraphAnalyzer()
    # phrase contraction: "order by" inserts orderby; expansion: spark ->
    # fire storm (fire overlaps spark, storm squashes onto the next slot)
    assert a.tokens("sort order by key") == ["sort", "order", "by", "orderby", "key"]
    assert a.tokens("spark joins") == ["spark", "fire", "storm", "joins"]
    vocab, tids, doc_ids, positions, lengths, n_docs, _s, _e = (
        a._batch_token_stream(["sort order by key", "spark joins"])
    )
    emitted = sorted(
        (int(d), vocab[int(t)], int(p))
        for t, d, p in zip(tids, doc_ids, positions)
    )
    assert emitted == [
        (0, "by", 2),
        (0, "key", 3),
        (0, "order", 1),
        (0, "orderby", 1),  # posInc 0 at the phrase's first position
        (0, "sort", 0),
        (1, "fire", 0),  # overlaps spark
        (1, "joins", 1),
        (1, "spark", 0),
        (1, "storm", 1),  # flatten squash onto the next position
    ]
    # norm length: doc 0 has 4 originals (orderby is an overlap); doc 1 has
    # 2 originals + 1 posInc-1 tail (storm)
    assert lengths.tolist() == [4, 3]


def test_synonym_graph_phrase_search(tmp_path, ray_session):
    """The contracted synonym is phrase-searchable at the source position."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.search.spans import SpanNear, SpanTerm, span_matches_segment
    from lucene_ray.index.segment import SegmentReader

    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["full order by key scan", "order key by"]),
            }
        ),
        str(corpus / "d.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index_local(
        str(corpus), idx, analyzer="synonym_graph", content_column="text",
        meta_columns=("doc_id",), docs_per_segment=10,
        index_options="positions",
    )
    man = read_manifest(idx)
    r = SegmentReader(man["segments"][0]["dir"])
    # "full orderby key": the synonym rides position 1, adjacent to both
    q = SpanNear((SpanTerm("full"), SpanTerm("orderby"), SpanTerm("key")), slop=1, in_order=True)
    docs, _ = span_matches_segment(r, q)
    assert docs.tolist() == [0]


def test_synonym_graph_stream_differential():
    """Vectorized batch stream == slow per-doc walk, randomized."""
    import random

    from lucene_ray.analysis.analyzers import SynonymGraphAnalyzer

    rng = random.Random(7)
    words = ["order", "by", "spark", "key", "scan", "the"]
    a = SynonymGraphAnalyzer()
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12)))
        for _ in range(60)
    ]
    vocab, tids, doc_ids, positions, lengths, n_docs, _s, _e = (
        a._batch_token_stream(texts)
    )
    got = {}
    for t, d, p in zip(tids, doc_ids, positions):
        got.setdefault(int(d), []).append((vocab[int(t)], int(p)))

    for i, text in enumerate(texts):
        base = [w for w in text.split() if w]
        slow = []
        for j, w in enumerate(base):
            slow.append((w, j))
            if w == "spark":
                slow.append(("fire", j))
                slow.append(("storm", j + 1))
            if w == "by" and j > 0 and base[j - 1] == "order":
                slow.append(("orderby", j - 1))
        assert sorted(got.get(i, [])) == sorted(slow), text
        # norm length: originals + one per spark (the posInc-1 storm)
        want_len = len(base) + sum(1 for w in base if w == "spark")
        assert int(lengths[i]) == want_len, text


def test_synonym_graph_stop_word_gap_blocks_phrase():
    """A stop-word GAP between the phrase words blocks the rule in BOTH
    the python path and the batch stream (position adjacency, not list
    adjacency)."""
    from lucene_ray.analysis.analyzers import SynonymGraphAnalyzer

    a = SynonymGraphAnalyzer(stop_words=frozenset({"the"}))
    assert "orderby" not in a.tokens("order the by key")
    assert "orderby" in a.tokens("order by key")
    vocab, tids, *_ = a._batch_token_stream(["order the by key"])
    assert "orderby" not in {vocab[int(t)] for t in tids}
    # normalize goes through the scanner lowercase table (inherited), so
    # query terms match index terms for full-case-mapping characters:
    # U+0130 lowers to ONE codepoint (the table / Java semantics), while
    # str.lower() would emit i + combining dot and never match the index
    from lucene_ray.analysis.analyzers import StandardAnalyzer

    std = StandardAnalyzer()
    for cls in ("fingerprint", "keyword_repeat", "synonym_graph"):
        an = make_analyzer(cls)
        assert an.normalize("SPARK") == "spark"
        assert an.normalize("İstanbul") == std.normalize("İstanbul")
        assert len(an.normalize("İstanbul")) == len("İstanbul")
