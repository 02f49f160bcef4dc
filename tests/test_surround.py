"""Surround query language: parser shapes, error cases, brute-force parity.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/surround
(QueryParser.jj grammar; query/DistanceQuery lowered via SpanNearClauseFactory
to SpanNearQuery with slop = distance - 1)."""

from __future__ import annotations

import fnmatch
import re

import pytest

from lucene_ray.analysis.analyzers import make_analyzer
from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.manifest import read_manifest
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.surround import (
    SBool,
    SProx,
    STerm,
    SurroundError,
    parse_surround,
    surround_matches_segment,
)


@pytest.fixture(scope="module")
def sur_idx(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sur_corpus")
    pq.write_table(generate_corpus(250, seed=23), str(d / "c.parquet"), row_group_size=64)
    out = str(tmp_path_factory.mktemp("sur_idx"))
    build_index_local(str(d), out, docs_per_segment=64, index_options="positions")
    return out


# --- parser ----------------------------------------------------------------


def test_parse_shapes():
    assert parse_surround("a AND b") == SBool("and", (STerm("a"), STerm("b")))
    assert parse_surround("a OR b OR c") == SBool(
        "or", (SBool("or", (STerm("a"), STerm("b"))), STerm("c"))
    )
    # precedence: OR < AND < NOT < W/N
    assert parse_surround("a OR b AND c") == SBool(
        "or", (STerm("a"), SBool("and", (STerm("b"), STerm("c"))))
    )
    assert parse_surround("a AND b NOT c") == SBool(
        "and", (STerm("a"), SBool("not", (STerm("b"), STerm("c"))))
    )
    assert parse_surround("a AND b 3W c") == SBool(
        "and", (STerm("a"), SProx(3, True, (STerm("b"), STerm("c"))))
    )
    # default distance 1; infix chains flatten; prefix form
    assert parse_surround("a W b W c") == SProx(1, True, (STerm("a"), STerm("b"), STerm("c")))
    assert parse_surround("4N(a, b, c)") == SProx(4, False, (STerm("a"), STerm("b"), STerm("c")))
    assert parse_surround("AND(a, b, c)") == SBool(
        "and", (SBool("and", (STerm("a"), STerm("b"))), STerm("c"))
    )
    # grouping beats precedence
    assert parse_surround("(a OR b) 2N c") == SProx(
        2, False, (SBool("or", (STerm("a"), STerm("b"))), STerm("c"))
    )
    # operator names are case-insensitive
    assert parse_surround("a and b") == parse_surround("a AND b")
    assert parse_surround("a 3w b") == parse_surround("a 3W b")


def test_parse_errors():
    for bad in ["", "a AND", "(a OR b", "a )", "NOT(a)", "NOT(a, b, c)",
                "3W(a)", "0W(a, b)", "a 0N b", "a, b"]:
        with pytest.raises(SurroundError):
            parse_surround(bad)


def test_analyzer_normalization():
    a = make_analyzer("standard")
    q = parse_surround("DEF 3W Return", analyzer=a)
    assert q == SProx(3, True, (STerm("def"), STerm("return")))
    # truncated terms keep their case path out of normalize (expanded at eval)
    q2 = parse_surround("Ret* AND def", analyzer=a)
    assert q2.children[0] == STerm("Ret*")


# --- brute-force oracle ------------------------------------------------------


def _positions(toks: list[str], node) -> list[int] | None:
    """Per-doc match positions for a term/OR-of-terms node (None = no node
    support here)."""
    if isinstance(node, STerm):
        if "*" in node.text or "?" in node.text:
            rx = re.compile(fnmatch.translate(node.text))
            return [i for i, t in enumerate(toks) if rx.match(t)]
        return [i for i, t in enumerate(toks) if t == node.text]
    if isinstance(node, SBool) and node.op == "or":
        a = _positions(toks, node.children[0])
        b = _positions(toks, node.children[1])
        return sorted(set(a) | set(b))
    return None


def _brute_match(toks: list[str], node) -> bool:
    if isinstance(node, STerm):
        return bool(_positions(toks, node))
    if isinstance(node, SProx):
        childpos = [_positions(toks, c) for c in node.children]
        if any(not p for p in childpos):
            return False
        k = len(childpos)
        win = k + node.dist - 1
        if node.ordered:
            # exists strictly increasing chain within the window
            import itertools

            def chain(prev: int, rest: list[list[int]], start: int) -> bool:
                if not rest:
                    return True
                for p in rest[0]:
                    if p > prev and p - start + 1 <= win and chain(p, rest[1:], start):
                        return True
                return False

            return any(chain(p0, childpos[1:], p0) for p0 in childpos[0])
        import itertools

        for combo in itertools.product(*childpos):
            if max(combo) - min(combo) + 1 <= win:
                return True
        return False
    assert isinstance(node, SBool)
    a = _brute_match(toks, node.children[0])
    b = _brute_match(toks, node.children[1])
    return {"and": a and b, "or": a or b, "not": a and not b}[node.op]


QUERIES = [
    "def AND return",
    "def OR class",
    "def NOT class",
    "def 3W return",
    "def W return",
    "return 4N class",
    "3N(def, return, import)",
    "ret* AND def",
    "(def OR class) 5N return",
    "def AND (class OR imp*)",
    "2W(def, ret*)",
]


def test_surround_brute_parity(sur_idx):
    texts = generate_corpus(250, seed=23).column("content").to_pylist()
    a = make_analyzer("standard")
    tok_docs = [a.tokens(t) for t in texts]
    man = read_manifest(sur_idx)
    readers = [(SegmentReader(s["dir"]), s["doc_base"]) for s in man["segments"]]
    for qs in QUERIES:
        q = parse_surround(qs, analyzer=a)
        got = set()
        for r, base in readers:
            docs, _ = surround_matches_segment(r, q)
            got.update(int(d) + base for d in docs)
        expected = {i for i, toks in enumerate(tok_docs) if _brute_match(toks, q)}
        assert got == expected, qs


def test_distance_rejects_bool_child(sur_idx):
    man = read_manifest(sur_idx)
    r = SegmentReader(man["segments"][0]["dir"])
    q = parse_surround("(def AND class) 3N return")
    with pytest.raises(SurroundError, match="distance"):
        surround_matches_segment(r, q)


def test_minimal_interval_counts(sur_idx):
    """n for a plain term = its match-position count (each position is a
    [p, p] interval, all minimal)."""
    man = read_manifest(sur_idx)
    texts = generate_corpus(250, seed=23).column("content").to_pylist()
    a = make_analyzer("standard")
    q = parse_surround("def")
    for seg in man["segments"]:
        r = SegmentReader(seg["dir"])
        docs, n = surround_matches_segment(r, q)
        for d, c in zip(docs, n):
            toks = a.tokens(texts[int(d) + seg["doc_base"]])
            assert c == toks.count("def")
