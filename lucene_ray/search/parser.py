"""Mini query-string parser (reference demo/SearchFiles.java uses the
classic QueryParser; we implement the better-specified SimpleQueryParser
subset, queryparser/simple/SimpleQueryParser.java):

    spark join            -> SHOULD spark, SHOULD join
    +spark -join          -> MUST spark, MUST_NOT join
    "batch batch"         -> PhraseQuery (needs a positions index)
    "join order"~2        -> sloppy PhraseQuery (2-term, slop=2)
    wind*                 -> PrefixQuery; w?nd*w -> WildcardQuery
    merge~1               -> FuzzyQuery(max_edits=1); term~ -> max_edits=2
    /s.*k/                -> RegexpQuery
    [a TO b]              -> TermRangeQuery [a, b)  (simplification: upper
                             exclusive, matching our TermRangeQuery)

A single bare term parses to TermQuery; everything else becomes a
BooleanQuery of the clauses.  Terms are normalized through the analyzer
(Analyzer.normalize), like the reference parsers do.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    StoredFieldFilter,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<mod>[+-]?)
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | /(?P<regex>[^/]*)/
      | \[(?P<rlo>\S+)\s+TO\s+(?P<rhi>\S+)\]
      | (?P<word>[^\s"/\[\]]+)
    )
    """,
    re.VERBOSE,
)

_FUZZY_RE = re.compile(r"^(?P<body>.+?)~(?P<edits>\d?)$")


def parse_query(text: str, analyzer) -> Query | None:
    """Parse a query string; None for empty input."""
    clauses: list[BooleanClause] = []
    for m in _TOKEN_RE.finditer(text):
        occur = {"+": "MUST", "-": "MUST_NOT", "": "SHOULD"}[m.group("mod")]
        if m.group("phrase") is not None:
            words = tuple(
                analyzer.normalize(w) for w in m.group("phrase").split() if w
            )
            if not words:
                continue
            slop = int(m.group("slop")) if m.group("slop") else 0
            q: Query = (
                TermQuery(words[0])
                if len(words) == 1
                else PhraseQuery(words, slop=slop)
            )
        elif m.group("regex") is not None:
            q = RegexpQuery(m.group("regex"))
        elif m.group("rlo") is not None:
            lo = analyzer.normalize(m.group("rlo"))
            hi = analyzer.normalize(m.group("rhi"))
            q = TermRangeQuery(None if lo == "*" else lo, None if hi == "*" else hi)
        else:
            word = m.group("word")
            fz = _FUZZY_RE.match(word)
            if fz and "*" not in word and "?" not in word:
                edits = int(fz.group("edits")) if fz.group("edits") else 2
                q = FuzzyQuery(analyzer.normalize(fz.group("body")), edits)
            elif word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                q = PrefixQuery(analyzer.normalize(word[:-1]))
            elif "*" in word or "?" in word:
                q = WildcardQuery(analyzer.normalize(word))
            else:
                q = TermQuery(analyzer.normalize(word))
        clauses.append(BooleanClause(q, occur))
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0].occur == "SHOULD":
        return clauses[0].query
    return BooleanQuery(tuple(clauses))


# ---------------------------------------------------------------------------
# Classic query parser (reference queryparser/classic/QueryParser.jj):
# parentheses grouping, AND / OR / NOT (also && / || / !), +/- modifiers,
# ^boost on any atom, inclusive [a TO b] / exclusive {a TO b} ranges, plus
# every atom the simple parser supports.  Conjunction handling replicates
# QueryParserBase.addClause with default operator OR: AND promotes the
# PREVIOUS clause from SHOULD to MUST and makes the current clause MUST —
# so "a OR b AND c" parses to (a +b +c), the classic parser's documented
# behavior, not a precedence tree.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _Tok:
    kind: str
    val: object = None


_CLASSIC_LEX = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<field>[A-Za-z_]\w*):(?=\S)
  | "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
  | /(?P<regex>[^/]*)/
  | (?P<rlb>[\[{])(?P<rlo>[^\s\]}]+)\s+TO\s+(?P<rhi>[^\s\]}]+)(?P<rrb>[\]}])
  | (?P<word>[^\s()^"]+)
    """,
    re.VERBOSE,
)


_FN_START = re.compile(r"fn:[A-Za-z]+\(")


def _scan_fn_expr(text: str, pos: int) -> int | None:
    """End index of a balanced ``fn:name( ... )`` interval expression
    starting at pos (quotes shield parens), or None."""
    m = _FN_START.match(text, pos)
    if m is None:
        return None
    depth, i = 1, m.end()
    while i < len(text) and depth:
        c = text[i]
        if c == '"':
            j = text.find('"', i + 1)
            i = len(text) if j < 0 else j
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return i if depth == 0 else None


def _lex_classic(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        # StandardQueryParser interval expressions (StandardSyntaxParser
        # .jj IntervalExpr): one balanced fn:name(...) atom
        end = _scan_fn_expr(text, pos)
        if end is not None:
            toks.append(_Tok("fnexpr", text[pos:end]))
            pos = end
            continue
        m = _CLASSIC_LEX.match(text, pos)
        if m is None:  # unlexable char (stray bracket/quote): skip it
            pos += 1
            continue
        pos = m.end()
        if m.group("ws"):
            continue
        for kind in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
            if m.group(kind):
                toks.append(_Tok(kind))
                break
        else:
            if m.group("field"):
                toks.append(_Tok("field", m.group("field")))
            elif m.group("boost"):
                toks.append(_Tok("boost", float(m.group("bval"))))
            elif m.group("phrase") is not None:
                toks.append(
                    _Tok("phrase", (m.group("phrase"), int(m.group("slop") or 0)))
                )
            elif m.group("regex") is not None:
                toks.append(_Tok("regex", m.group("regex")))
            elif m.group("rlo") is not None:
                toks.append(
                    _Tok(
                        "range",
                        (
                            m.group("rlo"),
                            m.group("rhi"),
                            m.group("rlb") == "[",  # include_lower
                            m.group("rrb") == "]",  # include_upper
                        ),
                    )
                )
            else:
                toks.append(_Tok("word", m.group("word")))
    return toks


def _word_query(word: str, analyzer) -> Query:
    """Classify a bare word atom (shared with the simple parser rules)."""
    fz = _FUZZY_RE.match(word)
    if fz and "*" not in word and "?" not in word:
        edits = int(fz.group("edits")) if fz.group("edits") else 2
        return FuzzyQuery(analyzer.normalize(fz.group("body")), edits)
    if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
        return PrefixQuery(analyzer.normalize(word[:-1]))
    if "*" in word or "?" in word:
        return WildcardQuery(analyzer.normalize(word))
    return TermQuery(analyzer.normalize(word))


def _parse_group(
    toks: list[_Tok],
    i: int,
    analyzer,
    default_field: str = "text",
    stored_fields: tuple[str, ...] = (),
    scope: str | None = None,
) -> tuple[Query | None, int]:
    """Parse clauses until RPAREN/end; returns (query, index past group).

    Field scoping (QueryParserBase.getFieldQuery semantics):
    ``field:atom`` routes the atom — the default field parses normally,
    a name in ``stored_fields`` becomes a constant-score
    StoredFieldFilter on that metadata column (word and phrase atoms;
    the value is taken verbatim), and an unknown field is LENIENTLY
    treated as the default field.  ``field:(a OR b)`` scopes every atom
    in the group to ``field`` (classic grouped-field syntax); an inner
    ``other:`` prefix overrides the scope for its own atom."""
    clauses: list[BooleanClause] = []
    conj: str | None = None
    mod: str | None = None
    field: str | None = None
    while i < len(toks):
        t = toks[i]
        if t.kind == "rparen":
            i += 1
            break
        if t.kind == "and":
            conj = "AND"
            i += 1
            continue
        if t.kind == "or":
            conj = "OR"
            i += 1
            continue
        if t.kind in ("not", "minus"):
            mod = "MUST_NOT"
            i += 1
            continue
        if t.kind == "plus":
            mod = "MUST"
            i += 1
            continue
        if t.kind == "field":
            field = t.val
            i += 1
            continue
        if t.kind == "boost":  # stray boost with no preceding atom
            i += 1
            continue

        # --- atom ---
        eff_field = field if field is not None else scope
        q: Query | None
        if t.kind == "word" and eff_field in stored_fields:
            q = StoredFieldFilter(eff_field, t.val)
            i += 1
        elif t.kind == "phrase" and eff_field in stored_fields:
            q = StoredFieldFilter(eff_field, t.val[0])
            i += 1
        elif t.kind == "lparen":
            q, i = _parse_group(
                toks, i + 1, analyzer, default_field, stored_fields, scope=eff_field
            )
        elif t.kind == "phrase":
            raw, slop = t.val
            words = tuple(analyzer.normalize(w) for w in raw.split() if w)
            q = (
                None
                if not words
                else TermQuery(words[0])
                if len(words) == 1
                else PhraseQuery(words, slop=slop)
            )
            i += 1
        elif t.kind == "regex":
            q = RegexpQuery(t.val)
            i += 1
        elif t.kind == "fnexpr":
            # flexible-parser interval clause -> IntervalQuery scored by
            # the saturation function (StandardQueryParser's
            # IntervalQueryNode lowering)
            from .intervals import freeze, parse_fn
            from .query import IntervalQuery

            q = IntervalQuery(freeze(parse_fn(t.val)))
            i += 1
        elif t.kind == "range":
            lo, hi, inc_lo, inc_hi = t.val
            lo = analyzer.normalize(lo)
            hi = analyzer.normalize(hi)
            q = TermRangeQuery(
                None if lo == "*" else lo,
                None if hi == "*" else hi,
                include_lower=inc_lo,
                include_upper=inc_hi,
            )
            i += 1
        else:  # word
            q = _word_query(t.val, analyzer)
            i += 1

        if i < len(toks) and toks[i].kind == "boost" and q is not None:
            q = BoostQuery(q, float(toks[i].val))
            i += 1

        if q is None:  # empty group / empty phrase
            conj = None
            mod = None
            field = None
            continue

        # QueryParserBase.addClause (default operator OR)
        if conj == "AND" and clauses and clauses[-1].occur == "SHOULD":
            clauses[-1] = BooleanClause(clauses[-1].query, "MUST")
        occur = mod if mod else ("MUST" if conj == "AND" else "SHOULD")
        clauses.append(BooleanClause(q, occur))
        conj = None
        mod = None
        field = None

    if not clauses:
        return None, i
    if len(clauses) == 1 and clauses[0].occur == "SHOULD":
        return clauses[0].query, i
    return BooleanQuery(tuple(clauses)), i


def parse_classic(
    text: str,
    analyzer,
    default_field: str = "text",
    stored_fields: tuple[str, ...] = (),
) -> Query | None:
    """Classic-QueryParser-style parse; None for empty/blank input.

    ``field:"a phrase"~2^3`` parses to a boosted sloppy PhraseQuery on the
    default field; ``lang:en`` (with ``stored_fields=("lang",)``) to a
    constant-score metadata filter (reference
    queryparser/classic/QueryParserBase.java field handling)."""
    q, _ = _parse_group(_lex_classic(text), 0, analyzer, default_field, stored_fields)
    return q


def _prec_atom(
    toks: list[_Tok],
    i: int,
    analyzer,
    default_field: str,
    stored_fields: tuple[str, ...],
    scope: str | None,
) -> tuple[Query | None, int]:
    """One atom (word/phrase/range/regex/fn/group, optional field prefix
    and trailing boost) for the precedence parser — same atom semantics
    as _parse_group, without its clause accumulation."""
    field: str | None = None
    if i < len(toks) and toks[i].kind == "field":
        field = toks[i].val
        i += 1
    if i >= len(toks):
        return None, i
    eff_field = field if field is not None else scope
    t = toks[i]
    q: Query | None
    if t.kind == "word" and eff_field in stored_fields:
        q = StoredFieldFilter(eff_field, t.val)
        i += 1
    elif t.kind == "phrase" and eff_field in stored_fields:
        q = StoredFieldFilter(eff_field, t.val[0])
        i += 1
    elif t.kind == "lparen":
        q, i = _prec_or(toks, i + 1, analyzer, default_field, stored_fields, eff_field)
        if i < len(toks) and toks[i].kind == "rparen":
            i += 1
    elif t.kind == "phrase":
        raw, slop = t.val
        words = tuple(analyzer.normalize(w) for w in raw.split() if w)
        q = (
            None
            if not words
            else TermQuery(words[0])
            if len(words) == 1
            else PhraseQuery(words, slop=slop)
        )
        i += 1
    elif t.kind == "regex":
        q = RegexpQuery(t.val)
        i += 1
    elif t.kind == "fnexpr":
        from .intervals import freeze, parse_fn
        from .query import IntervalQuery

        q = IntervalQuery(freeze(parse_fn(t.val)))
        i += 1
    elif t.kind == "range":
        lo, hi, inc_lo, inc_hi = t.val
        lo = analyzer.normalize(lo)
        hi = analyzer.normalize(hi)
        q = TermRangeQuery(
            None if lo == "*" else lo,
            None if hi == "*" else hi,
            include_lower=inc_lo,
            include_upper=inc_hi,
        )
        i += 1
    elif t.kind == "word":
        q = _word_query(t.val, analyzer)
        i += 1
    else:  # stray operator/rparen: no atom here
        return None, i
    if i < len(toks) and toks[i].kind == "boost" and q is not None:
        q = BoostQuery(q, float(toks[i].val))
        i += 1
    return q, i


def _prec_unary(toks, i, analyzer, default_field, stored_fields, scope):
    mod: str | None = None
    while i < len(toks) and toks[i].kind in ("not", "minus", "plus"):
        mod = "MUST" if toks[i].kind == "plus" else "MUST_NOT"
        i += 1
    q, i = _prec_atom(toks, i, analyzer, default_field, stored_fields, scope)
    return (None if q is None else (q, mod)), i


def _prec_and(toks, i, analyzer, default_field, stored_fields, scope):
    items: list[tuple[Query, str | None]] = []
    while True:
        j = i
        item, i = _prec_unary(toks, i, analyzer, default_field, stored_fields, scope)
        if item is not None:
            items.append(item)
        elif i == j:  # no progress (stray token): skip it unless structural
            if i < len(toks) and toks[i].kind not in ("rparen", "or", "and"):
                i += 1
                continue
        if i < len(toks) and toks[i].kind == "and":
            i += 1
            continue
        break
    if not items:
        return None, i
    if len(items) == 1:
        return items[0], i
    clauses = tuple(
        BooleanClause(q, "MUST_NOT" if mod == "MUST_NOT" else "MUST")
        for q, mod in items
    )
    return (BooleanQuery(clauses), None), i


def _prec_or(toks, i, analyzer, default_field, stored_fields, scope):
    items: list[tuple[Query, str | None]] = []
    while i < len(toks) and toks[i].kind != "rparen":
        j = i
        item, i = _prec_and(toks, i, analyzer, default_field, stored_fields, scope)
        if item is not None:
            items.append(item)
        if i < len(toks) and toks[i].kind == "or":
            i += 1
        if i == j:  # safety: never loop without consuming
            i += 1
    if not items:
        return None, i
    if len(items) == 1:
        q, mod = items[0]
        if mod == "MUST_NOT":
            return BooleanQuery((BooleanClause(q, "MUST_NOT"),)), i
        return q, i
    clauses = tuple(BooleanClause(q, mod or "SHOULD") for q, mod in items)
    return BooleanQuery(clauses), i


def parse_precedence(
    text: str,
    analyzer,
    default_field: str = "text",
    stored_fields: tuple[str, ...] = (),
) -> Query | None:
    """PrecedenceQueryParser (reference queryparser/flexible/precedence/
    PrecedenceQueryParser.java + processors/BooleanModifiersQueryNode
    Processor.java): the classic syntax but with real operator
    precedence — AND binds tighter than OR, so ``a AND b OR c AND d``
    parses as ``(+a +b) (+c +d)`` where the classic parser's addClause
    state machine would produce a flat ``+a +b +c +d``.  Juxtaposition is
    the default operator (OR); NOT/!/- mark MUST_NOT inside their
    AND-group, bare ``+`` marks MUST at the OR level.  Golden shapes per
    TestPrecedenceQueryParser.java:209-260,607-650."""
    q, _ = _prec_or(_lex_classic(text), 0, analyzer, default_field, stored_fields, None)
    return q


def rewrite_complex_phrases(q, searcher, max_expansions: int = 64):
    """ComplexPhraseQueryParser semantics (reference queryparser/
    complexPhrase/ComplexPhraseQueryParser.java): wildcard / prefix atoms
    INSIDE a quoted phrase expand against the index dictionary into
    MultiPhraseQuery slot alternatives — ``"wind* turbine"`` matches any
    wind-prefixed term followed by turbine.

    Walks a parsed query tree; any PhraseQuery whose words contain ``*`` or
    ``?`` is rewritten to a MultiPhraseQuery whose slot alternatives are
    the dictionary terms matching the pattern (union over the searcher's
    segments, capped at ``max_expansions`` per slot in sorted term order —
    the BooleanQuery.maxClauseCount analogue).  Slop is not supported by
    the reference's rewrite for multi-slot wildcards either; a wildcarded
    sloppy phrase raises."""
    import fnmatch as _fn

    from .query import (
        BooleanClause,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        MultiPhraseQuery,
        PhraseQuery,
    )

    def expand_slot(word: str) -> tuple[str, ...]:
        if "*" not in word and "?" not in word:
            return (word,)
        m = re.search(r"[*?]", word)
        lit = word[: m.start()]
        rx = re.compile(_fn.translate(word))
        out: set[str] = set()
        for r in searcher.readers:
            lo = lit.encode("utf-8")
            hi = lo + b"\xff\xff\xff\xff"
            for tid in r.term_id_range(lo, hi):
                t = r.term_string(tid)
                if rx.match(t):
                    out.add(t)
        return tuple(sorted(out, key=lambda s: s.encode("utf-8"))[:max_expansions])

    def walk(node):
        if isinstance(node, PhraseQuery) and any(
            "*" in w or "?" in w for w in node.terms
        ):
            if node.slop:
                raise ValueError("wildcarded phrases do not support slop")
            slots = tuple(expand_slot(w) for w in node.terms)
            if any(not s for s in slots):
                # a slot with zero dictionary matches can never match
                return None
            return MultiPhraseQuery(slots)
        if isinstance(node, BoostQuery):
            inner = walk(node.query)
            return None if inner is None else BoostQuery(inner, node.boost)
        if isinstance(node, ConstantScoreQuery):
            inner = walk(node.query)
            return None if inner is None else ConstantScoreQuery(inner)
        if isinstance(node, BooleanQuery):
            clauses = []
            for c in node.clauses:
                inner = walk(c.query)
                if inner is None:
                    if c.occur in ("MUST", "FILTER"):
                        return None  # unsatisfiable required clause
                    continue  # dropped SHOULD / MUST_NOT of nothing
                clauses.append(BooleanClause(inner, c.occur))
            if not clauses:
                return None
            return BooleanQuery(tuple(clauses), node.min_should_match)
        return node

    return walk(q)


def expand_query_synonyms(q, synonyms: dict[str, list[str]], analyzer=None):
    """Query-time synonym-graph expansion (reference util/QueryBuilder.java
    analyzeGraphBoolean — the path QueryParser takes when the query
    analyzer contains a SynonymGraphFilter):

    - a TermQuery whose term has only SINGLE-token synonym members becomes
      ONE SynonymQuery over {term} ∪ members (blended stats, the
      single-position graph case);
    - MULTI-token members ("ml" -> "machine learning") become graph PATHS:
      a SHOULD disjunction of the single-token SynonymQuery/TermQuery and
      one PhraseQuery per multi-token member.

    Walks Boolean/Boost/ConstantScore trees; ``analyzer`` (optional)
    normalizes member tokens like the index side would."""
    from .query import (
        BooleanClause,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )

    def norm(w: str) -> str:
        return analyzer.normalize(w) if analyzer is not None else w

    def expand_term(term: str):
        members = synonyms.get(term)
        if not members:
            return TermQuery(term)
        singles = [term]
        phrases = []
        for m in members:
            toks = tuple(norm(w) for w in m.split())
            if len(toks) == 1:
                singles.append(toks[0])
            else:
                phrases.append(PhraseQuery(toks))
        single_q = (
            TermQuery(singles[0])
            if len(singles) == 1
            else SynonymQuery(tuple(singles))
        )
        if not phrases:
            return single_q
        return BooleanQuery(
            tuple(BooleanClause(sub, "SHOULD") for sub in [single_q, *phrases])
        )

    def walk(node):
        if isinstance(node, TermQuery):
            return expand_term(node.term)
        if isinstance(node, BoostQuery):
            return BoostQuery(walk(node.query), node.boost)
        if isinstance(node, ConstantScoreQuery):
            return ConstantScoreQuery(walk(node.query))
        if isinstance(node, BooleanQuery):
            return BooleanQuery(
                tuple(BooleanClause(walk(c.query), c.occur) for c in node.clauses),
                node.min_should_match,
            )
        return node

    return walk(q)


# ---------------------------------------------------------------------------
# SimpleQueryParser (reference queryparser/simple/SimpleQueryParser.java):
# the lenient end-user syntax — NEVER raises on any input.  Operators:
# + (AND), | (OR), - (NOT), "..." (phrase, ~N near), * (trailing prefix),
# ~N (term fuzziness), (...) (precedence), \ escapes + | " ( ) ' \ and
# whitespace.  Each can be disabled via the ``flags`` bitmask.  Operator
# association is the reference's right-to-left state machine: a change of
# operation wraps the current tree in a new parent node, so
# ``a | b + c`` evaluates (a OR b) AND c.
# ---------------------------------------------------------------------------

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = (" ", "\t", "\n", "\r")


class _SimpleState:
    __slots__ = ("data", "index", "length", "top", "prev_op", "cur_op", "not_")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: Query | None = None
        self.prev_op: str | None = None
        self.cur_op: str | None = None
        self.not_ = 0


class SimpleQueryParser:
    """Single-field form of the reference parser (our index has one text
    field); ``parse`` returns None for input that matches nothing (the
    MatchNoDocsQuery analogue) and MatchAllDocsQuery for ``*``."""

    def __init__(self, analyzer, flags: int = ALL_OPERATORS,
                 default_operator: str = "SHOULD"):
        self.analyzer = analyzer
        self.flags = flags
        self.default_operator = default_operator

    # --- factory methods (newDefaultQuery / newFuzzyQuery / ...) ---------

    def _default_query(self, text: str) -> Query | None:
        words = [w for w in self.analyzer.tokens(text) if w]
        if not words:
            return None
        if len(words) == 1:
            return TermQuery(words[0])
        return BooleanQuery(
            tuple(BooleanClause(TermQuery(w), self.default_operator) for w in words)
        )

    def _phrase_query(self, text: str, slop: int) -> Query | None:
        words = [w for w in self.analyzer.tokens(text) if w]
        if not words:
            return None
        if len(words) == 1:
            return TermQuery(words[0])
        return PhraseQuery(tuple(words), slop=slop)

    def _fuzzy_query(self, text: str, fuzziness: int) -> Query:
        return FuzzyQuery(self.analyzer.normalize(text), min(fuzziness, 2))

    def _prefix_query(self, text: str) -> Query:
        return PrefixQuery(self.analyzer.normalize(text))

    # --- the state machine ------------------------------------------------

    def parse(self, text: str) -> Query | None:
        from .query import MatchAllDocsQuery

        if text.strip() == "*":
            return MatchAllDocsQuery()
        st = _SimpleState(text, 0, len(text))
        self._parse_sub(st)
        return st.top

    def _parse_sub(self, st: _SimpleState) -> None:
        f = self.flags
        while st.index < st.length:
            c = st.data[st.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_sub(st)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                st.index += 1  # extraneous, ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(st)
            elif c == "+" and f & AND_OPERATOR:
                if st.cur_op is None and st.top is not None:
                    st.cur_op = "MUST"
                st.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if st.cur_op is None and st.top is not None:
                    st.cur_op = "SHOULD"
                st.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                st.not_ += 1
                st.index += 1
                continue  # keep the not count across consecutive '-'
            elif c in _WS and f & WHITESPACE_OPERATOR:
                st.index += 1
            else:
                self._consume_token(st)
            st.not_ = 0

    def _consume_sub(self, st: _SimpleState) -> None:
        start = st.index = st.index + 1
        precedence = 1
        escaped = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing paren: '(' is extraneous
        elif st.index == start:
            st.cur_op = None  # empty () resets the pending operation
            st.index += 1
        else:
            sub = _SimpleState(st.data, start, st.index)
            self._parse_sub(sub)
            self._build_tree(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _SimpleState) -> None:
        start = st.index = st.index + 1
        buf: list[str] = []
        escaped = False
        has_slop = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if c == '"':
                    if (
                        st.length > st.index + 1
                        and st.data[st.index + 1] == "~"
                        and self.flags & NEAR_OPERATOR
                    ):
                        st.index += 1
                        if st.length > st.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(c)
            st.index += 1
        if st.index == st.length:
            st.index = start  # unterminated: opening quote is extraneous
        elif not buf:
            st.cur_op = None
            st.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build_tree(st, self._phrase_query(phrase, slop))
            st.index += 1

    def _consume_token(self, st: _SimpleState) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and c == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and bool(self.flags & PREFIX_OPERATOR)
            escaped = False
            buf.append(c)
            st.index += 1
        if buf:
            if fuzzy:
                token = "".join(buf)
                fuzziness = self._parse_fuzziness(st)
                branch = (
                    self._default_query(token)
                    if fuzziness == 0
                    else self._fuzzy_query(token, fuzziness)
                )
            elif prefix:
                branch = self._prefix_query("".join(buf[:-1]))
            else:
                branch = self._default_query("".join(buf))
            self._build_tree(st, branch)

    def _parse_fuzziness(self, st: _SimpleState) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        digits: list[str] = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st):
                    break
                digits.append(st.data[st.index])
        s = "".join(digits)
        if not s:
            return 2  # bare ~ = automatic fuzziness
        try:
            return max(int(s), 0)
        except ValueError:
            return 0

    def _token_finished(self, st: _SimpleState) -> bool:
        c = st.data[st.index]
        f = self.flags
        return bool(
            (c == '"' and f & PHRASE_OPERATOR)
            or (c == "|" and f & OR_OPERATOR)
            or (c == "+" and f & AND_OPERATOR)
            or (c in "()" and f & PRECEDENCE_OPERATORS)
            or (c in _WS and f & WHITESPACE_OPERATOR)
        )

    def _build_tree(self, st: _SimpleState, branch: Query | None) -> None:
        from .query import MatchAllDocsQuery

        if branch is None:
            return
        if st.not_ % 2 == 1:
            branch = BooleanQuery(
                (
                    BooleanClause(branch, "MUST_NOT"),
                    BooleanClause(MatchAllDocsQuery(), "SHOULD"),
                )
            )
        if st.top is None:
            st.top = branch
        else:
            if st.cur_op is None:
                st.cur_op = self.default_operator
            if st.prev_op != st.cur_op:
                # operation change: wrap the current tree in a new parent
                st.top = BooleanQuery((BooleanClause(st.top, st.cur_op),))
            assert isinstance(st.top, BooleanQuery)
            st.top = BooleanQuery(
                st.top.clauses + (BooleanClause(branch, st.cur_op),),
                min_should_match=st.top.min_should_match,
            )
            st.prev_op = st.cur_op
        st.cur_op = None


def parse_simple(
    text: str,
    analyzer,
    flags: int = ALL_OPERATORS,
    default_operator: str = "SHOULD",
) -> Query | None:
    """SimpleQueryParser.parse — lenient, never raises; None means the
    MatchNoDocsQuery analogue (nothing parsed)."""
    return SimpleQueryParser(analyzer, flags, default_operator).parse(text)
