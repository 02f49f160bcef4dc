"""Expressions module: compiled arithmetic over stored fields and _score.

Reference: lucene/expressions — JavascriptCompiler compiles strings like
``"ln(1 + popularity) * _score"`` into a DoubleValuesSource used for
ranking (expressions/js/JavascriptCompiler.java; Expression.getDoubleValuesSource).
Ours is a small recursive-descent parser over the same surface we need
(+ - * / unary-, parentheses, number literals, identifiers = stored
numeric fields or ``_score``, functions ln/log10/sqrt/abs/min/max/pow)
compiled to a closure evaluating VECTORIZED over numpy arrays — the
per-batch shape every scorer path here uses, rather than per-doc calls.

Evaluation is float64 throughout with one float32 cast at the ranking
boundary, the same documented deviation as the other scorers.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)|(?P<id>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[()+\-*/,]))"
)

def _haversin_km(lat1, lon1, lat2, lon2):
    """ExpressionMath.haversinKilometers — exact great-circle haversine
    on the mean earth radius (DEVIATION: the reference routes through
    SloppyMath's table-approximated trig, error <= 40cm; we use exact
    libm trig)."""
    to_rad = np.pi / 180.0
    dlat = (lat2 - lat1) * to_rad * 0.5
    dlon = (lon2 - lon1) * to_rad * 0.5
    sk = (
        np.sin(dlat) * np.sin(dlat)
        + np.cos(lat1 * to_rad) * np.cos(lat2 * to_rad) * np.sin(dlon) * np.sin(dlon)
    )
    return 6371008.7714 * 2.0 * np.arcsin(np.sqrt(sk)) / 1000.0


# the full expressions/js/javascript.properties function table (27
# entries); logn(base, x) follows MathUtil.log's argument order
_FUNCS = {
    "ln": np.log,
    "log10": np.log10,
    "logn": lambda base, x: np.log(x) / np.log(base),
    "sqrt": np.sqrt,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
    "floor": np.floor,
    "ceil": np.ceil,
    "exp": np.exp,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "asin": np.arcsin,
    "acos": np.arccos,
    "atan": np.arctan,
    "atan2": np.arctan2,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "asinh": np.arcsinh,
    "acosh": np.arccosh,
    "atanh": np.arctanh,
    "haversin": _haversin_km,
}
_FUNC_ARITY = {
    "ln": 1, "log10": 1, "logn": 2, "sqrt": 1, "abs": 1, "min": 2, "max": 2,
    "pow": 2, "floor": 1, "ceil": 1, "exp": 1, "sin": 1, "cos": 1, "tan": 1,
    "asin": 1, "acos": 1, "atan": 1, "atan2": 2, "sinh": 1, "cosh": 1,
    "tanh": 1, "asinh": 1, "acosh": 1, "atanh": 1, "haversin": 4,
}


class ExpressionError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ExpressionError(f"bad token at {src[pos:]!r}")
            break
        pos = m.end()
        for kind in ("num", "id", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("end", ""))
    return out


class Expression:
    """A compiled expression: ``variables`` is the set of field names it
    reads (minus _score); ``evaluate(bindings)`` takes a dict of numpy
    arrays (and/or scalars) and returns a float64 array."""

    def __init__(self, source: str):
        self.source = source
        self._toks = _tokenize(source)
        self._pos = 0
        self._ast = self._expr()
        if self._peek() != ("end", ""):
            raise ExpressionError(f"trailing input at {self._peek()[1]!r}")
        self.variables = frozenset(self._vars(self._ast))

    # --- parser (precedence climbing) ---
    def _peek(self):
        return self._toks[self._pos]

    def _next(self):
        t = self._toks[self._pos]
        self._pos += 1
        return t

    def _expr(self):
        node = self._term()
        while self._peek() == ("op", "+") or self._peek() == ("op", "-"):
            op = self._next()[1]
            node = (op, node, self._term())
        return node

    def _term(self):
        node = self._unary()
        while self._peek() == ("op", "*") or self._peek() == ("op", "/"):
            op = self._next()[1]
            node = (op, node, self._unary())
        return node

    def _unary(self):
        if self._peek() == ("op", "-"):
            self._next()
            return ("neg", self._unary())
        return self._atom()

    def _atom(self):
        kind, v = self._next()
        if kind == "num":
            return ("const", float(v))
        if kind == "id":
            if self._peek() == ("op", "("):
                if v not in _FUNCS:
                    raise ExpressionError(f"unknown function {v!r}")
                self._next()
                args = [self._expr()]
                while self._peek() == ("op", ","):
                    self._next()
                    args.append(self._expr())
                if self._next() != ("op", ")"):
                    raise ExpressionError("expected )")
                if len(args) != _FUNC_ARITY[v]:
                    raise ExpressionError(f"{v} takes {_FUNC_ARITY[v]} args")
                return ("call", v, args)
            return ("var", v)
        if (kind, v) == ("op", "("):
            node = self._expr()
            if self._next() != ("op", ")"):
                raise ExpressionError("expected )")
            return node
        raise ExpressionError(f"unexpected {v!r}")

    def _vars(self, node):
        tag = node[0]
        if tag == "var":
            yield node[1]
        elif tag in ("+", "-", "*", "/"):
            yield from self._vars(node[1])
            yield from self._vars(node[2])
        elif tag == "neg":
            yield from self._vars(node[1])
        elif tag == "call":
            for a in node[2]:
                yield from self._vars(a)

    def evaluate(self, bindings: dict):
        def ev(node):
            tag = node[0]
            if tag == "const":
                return node[1]
            if tag == "var":
                try:
                    v = bindings[node[1]]
                except KeyError:
                    raise ExpressionError(f"unbound variable {node[1]!r}")
                return np.asarray(v, dtype=np.float64) if not np.isscalar(v) else float(v)
            if tag == "neg":
                return -ev(node[1])
            if tag == "+":
                return ev(node[1]) + ev(node[2])
            if tag == "-":
                return ev(node[1]) - ev(node[2])
            if tag == "*":
                return ev(node[1]) * ev(node[2])
            if tag == "/":
                return ev(node[1]) / ev(node[2])
            if tag == "call":
                return _FUNCS[node[1]](*(ev(a) for a in node[2]))
            raise ExpressionError(f"bad node {tag}")

        return ev(self._ast)


def compile_expression(source: str) -> Expression:
    """JavascriptCompiler.compile analogue for the supported surface."""
    return Expression(source)
