"""lucene/expressions analogue: compiled arithmetic over stored fields +
_score, vectorized, integrated with FunctionScoreQuery."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.search.expressions import ExpressionError, compile_expression


def test_expression_values_and_vars():
    e = compile_expression("ln(1 + n_chars) * _score + sqrt(max(x, 4)) / 2")
    assert e.variables == {"n_chars", "_score", "x"}
    out = e.evaluate(
        {
            "n_chars": np.array([0.0, np.e - 1]),
            "_score": np.array([2.0, 3.0]),
            "x": np.array([1.0, 16.0]),
        }
    )
    assert np.allclose(out, [0.0 * 2 + 2 / 2, 1.0 * 3 + 4 / 2])
    # precedence + unary minus + pow
    e2 = compile_expression("-2 + 3 * 4 - pow(2, 3)")
    assert e2.evaluate({}) == -2 + 12 - 8


@pytest.mark.parametrize(
    "bad", ["1 +", "foo(2)", "min(1)", "(1", "1 $ 2", "ln(1) extra"]
)
def test_expression_rejects(bad):
    with pytest.raises(ExpressionError):
        compile_expression(bad)


def test_expression_unbound_variable():
    e = compile_expression("a + 1")
    with pytest.raises(ExpressionError, match="unbound"):
        e.evaluate({})


def test_function_score_expression_integration(ray_session):
    """An expression-driven FunctionScoreQuery must equal the closed-form
    recompute of the same expression over plain BM25 scores, and the
    default ln(1+field)*_score expression must equal the legacy field
    form exactly."""
    from lucene_ray.pipelines.fulltext import ensure_index
    from lucene_ray.search.query import FunctionScoreQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    idx = ensure_index("/root/testdata/sf0.001")
    s = IndexSearcher(idx)
    legacy = s.search(FunctionScoreQuery(TermQuery("spark"), field="n_chars"), 10)
    via_expr = s.search(
        FunctionScoreQuery(
            TermQuery("spark"), expression="_score * ln(1 + n_chars)"
        ),
        10,
    )
    assert [(d, np.float32(x)) for d, x in legacy] == [
        (d, np.float32(x)) for d, x in via_expr
    ]
    # a different expression must reorder
    other = s.search(
        FunctionScoreQuery(TermQuery("spark"), expression="1 / (1 + n_chars)"), 10
    )
    assert [d for d, _ in other] != [d for d, _ in legacy]


def test_full_function_table():
    """The complete javascript.properties function set (27 entries)."""
    import math

    from lucene_ray.search.expressions import compile_expression

    e = compile_expression("atan2(sin(x), cos(x)) + logn(2, 8)")
    assert abs(e.evaluate({"x": 0.5}) - (0.5 + 3.0)) < 1e-12
    e2 = compile_expression("sinh(0) + cosh(0) + tanh(0) + exp(0)")
    assert e2.evaluate({}) == 2.0
    e3 = compile_expression("asinh(sinh(1)) + acosh(cosh(1)) + atanh(tanh(1))")
    assert abs(e3.evaluate({}) - 3.0) < 1e-12
    # haversin(lat1, lon1, lat2, lon2) in kilometers: one degree of
    # longitude at the equator is ~111.19 km on the mean-radius sphere
    hv = compile_expression("haversin(0, 0, 0, 1)").evaluate({})
    assert abs(hv - 111.195) < 0.01
    assert compile_expression("haversin(10, 20, 10, 20)").evaluate({}) == 0.0
