"""RSLP Plural-step stemmers (gl/GalicianMinimalStemmer.java,
pt/PortugueseMinimalStemmer.java over the published .rslp rule data):
every reference test vector except the KeywordMarker exclusion cases."""

from lucene_ray.analysis.rslp import galician_minimal_stem, portuguese_minimal_stem


def test_galician_minimal_vectors():
    for inp, expected in [
        ('elefantes', 'elefante'),
        ('elefante', 'elefante'),
        ('kal\xf3res', 'kal\xf3r'),
        ('kal\xf3r', 'kal\xf3r'),
        ('mas', 'mas'),
        ('barcelon\xeas', 'barcelon\xeas'),
    ]:
        assert galician_minimal_stem(inp) == expected, inp


def test_portuguese_minimal_vectors():
    # checkOneTerm vectors in the reference pt-minimal test are keyword-
    # exclusion cases; the real coverage is the 32k-entry vocabulary
    # differential in test_vocab_differentials.py
    assert portuguese_minimal_stem("livros") == "livro"
    assert portuguese_minimal_stem("bons") == "bom"
    # the pt Plural step has no zes->z rule (unlike Galician): luzes -> luze
    assert portuguese_minimal_stem("luzes") == "luze"
    assert portuguese_minimal_stem("país") == "país"  # exception word


def test_rslp_semantics():
    # whole-word exception set: 'luns' skips the ns->n rule but the later
    # bare-s rule still fires (RSLP rules keep trying after an exception)
    assert galician_minimal_stem("luns") == "lun"
    # conditional end-suffix: the step only attempts words ending in s
    assert galician_minimal_stem("normal") == "normal"
    # min stem size gates a rule
    from lucene_ray.analysis.analyzers import make_term_filter

    assert make_term_filter("galician_minimal")("caracois") == "caracol"
    assert make_term_filter("portuguese_minimal")("livros") == "livro"
