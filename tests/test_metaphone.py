"""Metaphone encoder (the commons-codec algorithm Lucene's
PhoneticFilter delegates to), rule-by-rule goldens."""

from lucene_ray.analysis.analyzers import make_term_filter
from lucene_ray.analysis.metaphone import metaphone


def test_basic_vector():
    for w, want in [
        ("howl", "HL"), ("The", "0"), ("quick", "KK"), ("brown", "BRN"),
        ("fox", "FKS"), ("jumped", "JMPT"), ("over", "OFR"), ("lazy", "LS"),
        ("dogs", "TKS"), ("testing", "TSTN"),
    ]:
        assert metaphone(w) == want, w


def test_frontal_exceptions():
    assert metaphone("knight") == "NT"     # KN- drops K
    assert metaphone("wrack") == "RK"      # WR- drops W
    assert metaphone("gnome") == "NM"      # GN- drops G
    assert metaphone("xylophone") == "SLFN"  # X- -> S
    assert metaphone("whale") == "WL"      # WH- -> W
    assert metaphone("aeon") == "EN"       # AE- drops A


def test_consonant_rules():
    assert metaphone("school") == "SKL"    # SCH -> K
    assert metaphone("science") == "SNS"   # SCI: silent C
    assert metaphone("pitch") == "PX"      # TCH: silent T, CH -> X
    assert metaphone("judge") == "JJ"      # DGE -> J
    assert metaphone("philip") == "FLP"    # PH -> F
    assert metaphone("vision") == "FXN"    # SIO -> X, V -> F
    assert metaphone("nation") == "NXN"    # TIO -> X
    assert metaphone("thumb") == "0M"      # TH -> 0, terminal MB silent
    assert metaphone("lamb") == "LM"
    assert metaphone("ghost") == "KST"     # GH before vowel -> K
    assert metaphone("weight") == "WT"     # GH silent before consonant
    assert metaphone("exciting") == "EKSS"  # X -> KS


def test_edges_and_filter():
    assert metaphone("") == ""
    assert metaphone("a") == "A"
    assert metaphone("123") == ""
    assert metaphone("extra", max_code_len=2) == "EK"
    f = make_term_filter("metaphone")
    assert f("philip") == "FLP"
    assert f("123") == "123"  # unencodable terms pass through


def test_refined_soundex():
    from lucene_ray.analysis.metaphone import refined_soundex

    for w, want in [
        ("testing", "T6036084"), ("TESTING", "T6036084"), ("The", "T60"),
        ("quick", "Q503"), ("brown", "B1908"), ("fox", "F205"),
        ("jumped", "J408106"), ("over", "O0209"), ("lazy", "L7050"),
        ("dogs", "D6043"),
    ]:
        assert refined_soundex(w) == want, w
    assert refined_soundex("") == ""
    f = make_term_filter("refined_soundex")
    assert f("dogs") == "D6043"


def test_review_fix_rules():
    # word-initial CH with vowel at index 2 -> K (the commons-codec quirk)
    assert metaphone("character") == "KRKT"
    # H: terminal silent, only sounds before a vowel
    assert metaphone("rhythm") == "R0M"
    assert metaphone("ankh") == "ANK"
    # SCI discard precedes the CIA rule
    assert metaphone("fascia") == "FS"
    # refined soundex skips non-ASCII letters instead of crashing
    from lucene_ray.analysis.metaphone import refined_soundex
    assert refined_soundex("über") == "B109"


def test_cologne_phonetic():
    from lucene_ray.analysis.metaphone import cologne_phonetic

    for w, want in [
        ("Müller-Lüdenscheidt", "65752682"), ("Breschnew", "17863"),
        ("Wikipedia", "3412"), ("Meier", "67"), ("Mayer", "67"),
        ("Meyer", "67"), ("", ""),
    ]:
        assert cologne_phonetic(w) == want, w
    # Meier/Mayer/Meyer collide — the encoder's purpose
    f = make_term_filter("cologne")
    assert f("Meier") == f("Meyer") == "67"


def test_phonetic_search_end_to_end(tmp_path, ray_session):
    """Phonetic matching through the real chain: a cologne-encoded index
    makes Meier/Meyer/Mayer collide, so a query for one finds all."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import make_analyzer
    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    docs = ["herr Meier", "frau Meyer", "herr Mayer", "doktor Schmidt"]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 4, "path": list("abcd"),
                  "commit": ["x"] * 4, "lang": ["de"] * 4}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    spec = {"name": "custom", "filters": [("cologne", {})]}
    build_index_local(str(src), idx, analyzer=spec)
    s = IndexSearcher(idx)
    qterm = make_analyzer(spec).normalize("Meyer")  # query-side encode
    # normalize lowercases; the chain encodes the TERM — apply the filter
    from lucene_ray.analysis.metaphone import cologne_phonetic

    hits = {d for d, _ in s.search(TermQuery(cologne_phonetic("Meyer")), 10)}
    assert hits == {0, 1, 2}
    assert s.count(TermQuery(cologne_phonetic("Schmidt"))) == 1
