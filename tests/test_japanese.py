"""Kuromoji-style Japanese lattice tokenizer goldens (reference
analysis/ja/JapaneseTokenizer.java semantics; segmentations mirror the
reference's canonical examples — e.g. TestJapaneseTokenizer's
関西国際空港 SEARCH-mode decompounding)."""

from lucene_ray.analysis.japanese import JapaneseAnalyzer, tokenize


def toks(text, mode="search"):
    return [s for s, _, _ in tokenize(text, mode)]


def test_search_mode_decompounds_dictionary_compound():
    # the reference's flagship example: SEARCH splits the compound,
    # NORMAL keeps it (JapaneseTokenizer calcSearchPenalty)
    assert toks("関西国際空港へ行きたい。") == ["関西", "国際", "空港", "へ", "行き", "たい"]
    assert toks("関西国際空港へ行きたい。", "normal") == ["関西国際空港", "へ", "行き", "たい"]


def test_lattice_disambiguation_sumomo():
    # the classic lattice test: alternating particle/noun parse must beat
    # both all-singles and greedy-longest
    assert toks("すもももももももものうち。") == [
        "すもも", "も", "もも", "も", "もも", "の", "うち",
    ]


def test_basic_sentences():
    assert toks("お寿司が食べたい。") == ["お", "寿司", "が", "食べ", "たい"]
    assert toks("日本の大学で勉強する。") == ["日本", "の", "大学", "で", "勉強", "する"]
    assert toks("東京タワーを見ました。") == ["東京", "タワー", "を", "見", "まし", "た"]
    assert toks("学生は図書館で本を読む。") == ["学生", "は", "図書館", "で", "本", "を", "読む"]
    assert toks("水を飲みたいです。") == ["水", "を", "飲み", "たい", "です"]
    assert toks("空港から東京まで電車で行く。") == [
        "空港", "から", "東京", "まで", "電車", "で", "行く",
    ]
    # out-of-lexicon compound composes from its dictionary parts
    assert toks("国際会議は明日です。") == ["国際", "会議", "は", "明日", "です"]


def test_unknown_word_grouping():
    # katakana runs group into single unknown arcs (ー included)
    assert toks("ラーメンとビールを注文した。") == [
        "ラーメン", "と", "ビール", "を", "注文", "し", "た",
    ]
    assert toks("コンピューター サイエンス") == ["コンピューター", "サイエンス"]
    # latin and digit runs group; known particles still cut the lattice
    assert toks("Python3で日本語NLPをする") == [
        "Python", "3", "で", "日本語", "NLP", "を", "する",
    ]


def test_offsets_and_punctuation_discard():
    out = tokenize("お寿司が食べたい。")
    assert [(s, a, b) for s, a, b in out] == [
        ("お", 0, 1), ("寿司", 1, 3), ("が", 3, 4), ("食べ", 4, 6), ("たい", 6, 8),
    ]
    # punctuation kept when asked
    kept = tokenize("水を。", discard_punctuation=False)
    assert [s for s, _, _ in kept] == ["水", "を", "。"]
    # whitespace splits lattice chunks but offsets stay document-global
    out = tokenize("水  寿司")
    assert out == [("水", 0, 1), ("寿司", 3, 5)]


def test_analyzer_interface():
    a = JapaneseAnalyzer()
    assert a.tokens("お寿司が食べたい。") == ["お", "寿司", "が", "食べ", "たい"]
    terms, tfs, ln = a.analyze("すもももももももものうち。")
    assert ln == 7
    assert dict(zip(terms, tfs)) == {"すもも": 1, "も": 2, "もも": 2, "の": 1, "うち": 1}
    # latin lowercased (JapaneseAnalyzer includes LowerCaseFilter)
    assert a.tokens("NLPをする") == ["nlp", "を", "する"]
    # batch contract matches per-doc analysis
    vocab, tids, dids, tfs2, lens = a.analyze_batch(
        ["お寿司が食べたい。", "水を飲みたいです。"]
    )
    assert sorted(vocab) == vocab  # UTF-8 sorted batch vocabulary
    assert list(lens) == [5, 5]


def test_driver_goldens_match_live_tokenizer():
    # the oracle SQL derives term stats from ft.JA_GOLDENS; they must be
    # exactly what the live analyzer produces for ft.JA_TEMPLATES
    from lucene_ray.pipelines.fulltext import JA_GOLDENS, JA_TEMPLATES

    a = JapaneseAnalyzer()
    for tpl, gold in zip(JA_TEMPLATES, JA_GOLDENS):
        assert a.tokens(tpl) == gold, tpl


def test_registry_roundtrip():
    from lucene_ray.analysis.analyzers import make_analyzer

    a = make_analyzer("japanese")
    assert a.tokens("東京タワーを見ました。") == ["東京", "タワー", "を", "見", "まし", "た"]


def test_lattice_invariants_random():
    """Every lattice tokenization must exactly tile its input: surfaces
    concatenated with discarded punctuation/whitespace reproduce the
    text, offsets are strictly increasing and non-overlapping."""
    import numpy as np

    from lucene_ray.analysis.japanese import tokenize as ja_tok
    from lucene_ray.analysis.korean import tokenize as ko_tok
    from lucene_ray.analysis.chinese import tokenize as zh_tok

    rng = np.random.default_rng(17)
    pools = [
        "関西国際空港へ行きたいすももものうち寿司タワーxyz123。、 ",
        "한국어를공부합니다서울학생책역삼역abc 12.!",
        "我是中国人今天天气很好图书馆Python3。， ",
    ]
    fns = [lambda t: ja_tok(t), lambda t: ko_tok(t), lambda t: zh_tok(t)]
    for pool, fn in zip(pools, fns):
        chars = list(pool)
        for _ in range(60):
            s = "".join(chars[i] for i in rng.integers(0, len(chars), rng.integers(0, 25)))
            out = fn(s)
            prev_end = 0
            for surf, a, b in out:
                assert 0 <= a < b <= len(s)
                assert a >= prev_end  # non-overlapping, ordered
                assert s[a:b] == surf  # surface == the text slice
                prev_end = b
            # gaps contain ONLY whitespace or punctuation-class chars
            covered = set()
            for _, a, b in out:
                covered.update(range(a, b))
            for i, c in enumerate(s):
                if i not in covered:
                    # uncovered alphanumerics would be dropped tokens — a bug
                    assert c.isspace() or not c.isalnum(), (s, i, c)


def test_user_dictionary():
    """kuromoji/nori dict/UserDictionary.java semantics: a user entry
    wins the lattice over built-in and unknown segmentations of its span
    (incl. search-mode penalty exemption), and a (surface, parts) entry
    decompounds nori-style."""
    from lucene_ray.analysis.chinese import SmartChineseAnalyzer
    from lucene_ray.analysis.korean import KoreanAnalyzer

    # without user dict: 関西国際空港 decompounds in SEARCH mode
    base = JapaneseAnalyzer()
    assert base.tokens("関西国際空港") == ["関西", "国際", "空港"]
    # user entry forces the whole surface, penalty-exempt
    ud = JapaneseAnalyzer(user_dict=["関西国際空港"])
    assert ud.tokens("関西国際空港") == ["関西国際空港"]
    # unknown katakana compound splits per user entry with parts
    base_t = base.tokens("ニューラルネット")
    assert base_t == ["ニューラルネット"]  # one unknown run
    ud2 = JapaneseAnalyzer(user_dict=[("ニューラルネット", ("ニューラル", "ネット"))])
    assert ud2.tokens("ニューラルネット") == ["ニューラル", "ネット"]

    # Korean: user compound decompounds like a Morpheme entry
    ko = KoreanAnalyzer(user_dict=[("블록체인", ("블록", "체인"))])
    assert ko.tokens("블록체인을 공부하다.") == ["블록", "체인", "을", "공부", "하다"]

    # Chinese: user word beats unknown pair composition
    zh = SmartChineseAnalyzer(user_dict=["量子力学"])
    assert zh.tokens("量子力学") == ["量子力学"]
