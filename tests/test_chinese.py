"""smartcn-style Chinese lattice segmentation goldens (reference
analysis/cn/smart HMMChineseTokenizer semantics via the shared lattice
engine)."""

from lucene_ray.analysis.chinese import SmartChineseAnalyzer, tokenize


def toks(text):
    return [s for s, _, _ in tokenize(text)]


def test_basic_segmentation():
    assert toks("我是中国人。") == ["我", "是", "中国", "人"]
    assert toks("他喜欢学习中文。") == ["他", "喜欢", "学习", "中文"]
    assert toks("北京大学的学生很多。") == ["北京", "大学", "的", "学生", "很", "多"]
    assert toks("今天天气很好。") == ["今天", "天气", "很", "好"]
    assert toks("我们在图书馆看书。") == ["我们", "在", "图书馆", "看", "书"]


def test_compound_and_measure_words():
    # 人工智能 composes from its dictionary parts (NOUN+NOUN)
    assert toks("人工智能改变世界。") == ["人工", "智能", "改变", "世界"]
    # numeral + measure word + noun chain
    assert toks("这是一本好书。") == ["这", "是", "一", "本", "好", "书"]
    assert toks("朋友们一起吃饭。") == ["朋友", "们", "一起", "吃饭"]


def test_unknown_han_pairs_compose():
    # out-of-lexicon Han text still tokenizes (pair/single unknown arcs)
    out = toks("量子力学")
    assert "".join(out) == "量子力学"
    assert all(1 <= len(t) <= 2 for t in out)


def test_offsets_mixed_scripts_and_analyzer():
    assert tokenize("我看书") == [("我", 0, 1), ("看", 1, 2), ("书", 2, 3)]
    a = SmartChineseAnalyzer()
    assert a.tokens("我用Python学习中文") == ["我", "用", "python", "学习", "中文"] or (
        "python" in a.tokens("我用Python学习中文")
    )
    terms, tfs, ln = a.analyze("今天天气很好。")
    assert ln == 4
    vocab, tids, dids, tfs2, lens = a.analyze_batch(["我是中国人。", "今天天气很好。"])
    assert sorted(vocab) == vocab
    assert list(lens) == [4, 4]


def test_driver_goldens_match_live_tokenizer():
    from lucene_ray.pipelines.fulltext import ZH_GOLDENS, ZH_TEMPLATES

    a = SmartChineseAnalyzer()
    for tpl, gold in zip(ZH_TEMPLATES, ZH_GOLDENS):
        assert a.tokens(tpl) == gold, tpl


def test_registry_roundtrip():
    from lucene_ray.analysis.analyzers import make_analyzer

    a = make_analyzer("chinese")
    assert a.tokens("我是中国人。") == ["我", "是", "中国", "人"]
