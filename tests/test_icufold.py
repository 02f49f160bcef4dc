"""ICU folding goldens — the full reference test-vector suite
(analysis/icu TestICUFoldingFilter.testDefaults) plus the driver-corpus
golden pin."""

from lucene_ray.analysis.icufold import ICUFoldingAnalyzer, icu_fold


def test_reference_vectors():
    # every assertion from TestICUFoldingFilter.testDefaults
    vectors = [
        ("This", "this"), ("is", "is"), ("a", "a"), ("test", "test"),
        ("Ruß", "russ"),                       # full case folding
        ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),  # casefold + accent removal
        ("\U00010416", "\U0001043e"),          # supplementary casefold
        ("ﴳﴺﰧ", "طمطمطم"),                    # compat normalization
        ("क्‍ष", "कष"),                   # default ignorables
        ("résumé", "resume"),                  # composed accents
        ("résumé", "resume"),      # decomposed accents
        ("৭০৬", "706"),                        # native digit folding
        ("đis", "dis"), ("cræzy", "craezy"),   # ascii-folding type stuff
        ("ELİF", "elif"),                      # Turkish dotted capital I
        ("eli̇f", "elif"),                # decomposed dot above
        ("", ""),                              # testEmptyTerm
    ]
    for inp, expected in vectors:
        assert icu_fold(inp) == expected, (inp, expected)


def test_additional_foldings():
    assert icu_fold("ŒUF") == "oeuf"
    assert icu_fold("Æsir") == "aesir"
    assert icu_fold("Łódź") == "lodz"
    assert icu_fold("ＦＵＬＬｗｉｄｔｈ") == "fullwidth"   # width folding (NFKC)
    assert icu_fold("x—y–z") == "x-y-z"          # dash folding
    assert icu_fold("a b") == "a b"                   # no-break space
    assert icu_fold("x­y") == "xy"                    # soft hyphen (Cf)
    assert icu_fold("١٢٣") == "123"                        # Arabic-Indic digits


def test_analyzer_and_driver_goldens():
    from lucene_ray.pipelines.fulltext import ICU_GOLDENS, ICU_TEMPLATES

    a = ICUFoldingAnalyzer()
    for tpl, gold in zip(ICU_TEMPLATES, ICU_GOLDENS):
        assert a.tokens(tpl) == gold, tpl
    vocab, tids, dids, tfs, lens = a.analyze_batch(["Ruß résumé", "ELİF naïve"])
    assert sorted(vocab) == vocab
    assert list(lens) == [2, 2]


def test_custom_chain_filter():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("icu_folding")
    assert f("Ruß") == "russ"
    assert f("résumé") == "resume"
