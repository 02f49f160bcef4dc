"""Full-vocabulary stemmer differentials against the reference's
published test data (the *testdata.zip tab-separated word/stem files,
~290k entries across 13 languages).  Every implemented stemmer must
match the reference output EXACTLY on its entire vocabulary.  Skipped
when the reference checkout is absent."""

import os
import zipfile

import pytest

REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _cases():
    from lucene_ray.analysis import lightstem as ls
    from lucene_ray.analysis.rslp import portuguese_minimal_stem

    return [
        ("ckb/ckbtestdata.zip", lambda t: ls.sorani_stem(ls.sorani_normalize(t))),
        ("de/delighttestdata.zip", ls.german_light_stem),
        ("de/deminimaltestdata.zip", ls.german_minimal_stem),
        ("es/eslighttestdata.zip", ls.spanish_light_stem),
        ("es/espluraltestdata.zip", ls.spanish_plural_stem),
        ("fi/filighttestdata.zip", ls.finnish_light_stem),
        ("fr/frlighttestdata.zip", ls.french_light_stem),
        ("fr/frminimaltestdata.zip", ls.french_minimal_stem),
        ("gl/gltestdata.zip", __import__("lucene_ray.analysis.rslp", fromlist=["galician_stem"]).galician_stem),
        ("hu/hulighttestdata.zip", ls.hungarian_light_stem),
        ("it/itlighttestdata.zip", ls.italian_light_stem),
        ("pt/ptlighttestdata.zip", ls.portuguese_light_stem),
        ("pt/ptminimaltestdata.zip", portuguese_minimal_stem),
        ("pt/ptrslptestdata.zip", __import__("lucene_ray.analysis.rslp", fromlist=["portuguese_rslp_stem"]).portuguese_rslp_stem),
        ("ru/rulighttestdata.zip", ls.russian_light_stem),
        ("sv/svlighttestdata.zip", ls.swedish_light_stem),
    ]


@pytest.mark.parametrize("rel,fn", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_full_vocabulary(rel, fn):
    z = zipfile.ZipFile(os.path.join(REF, rel))
    data = z.read(z.namelist()[0]).decode("utf-8")
    total = 0
    for line in data.splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        inp, expected = parts
        got = fn(inp)
        assert got == expected, (rel, inp, got, expected)
        total += 1
    assert total > 5000, (rel, total)  # the files are full dictionaries
