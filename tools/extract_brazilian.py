"""Extract the BrazilianStemmer step-2 verb-suffix rule table from the
reference source into lucene_ray/analysis/brazilian_data.py.

Step 2 is 114 uniform rules — `if (suffix(RV, X)) { CT =
removeSuffix(CT, Y); return true; }` under RV-length gates — pure data
(including the reference's one X != Y quirk, preserved verbatim).  The
consuming stemmer logic in analysis/brazilian.py is an original
implementation of the documented algorithm.

Usage: python tools/extract_brazilian.py
"""

from __future__ import annotations

import os
import re

SRC = (
    "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
    "analysis/br/BrazilianStemmer.java"
)


def main() -> None:
    src = open(SRC, encoding="utf-8").read()
    s2 = src[src.index("private boolean step2()") : src.index("private void step3()")]
    rules: list[tuple[int, str, str]] = []
    gate = 0
    for m in re.finditer(
        r'if \(RV\.length\(\) >= (\d+)\) \{'
        r'|if \(suffix\(RV, "([^"]+)"\)\) \{\s*CT = removeSuffix\(CT, "([^"]+)"\);',
        s2,
    ):
        if m.group(1):
            gate = int(m.group(1))
        else:
            rules.append((gate, m.group(2), m.group(3)))
    assert len(rules) == 114, len(rules)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "lucene_ray", "analysis", "brazilian_data.py",
    )
    with open(out, "w", encoding="utf-8") as f:
        f.write(
            '"""BrazilianStemmer step-2 verb-suffix rules extracted from the\n'
            "reference by tools/extract_brazilian.py — (rv_min_len,\n"
            "check_suffix, remove_suffix) in source order; the one\n"
            'check != remove row is the reference\'s own quirk.  Do not edit."""\n\n'
        )
        f.write(f"STEP2_RULES = {rules!r}\n")
    print("wrote", out, len(rules), "rules")


if __name__ == "__main__":
    main()
