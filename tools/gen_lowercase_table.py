"""Generate the per-codepoint simple-lowercase table used by the analysis
chain, as a numpy file.

Semantics: Java ``Character.toLowerCase(int)`` = Unicode
Simple_Lowercase_Mapping (1:1 codepoint mapping).  Python's ``str.lower``
implements the *full* mapping, which differs only where the full mapping is
multi-codepoint; the single known lowercase case is U+0130 (LATIN CAPITAL
LETTER I WITH DOT ABOVE) whose simple mapping is U+0069.  Reference:
lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java:36-43 and
CharacterUtils.java:53-61 (per-codepoint Character.toLowerCase).

Usage: python tools/gen_lowercase_table.py
"""

import numpy as np

OUT = "lucene_ray/analysis/lowercase_table.npz"


def main() -> None:
    table = np.arange(0x110000, dtype=np.int32)
    for cp in range(0x110000):
        low = chr(cp).lower()
        if len(low) == 1:
            table[cp] = ord(low)
        elif cp == 0x130:
            table[cp] = 0x69  # simple mapping per UnicodeData.txt
        # else: multi-char full mapping with no 1:1 simple equivalent in
        # Python's view -> keep identity (matches Java for these cases)
    # Store only the exceptional mappings; loaders rebuild the identity ramp.
    changed = np.flatnonzero(table != np.arange(0x110000, dtype=np.int32))
    np.savez_compressed(OUT, cp=changed.astype(np.int32), low=table[changed])
    print(f"wrote {OUT}: {len(changed)} codepoints remapped")


if __name__ == "__main__":
    main()
