"""Extract the UAX#29 word-break DFA tables from the reference's generated
jflex scanner and store them as a numpy .npz data file.

The tables (character-class map + DFA transitions) are *generated artifacts*
of the Unicode 12.1 word-break property data compiled through the reference
grammar ``analysis/standard/StandardTokenizerImpl.jflex`` (Apache-2.0).  They
are data, not code: we extract them once, at development time, into
``lucene_ray/analysis/uax29_tables.npz``; the scanner runtime that consumes
them (lucene_ray/analysis/scanner.py) is an original implementation of the
standard jflex longest-match DFA semantics.

Reference: /root/reference/lucene/core/src/java/org/apache/lucene/analysis/
standard/StandardTokenizerImpl.java (zzUnpack* routines define the packed
string RLE encodings reproduced below).

Usage: python tools/extract_uax29_tables.py [path-to-StandardTokenizerImpl.java]
"""

from __future__ import annotations

import re
import sys

import numpy as np

DEFAULT_SRC = (
    "/root/reference/lucene/core/src/java/org/apache/lucene/analysis/"
    "standard/StandardTokenizerImpl.java"
)
OUT = "lucene_ray/analysis/uax29_tables.npz"


def read_packed_string(java_src: str, const_name: str) -> str:
    """Parse `private static final String <NAME> = "..." + "..." ...;` into
    the concatenated Python string (decoding Java unicode/octal escapes)."""
    m = re.search(
        rf"String\s+{const_name}\s*=\s*(.*?);", java_src, re.DOTALL
    )
    if not m:
        raise KeyError(const_name)
    body = m.group(1)
    literals = re.findall(r'"((?:[^"\\]|\\.)*)"', body, re.DOTALL)
    out: list[str] = []
    for lit in literals:
        i = 0
        while i < len(lit):
            c = lit[i]
            if c != "\\":
                out.append(c)
                i += 1
                continue
            nxt = lit[i + 1]
            if nxt == "u":
                # Java allows multiple u's; the generated file uses exactly one.
                j = i + 2
                while lit[j] == "u":
                    j += 1
                out.append(chr(int(lit[j : j + 4], 16)))
                i = j + 4
            elif nxt in "01234567":
                # octal escape, up to 3 digits
                j = i + 1
                digits = ""
                while j < len(lit) and lit[j] in "01234567" and len(digits) < 3:
                    digits += lit[j]
                    j += 1
                out.append(chr(int(digits, 8)))
                i = j
            else:
                out.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'", "b": "\b", "f": "\f"}[nxt])
                i += 2
    return "".join(out)


def unpack_rle(packed: str) -> np.ndarray:
    vals: list[int] = []
    i = 0
    while i < len(packed):
        count = ord(packed[i])
        value = ord(packed[i + 1])
        i += 2
        vals.extend([value] * count)
    return np.asarray(vals, dtype=np.int32)


def unpack_rowmap(packed: str) -> np.ndarray:
    vals = []
    i = 0
    while i < len(packed) - 1:
        vals.append((ord(packed[i]) << 16) | ord(packed[i + 1]))
        i += 2
    return np.asarray(vals, dtype=np.int32)


def main() -> None:
    src_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    with open(src_path, encoding="utf-8") as f:
        src = f.read()

    cmap_top = unpack_rle(read_packed_string(src, "ZZ_CMAP_TOP_PACKED_0"))
    cmap_blocks = unpack_rle(read_packed_string(src, "ZZ_CMAP_BLOCKS_PACKED_0"))
    action = unpack_rle(read_packed_string(src, "ZZ_ACTION_PACKED_0"))
    rowmap = unpack_rowmap(read_packed_string(src, "ZZ_ROWMAP_PACKED_0"))
    trans = unpack_rle(read_packed_string(src, "ZZ_TRANS_PACKED_0")) - 1  # stored +1
    attribute = unpack_rle(read_packed_string(src, "ZZ_ATTRIBUTE_PACKED_0"))

    # Flatten the two-level cmap into one full-codepoint class table:
    # cmap(cp) = blocks[top[cp >> 8] | (cp & 0xff)]
    cps = np.arange(0x110000, dtype=np.int64)
    full_cmap = cmap_blocks[cmap_top[cps >> 8] | (cps & 0xFF)].astype(np.uint8)

    # Dense per-state transition rows: trans_table[state, cls]
    n_states = len(rowmap)
    n_classes = int(full_cmap.max()) + 1
    trans_table = np.full((n_states, n_classes), -1, dtype=np.int16)
    for s in range(n_states):
        row = trans[rowmap[s] : rowmap[s] + n_classes]
        trans_table[s, : len(row)] = row

    np.savez_compressed(
        OUT,
        cmap=full_cmap,
        action=action.astype(np.int8),
        attribute=attribute.astype(np.int8),
        trans=trans_table,
    )
    print(
        f"wrote {OUT}: {n_states} states, {n_classes} classes, "
        f"cmap {full_cmap.nbytes} bytes"
    )


if __name__ == "__main__":
    main()
