"""Extract RSLP "Plural" steps from the reference's .rslp resource files
into lucene_ray/analysis/rslp_data.py.

The .rslp files (lucene/analysis/common/src/resources/.../{gl/galician,
pt/portuguese}.rslp, Apache-2.0) are published rule DATA for the RSLP
stemmer (Orengo & Huyck 2001); this is the same adjudicated
data-extraction pattern as tools/extract_uax29_tables.py — the consuming
interpreter (analysis/rslp.py) is original.

Usage: python tools/extract_rslp.py
"""

from __future__ import annotations

import os
import re

REF = "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"
SOURCES = {
    "GALICIAN_PLURAL": f"{REF}/gl/galician.rslp",
    "PORTUGUESE_PLURAL": f"{REF}/pt/portuguese.rslp",
}

_HEADER = re.compile(r'^\{\s*"(\w+)",\s*(\d+),\s*(\d+),\s*\{(.*?)\}\s*,\s*$')
# rule forms (RSLPStemmerBase parseRules): {"suf",N}, {"suf",N,"rep"},
# {"suf",N,"rep",{...exceptions}} — trailing ",", ";" or the step's "}};"
_RULE = re.compile(
    r'^\{\s*"([^"]*)"\s*,\s*(\d+)\s*'
    r'(?:,\s*"([^"]*)"\s*)?'
    r'(?:,\s*\{(.*?)\}\s*)?'
    r'\}\s*[,;]?\s*\}?\s*;?\s*$'
)


def _parse_list(body: str) -> tuple[str, ...]:
    return tuple(m.group(1) for m in re.finditer(r'"([^"]*)"', body))


def parse_step(path: str, step_name: str):
    lines = [
        ln.split("#", 1)[0].strip()
        for ln in open(path, encoding="utf-8")
    ]
    out = None
    in_step = False
    for ln in lines:
        if not ln:
            continue
        h = _HEADER.match(ln)
        if h:
            in_step = h.group(1) == step_name
            if in_step:
                out = {
                    "min": int(h.group(2)),
                    "type": int(h.group(3)),
                    "cond": _parse_list(h.group(4)),
                    "rules": [],
                }
            continue
        if in_step:
            r = _RULE.match(ln)
            if r:
                out["rules"].append(
                    (
                        r.group(1),
                        int(r.group(2)),
                        r.group(3) or "",
                        _parse_list(r.group(4) or ""),
                    )
                )
                if ln.rstrip().endswith("};"):
                    in_step = False
            elif ln.startswith("};"):
                in_step = False
    if out is None or not out["rules"]:
        raise SystemExit(f"step {step_name} not parsed from {path}")
    return out


def parse_all_steps(path: str) -> dict:
    import re as _re

    headers = []
    for ln in open(path, encoding="utf-8"):
        m = _HEADER.match(ln.split("#", 1)[0].strip())
        if m:
            headers.append(m.group(1))
    return {h: parse_step(path, h) for h in headers}


def main() -> None:
    parts = [
        '"""RSLP rule data extracted from the reference\'s .rslp',
        "resources by tools/extract_rslp.py — regenerate with that tool;",
        'do not edit."""',
        "",
    ]
    for name, path in SOURCES.items():
        step = parse_step(path, "Plural")
        parts.append(f"{name} = {step!r}")
        parts.append("")
    parts.append(
        f"GALICIAN_STEPS = {parse_all_steps(SOURCES['GALICIAN_PLURAL'])!r}"
    )
    parts.append("")
    parts.append(
        f"PORTUGUESE_STEPS = {parse_all_steps(SOURCES['PORTUGUESE_PLURAL'])!r}"
    )
    parts.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "lucene_ray", "analysis", "rslp_data.py",
    )
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    print("wrote", out)


if __name__ == "__main__":
    main()
