"""Deterministic synthetic source-code corpus generator (FIXTURES F1).

Schema per BASELINE.json input_hint: ``repo, path, commit, lang, content``
(all strings).  Content mixes a Zipfian identifier vocabulary, per-language
keywords (hot terms for skew), camelCase / snake_case identifiers, numeric
literals and unicode comment lines (CJK, emoji, accents) for tokenizer
conformance.  Lengths are log-normal in ~0.2-64 KB with a few multi-MB
outliers.  Everything derives from a fixed seed: same (n_docs, seed) ->
byte-identical parquet.

No external data; generation is vectorized numpy + bulk string joins.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "js", "c", "md"]
EXTS = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c", "md": "md"}
KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "for", "if", "in", "None"],
    "java": ["public", "static", "void", "class", "import", "return", "new", "int"],
    "go": ["func", "return", "package", "import", "type", "struct", "var", "err"],
    "js": ["function", "return", "const", "let", "var", "import", "export", "this"],
    "c": ["int", "return", "void", "static", "struct", "include", "char", "const"],
    "md": ["the", "a", "to", "of", "and", "in", "is", "for"],
}
UNICODE_COMMENTS = [
    "# 这是一个中文注释 文件处理",
    "// コメント：データ構造の実装",
    "# 한국어 주석: 데이터 처리",
    "// Commentaire: implémentation détaillée, déjà vérifié",
    "# emoji test 🚀 works 👍🏽 done ✅",
    "// Überprüfung der Größe und Länge",
]

VOCAB_SIZE = 50_000


def _vocab(rng: np.random.Generator) -> np.ndarray:
    syll = np.array(
        "ba be bi bo bu da de di do du fa fe fi fo fu ga ge gi go gu ka ke ki ko ku "
        "la le li lo lu ma me mi mo mu na ne ni no nu pa pe pi po pu ra re ri ro ru "
        "sa se si so su ta te ti to tu va ve vi vo vu wa we wi wo wu za ze zi zo zu".split()
    )
    n_syll = rng.integers(2, 5, size=VOCAB_SIZE)
    picks = rng.integers(0, len(syll), size=(VOCAB_SIZE, 4))
    words = []
    for i in range(VOCAB_SIZE):
        parts = syll[picks[i, : n_syll[i]]]
        w = "".join(parts)
        style = i % 7
        if style == 0 and len(parts) > 1:  # camelCase
            w = parts[0] + "".join(p.capitalize() for p in parts[1:])
        elif style == 1 and len(parts) > 1:  # snake_case
            w = "_".join(parts)
        elif style == 2:
            w = w + str(i % 100)
        words.append(w)
    return np.array(words, dtype=object)


def corpus_sizes_for_sf(sf: float) -> int:
    """Map a testdata scale factor onto corpus size (FIXTURES F1 sizes)."""
    if sf <= 0.001:
        return 200
    if sf <= 0.01:
        return 20_000
    return 100_000


def ensure_corpus(
    sf: float,
    out_dir: str | None = None,
    seed: int = 42,
    n_files: int = 8,
    row_group_size: int = 2048,
    n_docs: int | None = None,
) -> str:
    """Generate (or reuse) the cached corpus for a scale factor; returns the
    directory of parquet files.  ``n_docs`` overrides the sf-derived size
    (stress runs)."""
    n_docs = n_docs if n_docs is not None else corpus_sizes_for_sf(sf)
    out_dir = out_dir or (
        f"/tmp/lucene_ray_corpus/sf{sf}_seed{seed}_n{n_docs}_rg{row_group_size}"
    )
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per_file = (n_docs + n_files - 1) // n_files
    written = 0
    for fi in range(n_files):
        take = min(per_file, n_docs - written)
        if take <= 0:
            break
        tbl = generate_corpus_slice(written, take, seed)
        pq.write_table(
            tbl,
            os.path.join(out_dir, f"part-{fi:04d}.parquet"),
            row_group_size=row_group_size,
        )
        written += take
    with open(done, "w") as f:
        f.write(str(n_docs))
    return out_dir


def generate_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    return generate_corpus_slice(0, n_docs, seed)


def generate_corpus_slice(start: int, count: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+count) of the seed's infinite corpus, generated
    independently per row block (deterministic regardless of file split)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)  # vocab depends only on the seed
    sub = np.random.default_rng((seed, start))
    tbl = _generate_with(vocab, start, count, sub)
    return tbl


def _generate_with(vocab: np.ndarray, start: int, count: int, rng: np.random.Generator) -> pa.Table:
    idx = np.arange(start, start + count)
    repos = np.char.add(
        np.char.add("org", (idx % 97).astype(str)),
        np.char.add("/repo", (idx % 1009).astype(str)),
    )
    langs = np.array(LANGS, dtype=object)[idx % len(LANGS)]
    hexd = np.array(list("0123456789abcdef"))
    commit_mat = hexd[rng.integers(0, 16, size=(count, 40))]
    commits = np.array(["".join(row) for row in commit_mat], dtype=object)
    dirs = np.array(["core", "util", "net", "io", "db", "api", "ui", "test"], dtype=object)
    paths = np.array(
        [
            f"src/{dirs[i % len(dirs)]}/{vocab[i % VOCAB_SIZE]}_{i}.{EXTS[langs[j]]}"
            for j, i in enumerate(idx)
        ],
        dtype=object,
    )
    n_tokens = np.clip(np.exp(rng.normal(5.3, 1.0, size=count)), 30, 10_000).astype(np.int64)
    outliers = rng.random(count) < 0.0005
    n_tokens[outliers] = 200_000

    total = int(n_tokens.sum())
    zipf_ids = np.minimum(rng.zipf(1.3, size=total) - 1, VOCAB_SIZE - 1)
    all_toks = vocab[zipf_ids]
    offsets = np.concatenate(([0], np.cumsum(n_tokens)))
    contents = []
    for j in range(count):
        toks = all_toks[offsets[j] : offsets[j + 1]]
        k = len(toks)
        kw = KEYWORDS[langs[j]]
        kw_pos = rng.integers(0, k, size=max(1, k // 6))
        toks[kw_pos] = np.array(kw, dtype=object)[rng.integers(0, len(kw), size=len(kw_pos))]
        num_pos = rng.integers(0, k, size=max(1, k // 20))
        toks[num_pos] = rng.integers(0, 100_000, size=len(num_pos)).astype(str).astype(object)
        body = " ".join(toks.tolist())
        lines = [body[x : x + 88] for x in range(0, len(body), 88)]
        i = int(idx[j])
        if i % 11 == 0:
            lines.insert(0, UNICODE_COMMENTS[i % len(UNICODE_COMMENTS)])
        contents.append("\n".join(lines))

    return pa.table(
        {
            "repo": pa.array(repos.astype(object), type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )
