"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema fixed by the north star's input hint:
``(repo: string, path: string, commit: string, lang: string, content: string)``
plus ``doc_id`` (int64 row id — the global docID / tie-break order, standing
in for Lucene's arrival-order docID).

Generation is seeded and fully deterministic: a ~2k-word vocabulary of
identifiers/keywords with Zipf-distributed frequencies (so ``if``/``return``
-like tokens are near-universal → real skew for the salting/merge paths),
mixed-case string literals, numbers, occasional >255-char tokens (exercising
the skip-and-count-position rule) and Unicode identifiers (pinning lowercase
semantics).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["py", "java", "c", "go", "js", "md"]
LANG_WEIGHTS = np.array([30, 25, 15, 10, 15, 5], dtype=np.float64)

KEYWORDS = [
    "if", "return", "import", "def", "class", "for", "while", "else", "elif",
    "try", "except", "raise", "with", "lambda", "yield", "assert", "pass",
    "break", "continue", "not", "and", "or", "in", "is", "None", "True",
    "False", "self", "static", "void", "int", "public", "private", "final",
    "func", "var", "const", "let", "struct", "interface", "package",
]

EXTRAS = [
    "Ünïcode_väl", "CAFÉ_constant", "straße_path", "naïve_impl",
    "O'Brien_parser", "don't", "3.14159", "0xDEADBEEF", "1,000,000",
]


def _vocab(seed: int, size: int = 2000) -> list[str]:
    rng = np.random.RandomState(seed)
    syllables = ["get", "set", "run", "cfg", "idx", "buf", "ptr", "ctx", "tmp",
                 "val", "node", "tree", "list", "map", "hash", "sort", "scan",
                 "read", "write", "open", "close", "init", "free", "alloc",
                 "parse", "emit", "token", "query", "index", "merge", "flush",
                 "score", "doc", "term", "field", "block", "codec", "util"]
    words = list(KEYWORDS)
    seen = set(words)
    while len(words) < size:
        k = rng.randint(1, 4)
        parts = [syllables[rng.randint(len(syllables))] for _ in range(k)]
        style = rng.randint(3)
        if style == 0:
            w = "_".join(parts)
        elif style == 1:
            w = parts[0] + "".join(p.capitalize() for p in parts[1:])
        else:
            w = "".join(parts) + str(rng.randint(100))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def generate_corpus(num_docs: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic pandas corpus; same generator at every size, same seed."""
    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab(seed), dtype=object)
    v = len(vocab)
    # Zipf(1.2) token distribution over vocabulary ranks
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()

    doc_ids = np.arange(num_docs, dtype=np.int64)
    repos = np.array([f"org{i % 7}/repo{i % 97}" for i in range(num_docs)], dtype=object)
    langs = np.array(LANGS, dtype=object)[
        rng.choice(len(LANGS), size=num_docs, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())]
    dirs = np.array(["core", "util", "io", "net", "api"], dtype=object)[
        rng.randint(0, 5, size=num_docs)]
    paths = np.array([f"src/{d}/file{i % 1013}.{l}"
                      for i, (d, l) in enumerate(zip(dirs, langs))], dtype=object)
    commits = np.array([hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
                        for i in range(num_docs)], dtype=object)

    lengths = rng.randint(20, 220, size=num_docs)
    contents = []
    for i in range(num_docs):
        n = lengths[i]
        toks = list(vocab[rng.choice(v, size=n, p=probs)])
        # mixed-case string literal every few docs
        if i % 3 == 0:
            toks.insert(int(rng.randint(0, n)), '"Mixed CASE Literal"')
        if i % 11 == 0:
            toks.insert(int(rng.randint(0, n)), str(EXTRAS[i % len(EXTRAS)]))
        if i % 53 == 0:  # >255-char token: skipped but consumes a position
            toks.insert(int(rng.randint(0, n)), "x" * 300)
        # assemble "source lines"
        lines = []
        for j in range(0, len(toks), 8):
            lines.append(" ".join(toks[j:j + 8]) + (";" if j % 16 else " {"))
        contents.append("\n".join(lines))

    return pd.DataFrame({
        "doc_id": doc_ids,
        "repo": repos,
        "path": paths,
        "commit": commits,
        "lang": langs,
        "content": np.array(contents, dtype=object),
    })
