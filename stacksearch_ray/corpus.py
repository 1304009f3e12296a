"""Deterministic synthetic source-code corpus (FIXTURES.md F1, seed=42).

Schema is exactly BASELINE.json's input_hint:
``repo:string, path:string, commit:string, lang:string, content:string``.

Content mixes hot code terms (``def``, ``import``, ... — the skew the salted
merge must handle), long-tail identifiers, and natural-language docstrings.
The reference golden-query sentences (FIXTURES.md F3, verbatim from
/root/reference/main.py:184-193 and tests/test_index_query.py:31-33) are
embedded as the docstring of exactly one known document each, so golden
queries have a known best document.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import CORPUS_SCHEMA

SEED = 42

HOT_TERMS = ["def", "import", "self", "return", "class", "for", "if", "else",
             "while", "try", "except", "none", "true", "false", "print", "len"]

# Golden sentences (FIXTURES.md F3). Doc i carries sentence GOLDEN_SENTENCES[i].
GOLDEN_SENTENCES = [
    "Determine a user's timezone",
    "Converting ARBG to RGB alpha blending",
    "Regex: To pull out a sub-string between two tags in a string",
    "ASP.Net Custom Client-Side Validation",
    "What are the preferred versions of Vim and Emacs on Mac OS X",
    "Normalizing a Table with Low Integrity",
    "What is the best way to store connection string in .NET DLLs?",
    "What are the advantages of using SVN over CVS",
    "i have a pen i have an apple",
    "numpy python",
    "please work",
    "maple story good game",
]

_EXTS = [(".py", "python"), (".js", "javascript"), (".java", "java"), (".go", "go")]


_LINE_POOL_SIZE = 8192


def _line_pool(rng: np.random.Generator) -> np.ndarray:
    """Deterministic pool of pseudo-code lines; docs sample from it so
    generation is vectorized (a Python loop per line does not scale to
    the multi-100k-row bench corpora)."""
    k = rng.integers(0, 10_000, size=_LINE_POOL_SIZE)
    h1 = rng.integers(0, len(HOT_TERMS), size=_LINE_POOL_SIZE)
    h2 = rng.integers(0, len(HOT_TERMS), size=_LINE_POOL_SIZE)
    pool = np.empty(_LINE_POOL_SIZE, dtype=object)
    for i in range(_LINE_POOL_SIZE):
        words = [HOT_TERMS[h1[i]], f"var_{k[i] % 997}", HOT_TERMS[h2[i]],
                 f"helper_{k[i] % 211}", f"field_{k[i] % 53}"]
        rng.shuffle(words)
        pool[i] = " ".join(words)
    return pool


def generate_corpus(n_rows: int, seed: int = SEED,
                    lines: tuple[int, int] = (3, 40),
                    row_offset: int = 0) -> pa.Table:
    """Deterministic corpus table. Same (n_rows, seed, lines,
    row_offset) → identical bytes. ``lines`` controls per-doc size
    (bench uses heavier docs). ``row_offset`` shifts the identity
    fields (repo/path/commit) so CHUNKED generation — one call per
    chunk with its own seed and a running offset — yields globally
    collision-free doc ids without materializing one giant table
    (the 10M-doc scale drill's path); default 0 leaves every existing
    caller byte-identical."""
    rng = np.random.default_rng(seed)
    pool = _line_pool(rng)
    n_lines = rng.integers(lines[0], lines[1], size=n_rows)
    idx = rng.integers(0, _LINE_POOL_SIZE, size=int(n_lines.sum()))
    offsets = np.concatenate(([0], np.cumsum(n_lines)))
    repo, path, commit, lang, content = [], [], [], [], []
    join = "\n".join
    for j in range(n_rows):
        i = row_offset + j  # global identity; local j indexes the draws
        ext, lg = _EXTS[i % len(_EXTS)]
        repo.append(f"org{i % 7}/repo{i % 53}")
        path.append(f"src/pkg{i % 11}/mod{i}{ext}")
        commit.append(hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40])
        lang.append(lg)
        body = join(list(pool[idx[offsets[j]:offsets[j + 1]]]))
        if i < len(GOLDEN_SENTENCES):
            body = f'"""{GOLDEN_SENTENCES[i]}"""\n' + body
        content.append(body)
    return pa.table(
        {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content},
        schema=CORPUS_SCHEMA,
    )


def write_corpus(out_dir: str, n_rows: int, seed: int = SEED,
                 rows_per_file: int = 10_000,
                 lines: tuple[int, int] = (3, 40),
                 row_offset: int = 0) -> list[str]:
    """Write the corpus as multiple parquet files (partitioned source for
    resumable builds). Returns the file paths. ``row_offset`` passes
    through to generate_corpus (collision-free disjoint doc-id ranges
    for append/merge fixtures); default 0 is byte-identical to before."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(n_rows, seed, lines, row_offset)
    paths = []
    for start in range(0, max(n_rows, 1), rows_per_file):
        part = table.slice(start, rows_per_file)
        p = os.path.join(out_dir, f"part-{start // rows_per_file:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths
