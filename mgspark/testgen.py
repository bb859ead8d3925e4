"""Deterministic synthesis of the F1 source-code-repos table.

BASELINE.json ``input_hint`` fixes the input shape: an Iceberg-shaped
table ``(repo, path, commit, lang, content)``.  No external data exists
in the sandbox, so tests and benchmarks synthesize it deterministically
(seed=42 convention, FIXTURES.md F1): Zipf-distributed repos (skew for
the salting path), extension-consistent ``lang``, and ``content`` built
from a ~200-word Zipf vocabulary.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

__all__ = [
    "repo_table_pandas",
    "write_repo_table",
    "write_clustered_embeddings_parquet",
    "VOCAB_SIZE",
]

VOCAB_SIZE = 200

_EXT_LANG = [
    ("py", "Python"),
    ("md", "Markdown"),
    ("rs", "Rust"),
    ("js", "JavaScript"),
    ("ts", "TypeScript"),
    ("java", "Java"),
    ("go", "Go"),
    ("c", "C"),
    ("h", "C"),
    ("txt", "Text"),
    ("json", "JSON"),
    ("yml", "YAML"),
]


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def repo_table_pandas(
    n_rows: int,
    seed: int = 42,
    min_tokens: int = 10,
    max_tokens: int = 120,
) -> pd.DataFrame:
    """Generate ``n_rows`` of (repo, path, commit, lang, content)."""
    rng = np.random.default_rng(seed)

    n_repos = max(4, n_rows // 50)
    repo_idx = rng.choice(n_repos, size=n_rows, p=_zipf_probs(n_repos, 1.3))
    repos = np.array([f"org{i % 37}/repo{i}" for i in range(n_repos)])[repo_idx]

    ext_idx = rng.choice(len(_EXT_LANG), size=n_rows, p=_zipf_probs(len(_EXT_LANG), 1.1))
    exts = np.array([e for e, _ in _EXT_LANG])[ext_idx]
    langs = np.array([lang for _, lang in _EXT_LANG])[ext_idx]

    dirs_a = rng.integers(0, 20, size=n_rows)
    dirs_b = rng.integers(0, 50, size=n_rows)
    files = rng.integers(0, 1000, size=n_rows)
    paths = np.array(
        [f"dir{a}/dir{b}/file{f}.{e}" for a, b, f, e in zip(dirs_a, dirs_b, files, exts)]
    )

    commits = np.array(
        [
            hashlib.sha1(f"{r}/{p}#{i}".encode()).hexdigest()
            for i, (r, p) in enumerate(zip(repos, paths))
        ]
    )

    vocab = np.array([f"tok{i}" for i in range(VOCAB_SIZE)])
    vocab_p = _zipf_probs(VOCAB_SIZE, 1.2)
    lengths = rng.integers(min_tokens, max_tokens + 1, size=n_rows)
    total = int(lengths.sum())
    token_stream = vocab[rng.choice(VOCAB_SIZE, size=total, p=vocab_p)]
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    contents = np.array(
        [" ".join(token_stream[bounds[i] : bounds[i + 1]]) for i in range(n_rows)]
    )

    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def write_clustered_embeddings_parquet(
    path: str,
    n_pairs: int = 40,
    n_singles: int = 80,
    dim: int = 32,
    noise: float = 0.02,
    seed: int = 42,
) -> str:
    """Deterministic CLUSTERED embedding fixture for near-dup recall
    oracles: ``n_pairs`` base unit vectors each with one near-identical
    copy (cosine ~0.9998 at the default noise), plus ``n_singles``
    unrelated vectors.  The sf tables' embeddings are near-random (max
    pairwise cosine ~0.5), so near-dup recall needs planted structure.
    Spark-free (pyarrow), idempotent, atomic — safe at import time.

    Ids: base i -> i, its copy -> 1000+i, singles -> 2000+j.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)

    def unit(v: np.ndarray) -> np.ndarray:
        return v / max(float(np.linalg.norm(v)), 1e-12)

    ids, vecs = [], []
    for i in range(n_pairs):
        base = unit(rng.standard_normal(dim))
        ids.append(i)
        vecs.append(base)
        ids.append(1000 + i)
        vecs.append(unit(base + noise * rng.standard_normal(dim)))
    for j in range(n_singles):
        ids.append(2000 + j)
        vecs.append(unit(rng.standard_normal(dim)))
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def write_repo_table(path: str, n_rows: int, seed: int = 42, n_files: int = 1) -> str:
    """Write the synthetic repo table as parquet (idempotent by marker).

    ``n_files > 1`` splits the table into that many parquet files so the
    scan yields enough input splits to exercise all local cores (the
    sandbox stand-in for a many-file Iceberg table).
    """
    marker = os.path.join(path, "_MGSPARK_DONE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    if n_files <= 1:
        repo_table_pandas(n_rows, seed=seed).to_parquet(
            os.path.join(path, "repos.parquet"), index=False
        )
    else:
        # Chunked generation keeps memory O(n_rows / n_files); each chunk
        # is deterministic via a derived seed.
        chunk = (n_rows + n_files - 1) // n_files
        for i in range(n_files):
            rows = min(chunk, n_rows - i * chunk)
            if rows <= 0:
                break
            repo_table_pandas(rows, seed=seed + i).to_parquet(
                os.path.join(path, f"repos_{i:04d}.parquet"), index=False
            )
    with open(marker, "w", encoding="utf8") as f:
        f.write(f"rows={n_rows} seed={seed} files={n_files}\n")
    return path
