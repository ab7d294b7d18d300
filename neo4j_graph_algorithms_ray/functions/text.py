"""Vectorized text kernels for the training-data-prep pipelines.

Design constraint: every kernel that backs a ``queries()`` entry must be
replicable in ANSI SQL on DuckDB (the correctness oracle), so patterns are
ASCII-explicit (python ``re`` is unicode-aware, DuckDB's RE2 is not) and
hashing uses either SHA/MD5 (both engines) or pandas' fixed-key SipHash
(deterministic across processes, vectorized — used only on the rows-only
paths like MinHash).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

WS_TOKEN_RE = re.compile(r"[^ \t\n\r]+")
BPE_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]")
WORD_RE = re.compile(r"[A-Za-z0-9_]+")
PUNCT_RE = re.compile(r"[^A-Za-z0-9 \t\n\r]")
UPPER_RE = re.compile(r"[A-Z]")
NORM_WS_RE = re.compile(r"[ \t\n\r]+")

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")
STOPWORD_RE = re.compile(r"\b(?:" + "|".join(STOPWORDS) + r")\b")

# language-id marker tokens (fixed precedence order for ties)
LANG_MARKERS = [
    ("en", ("the", "and", "of", "to", "a", "is")),
    ("de", ("der", "und", "die", "das", "ist", "nicht")),
    ("fr", ("le", "la", "et", "les", "des", "est")),
    ("es", ("el", "los", "las", "y", "por", "una")),
]
LANG_RES = [(lang, re.compile(r"\b(?:" + "|".join(ws) + r")\b")) for lang, ws in LANG_MARKERS]


def count_matches(texts: pd.Series, pattern: re.Pattern) -> np.ndarray:
    return texts.str.count(pattern).to_numpy(dtype=np.int64)


def normalize_ws(texts: pd.Series) -> pd.Series:
    """lower(trim(collapse-whitespace)) — ``regexp_replace(...,'g')`` in SQL."""
    return texts.str.replace(NORM_WS_RE, " ", regex=True).str.strip().str.lower()


def lang_scores(texts: pd.Series) -> dict[str, np.ndarray]:
    low = texts.str.lower()
    return {lang: count_matches(low, pat) for lang, pat in LANG_RES}


def lang_predict(texts: pd.Series) -> np.ndarray:
    """argmax marker count in precedence order; all-zero -> 'unknown'."""
    scores = lang_scores(texts)
    langs = [lang for lang, _ in LANG_MARKERS]
    mat = np.stack([scores[lang] for lang in langs], axis=1)
    best = np.argmax(mat, axis=1)  # first max wins = precedence order
    pred = np.asarray(langs, dtype=object)[best]
    pred[mat.max(axis=1) == 0] = "unknown"
    return pred


# ---------------------------------------------------------------------------
# hashing / sketches — md5-based so every kernel is DuckDB-replicable
# (``md5_number_lower(x)`` == little-endian uint64 of md5 digest bytes 8:16)
# ---------------------------------------------------------------------------

# MinHash modulus: Mersenne prime 2^31-1.  Products a*h then fit in int64 on
# both engines (numpy uint64 without wraparound, DuckDB BIGINT without
# overflow) — the price of SQL replicability is a 31-bit hash space, which is
# ample for min-over-shingles sketches (collisions perturb one permutation
# slot with p ~ 2^-31 per shingle pair).
MINHASH_PRIME = np.uint64((1 << 31) - 1)


def hash_strings(values) -> np.ndarray:
    """Deterministic 64-bit hashes (low 64 bits of md5, little-endian)."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[8:16], "little")
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles -> 64-bit md5 hashes."""
    toks = WS_TOKEN_RE.findall(text)
    if len(toks) < k:
        return hash_strings([" ".join(toks)]) if toks else np.array([], dtype=np.uint64)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return hash_strings(grams)


class MinHasher:
    """num_perm independent permutations h_i(x) = (a_i*(x mod M) + b_i) mod M,
    M = 2^31-1; a/b drawn from a fixed Philox stream (the same constants are
    embedded into the DuckDB oracle SQL, so signatures are SQL-checkable)."""

    def __init__(self, num_perm: int = 64, seed: int = 12345):
        self.a, self.b = minhash_perm_constants(num_perm, seed)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, MINHASH_PRIME, dtype=np.uint64)
        x = (shingles % MINHASH_PRIME)[:, None]
        hv = (x * self.a[None, :] + self.b[None, :]) % MINHASH_PRIME
        return hv.min(axis=0)


def minhash_perm_constants(num_perm: int = 64, seed: int = 12345):
    """The (a, b) permutation constants — shared with the SQL oracle."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    a = rng.integers(1, int(MINHASH_PRIME), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(MINHASH_PRIME), size=num_perm, dtype=np.uint64)
    return a, b


def band_keys(sig_matrix: np.ndarray, bands: int) -> list[list[str]]:
    """Per-doc LSH band keys: '|'-joined signature rows (SQL: string_agg)."""
    n, num_perm = sig_matrix.shape
    rows = num_perm // bands
    view = sig_matrix[:, : bands * rows].reshape(n, bands, rows)
    return [["|".join(map(str, view[i, bnd])) for bnd in range(bands)] for i in range(n)]


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over word tokens (unweighted)."""
    toks = WS_TOKEN_RE.findall(text.lower())
    if not toks:
        return np.uint64(0)
    hv = hash_strings(toks)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def jaccard_word_ngrams(t1: str, t2: str, k: int = 3) -> float:
    s1 = set(map(int, shingle_hashes(t1, k)))
    s2 = set(map(int, shingle_hashes(t2, k)))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / max(1, len(s1 | s2))


def rolling_hash(text: str, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over bytes (document fingerprinting)."""
    h = 0
    for ch in text.encode("utf-8"):
        h = (h * base + ch) % mod
    return h
