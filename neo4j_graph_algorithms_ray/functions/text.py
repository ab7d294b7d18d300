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
    # null text counts as 0 matches: .str.count yields NaN there, and
    # NaN.astype(int64) wraps silently to INT64_MIN (garbage token/quality
    # numbers downstream) instead of raising
    return texts.str.count(pattern).fillna(0).to_numpy(dtype=np.int64)


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


_DUCK_CON = None


def _duck():
    """Per-process DuckDB connection used as a vectorized hash kernel.

    ``md5_number_lower(s)`` is bit-identical to
    ``int.from_bytes(md5(s)[8:16], 'little')`` (verified), so the C++ md5 is a
    drop-in for the Python loop at ~20x the throughput.  ``threads=1``: the
    kernel runs inside Ray map actors — parallelism comes from the actor
    pool, not from DuckDB fanning out threads per batch.
    """
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect(config={"threads": 1})
    return _DUCK_CON


def _string_table(values):
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return pa.table({"s": values})
    return pa.table({"s": pa.array(values, pa.string())})


def hash_strings(values) -> np.ndarray:
    """Deterministic 64-bit hashes (low 64 bits of md5, little-endian).

    Nulls hash as the empty string in BOTH paths: without the coalesce,
    DuckDB's ``md5_number_lower(NULL)`` is NULL and the uint64 cast turned
    it into undefined garbage, while the hashlib fallback raised — two
    different silent behaviors for the same input."""
    n = len(values)
    if n == 0:
        return np.array([], dtype=np.uint64)
    try:
        _t = _string_table(values)
        out = _duck().execute(
            "SELECT md5_number_lower(coalesce(s, '')) AS h FROM _t"
        ).fetch_arrow_table()
        return out["h"].to_numpy().astype(np.uint64, copy=False)
    except Exception:  # no duckdb / exotic input: slow exact fallback
        import hashlib

        vals = values.tolist() if hasattr(values, "tolist") else values
        out = np.empty(n, dtype=np.uint64)
        for i, v in enumerate(vals):
            s = v if isinstance(v, str) else ""
            out[i] = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")
        return out


def hash_strings_hex(values, algo: str = "md5") -> list[str]:
    """Vectorized hex digests (md5/sha256) with a hashlib fallback."""
    n = len(values)
    if n == 0:
        return []
    try:
        _t = _string_table(values)
        fn = {"md5": "md5", "sha256": "sha256"}[algo]
        out = _duck().execute(f"SELECT {fn}(s) AS h FROM _t").fetch_arrow_table()
        return out["h"].to_pylist()
    except Exception:
        import hashlib

        vals = values.tolist() if hasattr(values, "tolist") else values
        h = getattr(hashlib, algo)
        return [h(v.encode("utf-8")).hexdigest() for v in vals]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles -> 64-bit md5 hashes."""
    H, _ = batch_shingle_hashes([text], k)
    return H


def batch_shingle_hashes(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for many docs in ONE vectorized md5 pass.

    Returns ``(hashes, counts)``: the concatenated per-doc shingle hashes and
    the per-doc shingle counts (segment ``i`` spans
    ``[cumsum(counts)[i]-counts[i], cumsum(counts)[i])``).
    """
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        # null text participates as an empty doc (0 shingles) — matching the
        # null-tolerant exact-dedup/quality stages instead of a TypeError
        toks = WS_TOKEN_RE.findall(t) if isinstance(t, str) else []
        if len(toks) >= k:
            n = len(toks) - k + 1
            grams.extend(" ".join(toks[j : j + k]) for j in range(n))
            counts[i] = n
        elif toks:
            grams.append(" ".join(toks))
            counts[i] = 1
        else:
            counts[i] = 0
    return hash_strings(grams), counts


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

    def batch_signatures(self, texts, k: int = 3) -> np.ndarray:
        """(n_docs, num_perm) signatures — one md5 pass + segmented min.

        Empty docs get the all-``MINHASH_PRIME`` sentinel signature (same as
        ``signature([])``).

        The permutation pass loops over perms with Mersenne shift-fold
        reduction (M = 2^31 - 1, so ``v mod M`` is two ``(v & M) + (v >> 31)``
        folds + one conditional subtract): bit-identical to ``% M`` (the SQL
        oracle replays the same constants) while replacing the hot uint64
        division with shifts AND shrinking the working set from one
        (shingles x num_perm) matrix to a per-perm vector — measured ~20x
        on the signature stage.
        """
        H, counts = batch_shingle_hashes(texts, k)
        sig = np.full((len(counts), self.num_perm), MINHASH_PRIME, dtype=np.uint64)
        if len(H):
            x = H % MINHASH_PRIME
            starts = np.cumsum(counts) - counts
            # zero-count docs occupy no hash rows, so the nonzero starts
            # alone still delimit exact reduceat segments
            nz = counts > 0
            s_nz = starts[nz]
            M = np.uint64(MINHASH_PRIME)
            sh = np.uint64(31)
            for p in range(self.num_perm):
                v = x * self.a[p] + self.b[p]  # x, a < 2^31 -> v < 2^62 + 2^31
                v = (v & M) + (v >> sh)  # fold 1: < 2^32
                v = (v & M) + (v >> sh)  # fold 2: <= M + 1
                v[v >= M] -= M
                sig[nz, p] = np.minimum.reduceat(v, s_nz)
        return sig


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
    if rows < 1:
        # bands > num_perm would make every band key the empty string:
        # all docs in ONE LSH bucket, O(n^2) candidates, no error — refuse
        raise ValueError(
            f"band_keys: bands={bands} exceeds num_perm={num_perm}; every "
            "key would be empty and LSH would degenerate to one bucket"
        )
    view = sig_matrix[:, : bands * rows].reshape(n, bands, rows)
    return [["|".join(map(str, view[i, bnd])) for bnd in range(bands)] for i in range(n)]


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over word tokens (unweighted)."""
    return batch_simhash64([text])[0]


def batch_simhash64(texts) -> np.ndarray:
    """SimHashes for many docs — one md5 pass + segmented ±1 bit sums."""
    toks_all: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = WS_TOKEN_RE.findall(t.lower()) if isinstance(t, str) else []
        toks_all.extend(toks)
        counts[i] = len(toks)
    out = np.zeros(len(counts), dtype=np.uint64)
    if toks_all:
        hv = hash_strings(toks_all)
        # uint8 bit matrix via unpackbits (64 B/token transient) — the
        # previous uint64 shift matrix + int32 signed copy was ~768 B/token,
        # a worker-OOM risk on wide-document corpora.  bitorder='little' on
        # the little-endian uint64 bytes gives column k == bit k, identical
        # to the old (hv >> k) & 1; the signed sum 2*ones - n is the same
        # ±1 vote total (reduceat upcasts to int64, no uint8 overflow).
        bits = np.unpackbits(hv[:, None].view(np.uint8), axis=1, bitorder="little")
        starts = np.cumsum(counts) - counts
        nz = counts > 0
        ones = np.add.reduceat(bits, starts[nz], axis=0, dtype=np.int64)
        acc = 2 * ones - counts[nz][:, None]  # (docs, 64) signed vote sums
        out[nz] = (
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # one-pass popcount via unpackbits (same pattern as state/bfs_shards):
    # the previous 64-iteration shift/mask loop did 128 full-array passes
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return (
        np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def jaccard_word_ngrams(t1: str, t2: str, k: int = 3) -> float:
    return float(batch_jaccard_word_ngrams([t1], [t2], k)[0])


def batch_jaccard_word_ngrams(texts_a, texts_b, k: int = 3) -> np.ndarray:
    """Exact shingle-set Jaccard for many pairs — two md5 passes total."""
    Ha, ca = batch_shingle_hashes(texts_a, k)
    Hb, cb = batch_shingle_hashes(texts_b, k)
    ea, eb = np.cumsum(ca), np.cumsum(cb)
    out = np.empty(len(ca), dtype=np.float64)
    for i in range(len(ca)):
        A = np.unique(Ha[ea[i] - ca[i] : ea[i]])
        B = np.unique(Hb[eb[i] - cb[i] : eb[i]])
        if len(A) == 0 and len(B) == 0:
            out[i] = 1.0
            continue
        inter = np.intersect1d(A, B, assume_unique=True).size
        out[i] = inter / max(1, len(A) + len(B) - inter)
    return out


def rolling_hash(text: str, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over bytes (document fingerprinting)."""
    h = 0
    for ch in text.encode("utf-8"):
        h = (h * base + ch) % mod
    return h
