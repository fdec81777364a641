"""Text-analysis kernels: tokenization, quality scores, fingerprints,
language ID, shingles, MinHash, SimHash.

All are batch-level (called from ``map_batches``); heavy per-token work
uses numpy / hashlib over whole columns. Hashing is seeded + stable
(blake2b with fixed digest) — never Python's randomized ``hash()``.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa


TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, punctuation runs
BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    return len(BPE_RE.findall(text))


def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.lower().strip().encode()).hexdigest()


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Polynomial rolling hash over the whole normalized text (deterministic)."""
    h = 0
    for ch in text.lower().strip().encode():
        h = (h * 257 + ch) % mod
    return h


def word_set(text: str) -> frozenset[str]:
    return frozenset(text.split())


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _stable_hash64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode(), digest_size=8, salt=struct.pack("<q", seed)[:8])
    return int.from_bytes(h.digest(), "little")


_M61 = (1 << 61) - 1


class MinHasher:
    """n_perm universal-hash MinHash over string token sets (mergeable)."""

    def __init__(self, n_perm: int = 32, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.n_perm = n_perm
        self.a = rng.randint(1, _M61, size=n_perm, dtype=np.uint64)
        self.b = rng.randint(0, _M61, size=n_perm, dtype=np.uint64)

    def signature(self, tokens) -> np.ndarray:
        if not tokens:
            return np.full(self.n_perm, _M61, dtype=np.uint64)
        base = np.array([_stable_hash64(t) for t in tokens], dtype=np.uint64)
        # (a*x + b) mod M61 per permutation, vectorized over tokens
        sig = np.empty(self.n_perm, dtype=np.uint64)
        for i in range(self.n_perm):
            vals = (self.a[i] * base + self.b[i]) % _M61
            sig[i] = vals.min()
        return sig

    def bands(self, sig: np.ndarray, n_bands: int) -> list[int]:
        r = self.n_perm // n_bands
        out = []
        for bi in range(n_bands):
            band = sig[bi * r : (bi + 1) * r]
            out.append(_stable_hash64(",".join(map(str, band.tolist())), seed=bi))
        return out


def _md5_hash64(s: str) -> int:
    """64-bit token hash from the md5 digest's first 8 bytes —
    reproducible in SQL (DuckDB ``md5``), which makes the SimHash
    pipeline exactly oracle-checkable."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def simhash64(tokens) -> int:
    """64-bit SimHash over a token multiset (md5-based token hash)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = _md5_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---- vectorized column helpers (pyarrow in / out) ----

def add_quality_columns(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring columns: char count, token count, mean token length,
    uppercase ratio, punct ratio, stopword ratio (pandas-free, numpy over py strings)."""
    texts = batch.column(text_col).to_pylist()
    stop = {"the", "a", "and", "of", "to", "in"}
    n_chars, n_tokens, mean_tok, upper_r, punct_r, stop_r = [], [], [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        mean_tok.append(round(sum(map(len, toks)) / len(toks), 6) if toks else 0.0)
        total = max(1, len(t))
        upper_r.append(round(sum(c.isupper() for c in t) / total, 6))
        punct_r.append(round(sum(not c.isalnum() and not c.isspace() for c in t) / total, 6))
        stop_r.append(round(sum(w in stop for w in toks) / max(1, len(toks)), 6))
    return (
        batch.append_column("q_chars", pa.array(n_chars, pa.int64()))
        .append_column("q_tokens", pa.array(n_tokens, pa.int64()))
        .append_column("q_mean_token_len", pa.array(mean_tok, pa.float64()))
        .append_column("q_upper_ratio", pa.array(upper_r, pa.float64()))
        .append_column("q_punct_ratio", pa.array(punct_r, pa.float64()))
        .append_column("q_stopword_ratio", pa.array(stop_r, pa.float64()))
    )


LANG_PROFILES = {
    "en": {"the", "and", "of", "is", "was", "with"},
    "es": {"el", "la", "de", "es", "con", "por"},
    "fr": {"le", "la", "de", "est", "avec", "pour"},
    "de": {"der", "die", "das", "und", "ist", "mit"},
}


def lang_id(text: str) -> str:
    """n-gram/stopword-heuristic language ID; 'und' when no profile hits."""
    toks = set(text.lower().split())
    best, best_n = "und", 0
    for lang, prof in LANG_PROFILES.items():
        n = len(toks & prof)
        if n > best_n:
            best, best_n = lang, n
    return best
