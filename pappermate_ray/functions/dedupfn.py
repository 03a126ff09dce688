"""Dedup primitives: shingles, MinHash, SimHash, n-gram Jaccard.

Beyond-reference operators for the training-data pipeline (driver brief).
Standard public algorithms (Broder 1997 MinHash; Charikar 2002 SimHash).
All hashes derive from the deterministic FNV-1a in
``pappermate_ray.functions.quality`` — no Python ``hash()`` (which is
per-process salted) anywhere.
"""

from __future__ import annotations

from typing import List, Set

import numpy as np

from .quality import fnv1a64

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def shingles(text: str, k: int = 5) -> Set[int]:
    """Set of 64-bit hashes of word k-shingles (lowercased, ws-normalized)."""
    words = text.lower().split()
    if len(words) < k:
        return {fnv1a64(" ".join(words).encode("utf-8"))} if words else set()
    return {
        fnv1a64(" ".join(words[i : i + k]).encode("utf-8"))
        for i in range(len(words) - k + 1)
    }


def _perm_params(num_perm: int) -> tuple:
    """Deterministic (a, b) coefficient vectors for universal hashing."""
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict = {}


def minhash_signature(sh, num_perm: int = 128) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set (any
    iterable of uint64 hashes — set or ndarray)."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    if len(sh) == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    hv = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p, truncated to 32 bits — vectorized over shingles x perms
    phv = (np.outer(hv, a) + b) % _MERSENNE & np.uint64(_MAX_HASH)
    return phv.min(axis=0)


def lsh_bands(sig: np.ndarray, num_bands: int = 16) -> List[int]:
    """Band hashes for LSH bucketing: num_bands values, each hashing
    rows_per_band consecutive signature entries."""
    rows = len(sig) // num_bands
    out = []
    for band in range(num_bands):
        chunk = sig[band * rows : (band + 1) * rows]
        h = fnv1a64(chunk.tobytes()) & ((1 << 62) - 1)  # keep positive in int64
        out.append(h)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (signed-int64 view for Arrow)."""
    counts = {}
    for w in text.lower().split():
        counts[w] = counts.get(w, 0) + 1
    if not counts:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for w, c in counts.items():
        h = fnv1a64(w.encode("utf-8"))
        bits = np.fromiter(((h >> i) & 1 for i in range(64)), dtype=np.int64, count=64)
        v += (2 * bits - 1) * c
    h = 0
    for i in range(64):
        if v[i] > 0:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def ngram_set(text: str, n: int = 3) -> Set[str]:
    """Character n-grams of the lowercased, ws-collapsed text."""
    t = " ".join(text.lower().split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def jaccard(a: Set, b: Set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
