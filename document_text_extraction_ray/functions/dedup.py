"""Deduplication kernels: shingling, MinHash, SimHash, n-gram Jaccard.

Standard public algorithms (Broder MinHash, Charikar SimHash, LSH banding)
implemented with numpy; everything deterministic (fixed hash seeds, no
wall-clock, no process-dependent ordering).  These are the per-document /
per-batch building blocks; the shuffle choreography lives in
stages/dedup.py.
"""

from __future__ import annotations

import zlib

import numpy as np

# 64-bit md5_number_lower-compatible hash shared with the fingerprint
# kernel — one definition keeps the SQL-oracle contract in one place.
from .textstats import md5_u64 as _feature_hash

# Deterministic universal-hash parameters for MinHash permutations:
# h_i(x) = (a_i * x + b_i) mod p   (p Mersenne prime 2^61-1)
_P = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _P, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _P, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_DEFAULT_PERMS = {}


def perm_params(num_perm: int):
    if num_perm not in _DEFAULT_PERMS:
        _DEFAULT_PERMS[num_perm] = _perm_params(num_perm)
    return _DEFAULT_PERMS[num_perm]


def char_shingles(text: str, k: int = 5) -> set:
    """Character k-shingles of normalized text."""
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        return {norm} if norm else set()
    return {norm[i: i + k] for i in range(len(norm) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)}


_SHINGLE_B = np.uint64(1000003)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte-window polynomial hashes (uint64) of the normalized
    text — fully vectorized (sliding_window_view x power vector, wrapping
    uint64 arithmetic), replacing a per-shingle Python crc32 loop.  Byte
    windows == char windows for ASCII; for multi-byte UTF-8 the window
    domain shifts, which only re-randomizes the hash family."""
    norm = " ".join(text.lower().split())
    if not norm:
        return np.zeros(0, dtype=np.uint64)
    data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        powers = _SHINGLE_B ** np.arange(len(data) - 1, -1, -1, dtype=np.uint64)
        return np.array([(data * powers).sum()], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    powers = _SHINGLE_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    # np.unique mirrors the shingle-SET semantics (hash-level dedup; a
    # collision merging two shingles is harmless for a min-hash).
    return np.unique((win * powers[None, :]).sum(axis=1))


def minhash_signature(text: str, num_perm: int = 128, k: int = 5) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a document."""
    hashes = shingle_hashes(text, k)
    if hashes.size == 0:
        return np.full(num_perm, np.uint64(_P), dtype=np.uint64)
    a, b = perm_params(num_perm)
    # (num_perm, n_shingles) universal hashes -> min over shingles, vectorized.
    vals = (hashes[None, :] * a[:, None] + b[:, None]) % np.uint64(_P)
    return vals.min(axis=1)


def band_keys(signature: np.ndarray, bands: int = 16) -> list:
    """LSH banding: split the signature into `bands` rows-per-band chunks and
    hash each chunk -> (band_id, band_hash) keys."""
    r = len(signature) // bands
    out = []
    for band in range(bands):
        chunk = signature[band * r: (band + 1) * r]
        out.append((band, zlib.crc32(chunk.tobytes())))
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard similarity (near-dup verification predicate)."""
    return jaccard(word_ngrams(text_a, n), word_ngrams(text_b, n))


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over word-ngram features (weighted bit voting)."""
    feats = word_ngrams(text, 2) | set(text.lower().split())
    if not feats:
        return 0
    acc = np.zeros(bits, dtype=np.int64)
    for f in feats:
        h = _feature_hash(f)
        for i in range(bits):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(texts, bits: int = 64) -> np.ndarray:
    """Vectorized SimHash for a batch of texts."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_idx = np.arange(bits, dtype=np.uint64)
    for row, text in enumerate(texts):
        feats = word_ngrams(text, 2) | set(text.lower().split())
        if not feats:
            continue
        hs = np.fromiter(
            (_feature_hash(f) for f in feats), dtype=np.uint64, count=len(feats)
        )
        # bits x feats sign matrix summed -> majority vote per bit
        votes = ((hs[None, :] >> bit_idx[:, None]) & np.uint64(1)).astype(np.int64)
        acc = (2 * votes - 1).sum(axis=1)
        word = np.uint64(0)
        for i in np.nonzero(acc > 0)[0]:
            word |= np.uint64(1) << np.uint64(i)
        out[row] = word
    return out


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


def simhash_band_keys(value: int, chunks: int = 4) -> list:
    """Split a 64-bit simhash into `chunks` 16-bit prefixes: two docs within
    hamming distance < chunks share at least one chunk (pigeonhole) —
    the LSH recall guarantee for the grouping stage."""
    width = 64 // chunks
    mask = (1 << width) - 1
    return [(c, (int(value) >> (c * width)) & mask) for c in range(chunks)]
