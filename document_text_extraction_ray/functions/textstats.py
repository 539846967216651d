"""Text analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting (per the training-data-pipeline operator mandate).

All pure per-document functions; deterministic; regexes compiled at import.
The stopword-ratio style follows the reference's threshold-heuristic idiom
(approach4_v1.py length guards / grid_detector_v4.py fixed ratios); the
algorithms themselves are standard public techniques (n-gram/stopword
language ID, Rabin-Karp rolling hash, winnowing fingerprints).
"""

from __future__ import annotations

import hashlib
import re
import zlib


def md5_u64(s: str) -> int:
    """64-bit string hash = little-endian last 8 md5 bytes — exactly
    DuckDB's ``md5_number_lower``, the shared hash for every SQL-replayable
    kernel (fingerprints, simhash features)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")

WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer in the GPT-2 style (public pattern family):
# contractions, letter runs, digit runs, punctuation runs, whitespace.
BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

# Tiny per-language stopword profiles (top function words). Enough signal for
# the synthetic/testdata corpora; swap for fasttext-style models via the
# actor-pool stage when available.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "on", "as", "are", "this", "be", "at", "by", "not"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "von", "mit", "den",
           "des", "ein", "eine", "zu", "im", "für", "auf", "als", "auch"},
    "fr": {"le", "la", "les", "et", "des", "est", "dans", "que", "pour",
           "une", "du", "par", "sur", "avec", "pas", "au", "ce", "il"},
    "es": {"el", "la", "los", "las", "y", "es", "en", "que", "por", "una",
           "del", "con", "para", "su", "se", "no", "al", "lo", "como"},
    "ta": {"ஒரு", "என்று", "மற்றும்", "இந்த", "அது", "என", "உள்ள", "இது"},
}


def tokenize_ws(text: str) -> list:
    """Whitespace tokens (the reference's implicit split semantics)."""
    return text.split()


def count_tokens_ws(text: str) -> int:
    return len(text.split())


def count_tokens_bpe(text: str) -> int:
    """BPE-ish pre-token count (regex pass, no model)."""
    return len(BPE_RE.findall(text))


def detect_language(text: str) -> str:
    """Stopword-profile language ID. Returns the best-scoring language code
    or 'und' when no profile matches."""
    words = [w.lower() for w in WORD_RE.findall(text)]
    if not words:
        return "und"
    wordset = set(words)
    best, best_hits = "und", 0
    for lang in sorted(STOPWORDS):  # sorted -> deterministic tie-break
        hits = len(wordset & STOPWORDS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def quality_int_features(text: str) -> dict:
    """Integer-exact quality features — the SINGLE source for both
    ``quality_score`` and the oracle-checked ``quality_features`` query
    (the SQL oracle hand-mirrors these; keeping one kernel prevents the two
    from silently desynchronizing)."""
    tokens = text.split()
    lower = {t.lower().strip(".,;:!?") for t in tokens}
    return {
        "n_chars": len(text),
        "n_tokens": len(tokens),
        "n_punct": len(PUNCT_RE.findall(text)),
        "stop_hits": len(lower & STOPWORDS["en"]),
        "n_distinct_lower": len(lower),
    }


def quality_score(text: str) -> dict:
    """Length / punctuation / stopword-ratio quality features plus a single
    [0,1] score (fixed-threshold style of the reference's guards, M17)."""
    f = quality_int_features(text)
    n_chars, n_tokens = f["n_chars"], f["n_tokens"]
    if n_tokens == 0:
        return {
            "n_chars": 0, "n_tokens": 0, "mean_token_len": 0.0,
            "punct_ratio": 0.0, "stopword_ratio": 0.0, "score": 0.0,
        }
    stopword_ratio = f["stop_hits"] / f["n_distinct_lower"]
    punct_ratio = f["n_punct"] / n_chars
    mean_token_len = (n_chars - (n_tokens - 1)) / n_tokens
    score = 1.0
    if n_chars < 50:
        score *= 0.2
    if punct_ratio > 0.2:
        score *= 0.5
    if mean_token_len < 2.0 or mean_token_len > 12.0:
        score *= 0.5
    score *= min(1.0, 0.3 + stopword_ratio * 3.0)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": round(mean_token_len, 4),
        "punct_ratio": round(punct_ratio, 6),
        "stopword_ratio": round(stopword_ratio, 6),
        "score": round(score, 6),
    }


_B = 1_000_003        # Rabin-Karp base
_M = (1 << 61) - 1    # Mersenne prime modulus


def rolling_hashes(tokens: list, window: int = 8) -> list:
    """Rabin-Karp rolling hashes over the md5_u64 token hash stream
    (document fingerprinting building block; SQL-replayable)."""
    hs = [md5_u64(t) for t in tokens]
    if len(hs) < window:
        if not hs:
            return []
        acc = 0
        for h in hs:
            acc = (acc * _B + h) % _M
        return [acc]
    out = []
    power = pow(_B, window - 1, _M)
    acc = 0
    for h in hs[:window]:
        acc = (acc * _B + h) % _M
    out.append(acc)
    for i in range(window, len(hs)):
        acc = ((acc - hs[i - window] * power) * _B + hs[i]) % _M
        out.append(acc)
    return out


def fingerprint(text: str, window: int = 8, keep: int = 16) -> list:
    """Winnowing-style fingerprint: the `keep` smallest rolling hashes
    (sorted, deduplicated) — a compact, order-insensitive sketch usable as a
    mergeable per-batch partial."""
    hashes = rolling_hashes(text.split(), window)
    return sorted(set(hashes))[:keep]


def winnow(text: str, k: int = 8, w: int = 4) -> list:
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): character
    k-gram hashes over ``lower(text)``; each length-``w`` window of
    consecutive gram positions selects its MINIMUM hash, rightmost position
    on ties; selections are deduplicated.  Unlike ``fingerprint`` (bottom-k
    sketch, order-insensitive), this keeps POSITIONS and carries the MOSS
    guarantee: any shared substring of length >= w + k - 1 between two
    documents shares at least one selected fingerprint.

    Returns sorted distinct ``(pos, fp)`` with 1-based gram-start positions.
    Hashes are ``md5_u64 % 2^52`` so both engines compare identical int64s
    (DuckDB HUGEINT-mod replay); documents shorter than ``k`` select
    nothing; ``k <= len < k + w - 1`` selects from one truncated window."""
    import numpy as np

    s = text.lower()
    m = len(s) - k + 1
    if m < 1:
        return []
    mod = 1 << 52
    arr = np.fromiter(
        (md5_u64(s[i:i + k]) % mod for i in range(m)),
        dtype=np.int64, count=m,
    )
    if m <= w:
        mn = int(arr.min())
        pos = int(np.flatnonzero(arr == mn).max())
        return [(pos + 1, mn)]
    wv = np.lib.stride_tricks.sliding_window_view(arr, w)
    rev = wv[:, ::-1].argmin(axis=1)
    sel = (w - 1 - rev) + np.arange(wv.shape[0])
    return sorted({(int(p) + 1, int(arr[p])) for p in sel})


def content_hash(text: str) -> int:
    """Stable 63-bit content hash of normalized text (exact-dedup key).

    Masked to int64-positive range: Ray Data's shuffle/aggregate paths convert
    key values through Python ints -> Arrow int64, so uint64-range keys
    overflow (observed in the groupby reduce)."""
    norm = " ".join(text.split()).encode("utf-8")
    h = zlib.crc32(norm) | (zlib.crc32(norm[::-1]) << 32)
    return h & 0x7FFF_FFFF_FFFF_FFFF


class HyperLogLog:
    """Minimal HLL sketch (2^p registers, crc-based hashing): the mergeable
    per-batch partial for approximate distinct counts (ray_guide 'sketches
    are designed to be mergeable').  Deterministic; standard bias-corrected
    estimator from the public HLL literature."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = bytearray(self.m)

    def add(self, value) -> None:
        import hashlib

        # blake2b, not crc32: CRC's linearity skews register ranks (observed
        # 18% distinct-count bias); a real avalanche hash restores the
        # 1.04/sqrt(m) error bound.
        h = int.from_bytes(
            hashlib.blake2b(repr(value).encode(), digest_size=8).digest(),
            "little",
        )
        idx = h & (self.m - 1)
        w = h >> self.p
        rank = 1
        while w & 1 == 0 and rank <= 64 - self.p:
            rank += 1
            w >>= 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = bytearray(
            max(a, b) for a, b in zip(self.registers, other.registers)
        )
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        s = sum(2.0 ** -r for r in self.registers)
        e = alpha * m * m / s
        zeros = self.registers.count(0)
        if e <= 2.5 * m and zeros:
            import math

            e = m * math.log(m / zeros)   # small-range correction
        return e

    def to_bytes(self) -> bytes:
        return bytes(self.registers)

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        out = cls(p)
        out.registers = bytearray(data)
        return out
