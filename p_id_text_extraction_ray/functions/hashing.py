"""Dedup / similarity hashing kernels: shingles, MinHash, LSH bands, SimHash.

Standard public constructions (Broder '97 minwise hashing; Charikar '02
SimHash; LSH banding per Mining of Massive Datasets ch.3), implemented as
batch-level numpy kernels designed to run inside ``map_batches``:

* each document's word k-shingles hash to uint64 via blake2b (stable across
  processes — no PYTHONHASHSEED dependence),
* MinHash signatures use ``num_perm`` universal-hash permutations
  ``(a*x + b) mod p`` evaluated as one (num_perm, n_shingles) broadcast,
* LSH bucketing hashes each band of the signature to a uint64 key; the
  pipeline explodes (band_id, band_key, doc_id) rows and groups on the pair
  — an equi-key shuffle, never an all-pairs comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE61 = (1 << 61) - 1
_SEED = 42


def stable_hash64(token: str | bytes) -> int:
    """Process-stable 64-bit hash (blake2b truncation)."""
    if isinstance(token, str):
        token = token.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(token, digest_size=8).digest(), "little")


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-shingle hashes of a document -> sorted uint64 array.
    Documents with fewer than k words contribute one whole-text shingle."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.array([stable_hash64(g) for g in grams], dtype=np.uint64))


def _perm_coeffs(num_perm: int, seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, num_perm: int = 128,
                      seed: int = _SEED) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of one shingle set."""
    return minhash_signatures_batch([shingles], num_perm, seed)[0]


def minhash_signatures_batch(shingle_sets: list[np.ndarray], num_perm: int = 128,
                             seed: int = _SEED) -> np.ndarray:
    """Signatures for a batch of documents -> (n_docs, num_perm) uint64.

    One vectorized pass: concatenate all shingles, evaluate every permutation
    over the flat array in float-free uint64 math (Mersenne-prime modular
    multiply via 128-bit split), then segment-minimize per document.
    """
    n = len(shingle_sets)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    if lens.sum() == 0:
        return out
    flat = np.concatenate([s for s in shingle_sets if len(s)]).astype(np.uint64)
    owner = np.repeat(np.arange(n), lens)
    a, b = _perm_coeffs(num_perm, seed)
    # 64x64->128-bit modular multiply mod 2^61-1 using 32-bit limbs.
    x_lo = flat & np.uint64(0xFFFFFFFF)
    x_hi = flat >> np.uint64(32)
    for pi in range(num_perm):
        ai = a[pi]
        a_lo = ai & np.uint64(0xFFFFFFFF)
        a_hi = ai >> np.uint64(32)
        with np.errstate(over="ignore"):
            p0 = a_lo * x_lo                          # < 2^64, exact
            p1a = a_lo * x_hi                         # < 2^64, exact
            p1b = a_hi * x_lo                         # < 2^61, exact
            p2 = a_hi * x_hi                          # < 2^61, exact
        # value = p0 + (p1a+p1b)*2^32 + p2*2^64, reduced mod 2^61-1 piecewise
        # (each reduced term < 2^61, so the sum fits in uint64).
        m = np.uint64(_MERSENNE61)
        v = (_mod_m61(p0) + _mod_m61_shift(p1a, 32) + _mod_m61_shift(p1b, 32)
             + _mod_m61_shift(p2, 64)) % m
        v = (v + b[pi]) % m
        np.minimum.at(out[:, pi], owner, v)
    return out


def _mod_m61(x: np.ndarray) -> np.ndarray:
    m = np.uint64(_MERSENNE61)
    return x % m


def _mod_m61_shift(x: np.ndarray, shift: int) -> np.ndarray:
    """(x << shift) mod 2^61-1, exploiting 2^61 ≡ 1: rotate within 61 bits."""
    m = np.uint64(_MERSENNE61)
    x = x % m
    s = shift % 61
    hi = x >> np.uint64(61 - s)
    lo = (x << np.uint64(s)) & m
    return (hi + lo) % m


def lsh_band_keys(signatures: np.ndarray, num_bands: int) -> np.ndarray:
    """Hash each band of each signature -> (n_docs, num_bands) uint64 keys.
    Docs sharing any (band_id, key) become LSH candidates."""
    n, num_perm = signatures.shape
    assert num_perm % num_bands == 0, "num_perm must divide into equal bands"
    rows = num_perm // num_bands
    keys = np.empty((n, num_bands), dtype=np.uint64)
    for bi in range(num_bands):
        band = signatures[:, bi * rows:(bi + 1) * rows]
        keys[:, bi] = _fold_u64(band)
    return keys


def _fold_u64(mat: np.ndarray) -> np.ndarray:
    """Mix each row of a uint64 matrix into one uint64 (FNV-style fold)."""
    h = np.full(len(mat), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for c in range(mat.shape[1]):
            h = (h ^ mat[:, c]) * prime
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two sorted-unique uint64 shingle arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (Charikar '02): sign-sum of token-hash
    bit vectors."""
    words = text.lower().split()
    if not words:
        return 0
    hashes = np.array([stable_hash64(w) for w in words], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    score = bits.astype(np.int64).sum(axis=0) * 2 - len(words)
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: np.ndarray, b: int | np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), np.uint64(b) if np.isscalar(b) else b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
