"""Hashing / sketching primitives for dedup & similarity: shingles,
MinHash, SimHash, exact Jaccard. Vectorized with numpy where the math
allows; all seeded/deterministic (mergeable-sketch discipline — one
signature per row, combinable across batches).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ocr_pipeline_ray.functions.textstats import tokenize

_MERSENNE = (1 << 61) - 1
_MAX_HASH = np.uint64((1 << 32) - 1)


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000
# odd constants for the k-gram positional combine (wraparound uint64
# multiply-add — a stable vectorized polynomial hash over token hashes)
_GRAM_C = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63],
    dtype=np.uint64,
)


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Stable 64-bit hash per token, memoized per process (vocabulary
    is tiny relative to token stream — this removes the per-shingle
    cryptographic hash from the hot path)."""
    out = np.empty(len(toks), dtype=np.uint64)
    cache = _TOKEN_CACHE
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = _stable_hash64(t)
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64, unique, sorted) — token
    hashes memoized, k-gram combination vectorized."""
    toks = tokenize(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    x = _token_hashes(toks)
    if len(x) < k:
        k = len(x)
    n_grams = len(x) - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(n_grams, dtype=np.uint64)
        for j in range(k):
            acc = acc * np.uint64(0x100000001B3) + x[j : j + n_grams] * _GRAM_C[j % len(_GRAM_C)]
    return np.unique(acc)


def minhash_params(num_perm: int = 128, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients (a*x + b) mod p, sized so uint64
    arithmetic never overflows (a < 2^29, x < 2^32, b < p=2^61-1)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 29, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm], values < 2^32).

    Broder's min-wise permutation estimate: the fraction of matching
    signature slots between two docs estimates their Jaccard.
    """
    if sh.size == 0:
        return np.full(a.shape[0], _MAX_HASH, dtype=np.uint64)
    x = sh.astype(np.uint64) & _MAX_HASH  # 32-bit domain, no overflow
    phv = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return (phv & _MAX_HASH).min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int, rows: int) -> list[int]:
    """Split a signature into ``bands`` bands of ``rows`` and hash each
    band — docs sharing any band key become LSH candidates."""
    assert bands * rows <= sig.shape[0]
    keys = []
    for band in range(bands):
        chunk = sig[band * rows : (band + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        keys.append(int.from_bytes(h, "big") >> 1)  # fit int64
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique uint64 shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


_INV31 = np.uint64(pow(31, -1, 1 << 64))  # modular inverse of 31 mod 2^64
_LEN_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_string_column(col) -> np.ndarray:
    """Vectorized uint64 hash of an Arrow string column — one numpy
    pass over the column's offsets + data buffers, zero per-row Python.

    Replaces ``pd.util.hash_array`` over object dtype in Arrow-native
    stages (the per-row PyObject boxing that conversion pays is the
    cost being avoided). Polynomial rolling hash with wraparound
    uint64 arithmetic: with prefix sums ``T[p] = sum_{q<p} (b[q]+1)*31^q``,
    each row's hash over bytes ``[start, end)`` is
    ``(T[end] - T[start]) * 31^-start  (mod 2^64)`` — the modular
    inverse turns per-row polynomial evaluation into two prefix-scan
    lookups. A splitmix64 finalizer disperses the low bits so
    ``h % num_buckets`` is uniform. Nulls hash as "" — ENFORCED with
    the validity buffer, not assumed from the offsets: the Arrow spec
    does not guarantee offset values under null slots for arrays from
    arbitrary producers (IPC, other libraries), so the hash of a null
    slot is overwritten with the ""-hash (0) after the vectorized
    pass rather than trusting whatever bytes the offsets span.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.cast(pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data_buf = col.buffers()[2]
    total = int(offs[-1])
    with np.errstate(over="ignore"):
        if data_buf is None or total == 0:
            h = np.zeros(n, dtype=np.uint64)
        else:
            b = np.frombuffer(data_buf, dtype=np.uint8)[:total].astype(np.uint64)
            pow31 = np.full(total, 31, dtype=np.uint64)
            pow31[0] = 1
            np.cumprod(pow31, out=pow31)  # 31^q mod 2^64, q in [0, total)
            t = np.empty(total + 1, dtype=np.uint64)
            t[0] = 0
            np.cumsum((b + np.uint64(1)) * pow31, out=t[1:])
            inv = np.full(total + 1, _INV31, dtype=np.uint64)
            inv[0] = 1
            np.cumprod(inv, out=inv)  # 31^-p mod 2^64
            h = (t[offs[1:]] - t[offs[:-1]]) * inv[offs[:-1]]
        h = h ^ ((offs[1:] - offs[:-1]).astype(np.uint64) * _LEN_MIX)
        # splitmix64 finalizer
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    if col.null_count:
        # "" hashes to 0 through this pipeline (zero-length span, zero
        # length-mix, splitmix64(0) == 0) — pin nulls to the same value
        null_mask = col.is_null().to_numpy(zero_copy_only=False)
        h[null_mask] = np.uint64(0)
    return h


def simhash64(text: str) -> int:
    """64-bit SimHash (Charikar) over token hashes: sign-sum of bits."""
    toks = tokenize(text.lower())
    if not toks:
        return 0
    hs = np.fromiter((_stable_hash64(t) for t in toks), dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[tuple[int, int]]:
    """Split a 64-bit simhash into ``bands`` equal bit-blocks; docs
    sharing any block are candidates (catches hamming distance <
    bands by pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(i, (h >> (i * width)) & mask) for i in range(bands)]
