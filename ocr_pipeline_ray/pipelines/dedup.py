"""Deduplication pipelines over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (per the aggregation-at-scale discipline):

* exact: hash column per batch (vectorized) -> ``groupby(hash)`` keep
  min doc_id. ONE shuffle over (hash, doc_id) pairs only — the text
  never moves.
* MinHash-LSH: signature per row (``map_batches``) -> explode to
  (band_id, band_key, doc_id) rows -> ``groupby(band)`` emits
  candidate pairs -> exact-Jaccard verify on the pair list. The
  all-pairs matrix is never formed; only same-bucket pairs shuffle.
* SimHash: 64-bit fingerprint per row -> pigeonhole band buckets ->
  verify Hamming distance <= threshold.
* embedding near-dup: blocked cosine against a broadcast matrix (see
  similarity.py) — candidates above threshold.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ocr_pipeline_ray.functions.hashing import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    shingles,
    simhash64,
    simhash_band_keys,
)
from ocr_pipeline_ray.pipelines.relational import _read

MINHASH_PERMS = 128
LSH_BANDS = 32
LSH_ROWS = 4  # 32 bands x 4 rows: ~50% candidate recall at J=0.5, >99% at J=0.8


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: surviving doc_id = min(doc_id) per identical text.

    Hash-partition + per-group first (SURVEY-prompt dedup item). The
    md5 is computed per batch; the groupby shuffles only (hash, doc_id).
    """
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(hashes, pa.string())], names=["doc_id", "h"]
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [g["doc_id"].min()]})

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text) ORDER BY doc_id
"""


class _MinhashBands:
    """Actor: MinHash params built once; per batch emit band rows."""

    def __init__(self, num_perm=MINHASH_PERMS, bands=LSH_BANDS, rows=LSH_ROWS, shingle_k=3):
        self.a, self.b = minhash_params(num_perm)
        self.bands, self.rows, self.k = bands, rows, shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_keys = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(shingles(text, self.k), self.a, self.b)
            for band_id, key in enumerate(lsh_band_keys(sig, self.bands, self.rows)):
                doc_ids.append(doc_id)
                band_ids.append(band_id)
                band_keys.append(key)
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.int64()),
                pa.array(band_ids, pa.int32()),
                pa.array(band_keys, pa.int64()),
            ],
            names=["doc_id", "band_id", "band_key"],
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ii], "b": ids[jj]})


def minhash_candidate_pairs(sf_dir: str, shingle_k: int = 3) -> pd.DataFrame:
    """LSH candidate pairs (unverified), deduplicated across bands."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(
        _MinhashBands,
        fn_constructor_kwargs={"shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = (
        bands.groupby(["band_id", "band_key"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return pairs.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


def minhash_lsh_dedup(sf_dir: str, threshold: float = 0.8, shingle_k: int = 3) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs verified by exact Jaccard >= threshold.

    Verification broadcasts only the candidate docs' shingle sets
    (candidates << corpus); returns (a, b, jacc) pairs.
    """
    pairs = minhash_candidate_pairs(sf_dir, shingle_k)
    if pairs.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "jacc": pd.Series(dtype="float64")}
        )
    need = set(pairs["a"]).union(pairs["b"])
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(need)]
    sh = {r.doc_id: shingles(r.text, shingle_k) for r in docs.itertuples()}
    jc = [jaccard(sh[a], sh[b]) for a, b in zip(pairs["a"], pairs["b"])]
    pairs = pairs.assign(jacc=np.round(jc, 4))
    out = pairs[pairs["jacc"] >= threshold].reset_index(drop=True)
    return out


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, shingle_k: int = 3) -> pd.DataFrame:
    """n-gram Jaccard similarity pairs, LSH-pruned then exact-verified
    (same machinery, lower threshold — the scale path never computes
    the O(n^2) matrix)."""
    return minhash_lsh_dedup(sf_dir, threshold=threshold, shingle_k=shingle_k)


class _Simhash:
    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [simhash64(s) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(np.array(hs, dtype=np.uint64).astype(np.int64), pa.int64())],
            names=["doc_id", "simhash"],
        )


def simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (
        ds.map_batches(_Simhash, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def simhash_neardup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs: pigeonhole banding (4 x 16-bit blocks
    catches all pairs with hamming <= 3) then exact Hamming verify."""
    fps = simhash_fingerprints(sf_dir)
    sig = {r.doc_id: np.uint64(r.simhash).item() & 0xFFFFFFFFFFFFFFFF for r in fps.itertuples()}
    rows = []
    for doc_id, h in sig.items():
        for band_id, key in simhash_band_keys(h, bands=4):
            rows.append((doc_id, band_id, key))
    bdf = pd.DataFrame(rows, columns=["doc_id", "band_id", "key"])
    pairs = (
        ray.data.from_pandas(bdf)
        .groupby(["band_id", "key"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")}
        )
    ham = [hamming64(sig[a], sig[b]) for a, b in zip(pairs["a"], pairs["b"])]
    pairs = pairs.assign(hamming=ham)
    return (
        pairs[pairs["hamming"] <= max_hamming]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
