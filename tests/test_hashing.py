import numpy as np

from ocr_pipeline_ray.functions.hashing import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    shingles,
    simhash64,
)


def test_jaccard_exact():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert jaccard(a, b) == 2 / 6
    assert jaccard(a, a) == 1.0
    assert jaccard(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a_set = np.unique(rng.integers(0, 1 << 32, 400).astype(np.uint64))
    # 80% overlap
    b_set = np.unique(
        np.concatenate([a_set[: int(len(a_set) * 0.8)], rng.integers(1 << 33, 1 << 34, 80).astype(np.uint64)])
    )
    true_j = jaccard(np.unique(a_set), np.unique(b_set))
    a, b = minhash_params(256)
    sa = minhash_signature(a_set, a, b)
    sb = minhash_signature(b_set, a, b)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.12  # 256 perms -> stderr ~ sqrt(j(1-j)/256) ~ 0.03


def test_minhash_deterministic():
    a, b = minhash_params(64)
    s = shingles("the quick brown fox jumps over the lazy dog", k=3)
    assert (minhash_signature(s, a, b) == minhash_signature(s, a, b)).all()


def test_lsh_identical_docs_collide():
    a, b = minhash_params(128)
    s = shingles("identical document text for lsh collision", k=2)
    k1 = lsh_band_keys(minhash_signature(s, a, b), 32, 4)
    k2 = lsh_band_keys(minhash_signature(s.copy(), a, b), 32, 4)
    assert k1 == k2


def test_simhash_similar_texts_close():
    t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    t2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    t3 = "completely different words about quantum tensor lattice shard computing"
    d_sim = hamming64(simhash64(t1), simhash64(t2))
    d_diff = hamming64(simhash64(t1), simhash64(t3))
    assert d_sim < d_diff
    assert d_sim <= 12
    assert simhash64(t1) == simhash64(t1)


def test_connected_components_chain_and_islands():
    """A chain a-b-c clusters transitively; disjoint pairs stay apart;
    label propagation converges and labels = min of component."""
    import pandas as pd
    import ray

    from ocr_pipeline_ray.pipelines.dedup import connected_components

    edges = ray.data.from_pandas(
        pd.DataFrame({"a": [7, 2, 10, 30, 31], "b": [2, 9, 11, 31, 32]})
    )
    got = connected_components(edges)
    want = {7: 2, 2: 2, 9: 2, 10: 10, 11: 10, 30: 30, 31: 30, 32: 30}
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_connected_components_multiblock_dtype_stability():
    """Regression: with MANY input blocks, some join buckets come back
    empty and their reindexed key columns promote to float64; mixed
    int/float blocks then hash-partition the SAME node into different
    buckets and split it into duplicate label rows. The int64 pin must
    keep every node to exactly one row with the component-min label."""
    import pandas as pd
    import ray

    from ocr_pipeline_ray.pipelines.dedup import connected_components

    # a path (several propagation rounds) spread over one-edge blocks
    # to force empty shuffle buckets (each round costs two shuffles,
    # so keep the diameter small enough for CI)
    n = 6
    a = list(range(100, 100 + n - 1))
    b = list(range(101, 100 + n))
    frames = [pd.DataFrame({"a": [x], "b": [y]}) for x, y in zip(a, b)]
    edges = ray.data.from_pandas(frames)
    got = connected_components(edges)
    assert got["doc_id"].is_unique, "node split into duplicate label rows"
    assert len(got) == n
    assert (got["cluster_id"] == 100).all()


def test_exact_jaccard_pairs_vs_bruteforce():
    """The inverted-index pairs equal the all-pairs O(n^2) scan."""
    import itertools

    import pyarrow.parquet as pq

    from ocr_pipeline_ray.functions.hashing import jaccard, shingles
    from ocr_pipeline_ray.pipelines.dedup import exact_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    got = exact_jaccard_pairs(sf, threshold=0.5)
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sh = {d: shingles(s, 3) for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    want = sorted(
        (a, b, round(jaccard(sh[a], sh[b]), 4))
        for a, b in itertools.combinations(sorted(sh), 2)
        if jaccard(sh[a], sh[b]) >= 0.5
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_hash_string_column_deterministic_and_slicing_invariant():
    import pyarrow as pa

    from ocr_pipeline_ray.functions.hashing import hash_string_column

    a = pa.array(["", "a", "b", "ab", "ba", "media-000123", "media-000124", "x" * 500, None])
    h = hash_string_column(a)
    # null hashes like ""
    assert h[8] == h[0]
    # distinct short strings disperse
    assert len(set(h.tolist())) == 8
    # same string -> same hash across arrays, chunking and slicing
    b = pa.chunked_array([pa.array(["media-000123"]), pa.array(["q", "media-000124"]).slice(1, 1)])
    h2 = hash_string_column(b)
    assert h2[0] == h[5] and h2[1] == h[6]
    hs = hash_string_column(a.slice(3, 4))
    assert (hs == h[3:7]).all()
    # large_string agrees with string
    hl = hash_string_column(pa.array(["ab", "ba"], pa.large_string()))
    assert (hl == h[3:5]).all()


def test_hash_string_column_bucket_uniformity():
    import pyarrow as pa

    from ocr_pipeline_ray.functions.hashing import hash_string_column

    h = hash_string_column(pa.array([f"media-{i:08d}" for i in range(20000)]))
    assert len(np.unique(h)) == 20000  # no collisions on a real vocab
    c = np.bincount((h % 64).astype(np.int64), minlength=64)
    assert c.min() > 20000 / 64 * 0.8 and c.max() < 20000 / 64 * 1.2


def test_hash_string_column_null_with_garbage_offsets():
    """The Arrow spec does not pin offset values under null slots:
    an array from an arbitrary producer may span garbage bytes there.
    The validity-buffer mask must pin the null's hash to the ""-hash
    regardless."""
    import pyarrow as pa

    from ocr_pipeline_ray.functions.hashing import hash_string_column

    # build [ "ab", NULL-spanning-"cd", "ef" ] from raw buffers: the
    # null slot's offsets (2, 4) cover real bytes "cd"
    validity = pa.py_buffer(bytes([0b101]))
    offsets = pa.py_buffer(np.array([0, 2, 4, 6], dtype=np.int32).tobytes())
    data = pa.py_buffer(b"abcdef")
    arr = pa.Array.from_buffers(pa.string(), 3, [validity, offsets, data])
    assert arr[1].as_py() is None
    h = hash_string_column(arr)
    clean = hash_string_column(pa.array(["ab", None, "ef"]))
    assert (h == clean).all()
    assert h[1] == hash_string_column(pa.array([""]))[0]
