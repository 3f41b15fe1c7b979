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
