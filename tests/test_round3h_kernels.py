"""Adversarial tests for the round-3h distributed kernels: the shared
midrank reduction under heavy ties, sorted-neighborhood block-boundary
pairs, exact PERCENTILE_CONT interpolation, and determinism of the
LCG-seeded resampling streams."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ocr_pipeline_ray.pipelines.relational import _rank_sum_stats


def _hist_ds(x: np.ndarray, is_a: np.ndarray, n_buckets: int, n_blocks: int = 7):
    lo, hi = float(x.min()), float(x.max())
    width = (hi - lo) / n_buckets or 1.0
    dfs = []
    for part in np.array_split(np.arange(len(x)), n_blocks):
        g = (
            pd.DataFrame({"x": x[part], "c": 1, "ca": is_a[part].astype("int64")})
            .groupby("x", as_index=False)
            .sum()
        )
        g["__bucket"] = np.clip(
            np.floor((g["x"].to_numpy() - lo) / width).astype("int64"), 0, n_buckets - 1
        )
        dfs.append(g)
    return ray.data.from_pandas(dfs)


def _ref_ranksum(x: np.ndarray, is_a: np.ndarray):
    """Sequential midrank reference."""
    order = np.argsort(x, kind="mergesort")
    xs = x[order]
    ranks = np.empty(len(x), dtype="float64")
    i = 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j] == xs[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank of 1-based ranks i+1..j
        i = j
    return float(ranks[is_a].sum())


@pytest.mark.parametrize("seed", [0, 1])
def test_rank_sum_stats_heavy_ties(seed):
    rng = np.random.default_rng(seed)
    # heavy ties: only 9 distinct values over 500 rows, plus one giant tie
    x = rng.integers(0, 9, 500).astype("float64")
    x[:200] = 4.0
    is_a = rng.random(500) < 0.4
    s = _rank_sum_stats(_hist_ds(x, is_a, n_buckets=16), 16)
    assert s["n"] == 500
    assert s["na"] == int(is_a.sum())
    assert s["ra"] == pytest.approx(_ref_ranksum(x, is_a), abs=1e-9)
    # tie term: sum over distinct values of t^3 - t
    _, counts = np.unique(x, return_counts=True)
    assert s["ties"] == float((counts.astype("int64") ** 3 - counts).sum())


def test_rank_sum_stats_all_equal_single_bucket():
    x = np.full(100, 3.14)
    is_a = np.zeros(100, dtype=bool)
    is_a[:10] = True
    s = _rank_sum_stats(_hist_ds(x, is_a, n_buckets=8), 8)
    # everyone shares midrank (n+1)/2
    assert s["ra"] == pytest.approx(10 * 101 / 2.0)
    assert s["ties"] == 100**3 - 100


def test_sorted_neighborhood_matches_bruteforce(tmp_path):
    """Pairs must not be lost or duplicated at rank-block boundaries."""
    from ocr_pipeline_ray.pipelines.dedup import sorted_neighborhood_dedup
    from ocr_pipeline_ray.pipelines.relational import _levenshtein

    rng = np.random.default_rng(7)
    n = 400
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    texts = []
    for i in range(n):
        t = base[: 20 + int(rng.integers(0, 20))] + "x" * int(rng.integers(0, 3))
        texts.append(t + " " * int(rng.integers(0, 2)))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": "en",
            "source": "s",
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    d = tmp_path / "documents.parquet"
    df.to_parquet(d)
    # tiny block size forces many boundary replications
    got = sorted_neighborhood_dedup(str(tmp_path), window=5, max_dist=3, block=16)

    # brute-force reference
    srt = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    want = []
    for i in range(len(srt)):
        for d2 in range(1, 5):
            j = i + d2
            if j >= len(srt):
                break
            dist = _levenshtein(srt["text"].iloc[i][:32], srt["text"].iloc[j][:32])
            if dist <= 3:
                want.append((int(srt["doc_id"].iloc[i]), int(srt["doc_id"].iloc[j]), dist))
    want_df = (
        pd.DataFrame(want, columns=["doc_a", "doc_b", "dist"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(want_df) > 50  # the fixture must actually exercise pairs
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_percentile_cont_matches_numpy(tmp_path):
    from ocr_pipeline_ray.pipelines.relational import price_percentile_cont_by_flag

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
        }
    )
    (tmp_path / "x").mkdir()
    df.to_parquet(tmp_path / "x" / "lineitem.parquet")
    got = price_percentile_cont_by_flag(str(tmp_path / "x"))
    for _, row in got.iterrows():
        ref = np.percentile(
            df[df["l_returnflag"] == row["l_returnflag"]]["l_extendedprice"].to_numpy(),
            row["p"] * 100,
        )
        assert row["value"] == pytest.approx(ref, abs=1e-3)


def test_lcg_streams_are_deterministic():
    from ocr_pipeline_ray.pipelines.relational import bootstrap_mean_ci, permutation_test_price_by_segment

    sf = "/root/testdata/sf0.001"
    a = bootstrap_mean_ci(sf)
    b = bootstrap_mean_ci(sf)
    pd.testing.assert_frame_equal(a, b)
    c = permutation_test_price_by_segment(sf)
    d = permutation_test_price_by_segment(sf)
    pd.testing.assert_frame_equal(c, d)
