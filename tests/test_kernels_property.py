"""Property tests for the central distributed kernels against their
single-process pandas equivalents: bucketed_aggregate, partial_topk,
key_set_op. Random frames via hypothesis; Ray datasets built with
random block splits so kernel results must be partitioning-invariant."""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from ocr_pipeline_ray.pipelines.relational import bucketed_aggregate, partial_topk


def _make(seed, nk, n):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {"k": rng.integers(0, nk, n), "v": np.round(rng.random(n) * 100, 3)}
    )


frames = st.builds(_make, st.integers(0, 2**31), st.integers(1, 50), st.integers(1, 300))


def _ds(df: pd.DataFrame, n_blocks: int) -> "ray.data.Dataset":
    return ray.data.from_pandas(df).repartition(min(n_blocks, max(1, len(df))))


@settings(max_examples=15, deadline=None)
@given(frames, st.integers(1, 5))
def test_bucketed_aggregate_matches_pandas(df, n_blocks):
    got = (
        bucketed_aggregate(_ds(df, n_blocks), "k",
                           {"s": ("v", "sum"), "mn": ("v", "min"),
                            "mx": ("v", "max"), "n": ("v", "size")},
                           num_buckets=7)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert np.allclose(got["s"], exp["s"])
    assert np.allclose(got["mn"], exp["mn"]) and np.allclose(got["mx"], exp["mx"])
    assert got["n"].astype(int).tolist() == exp["n"].astype(int).tolist()


@settings(max_examples=10, deadline=None)
@given(frames, st.integers(1, 5), st.integers(1, 8))
def test_partial_topk_matches_pandas(df, n_blocks, k):
    got = partial_topk(_ds(df, n_blocks), by=["v", "k"], ascending=[False, True], k=k)
    exp = df.sort_values(["v", "k"], ascending=[False, True]).head(k).reset_index(drop=True)
    assert got["v"].tolist() == exp["v"].tolist()
    assert got["k"].tolist() == exp["k"].tolist()


@settings(max_examples=10, deadline=None)
@given(frames, st.integers(1, 5), st.integers(1, 8))
def test_partial_topk_grouped_matches_pandas(df, n_blocks, k):
    df = df.assign(g=(df["k"] % 3).astype("int64"))
    got = partial_topk(
        _ds(df, n_blocks), by=["v", "k"], ascending=[False, True], k=k, group="g"
    )
    exp = (
        df.sort_values(["v", "k"], ascending=[False, True])
        .groupby("g", sort=False)
        .head(k)
    )
    got_s = got.sort_values(["g", "v", "k"], ascending=[True, False, True]).reset_index(drop=True)
    exp_s = exp.sort_values(["g", "v", "k"], ascending=[True, False, True]).reset_index(drop=True)
    assert got_s[["g", "k", "v"]].values.tolist() == exp_s[["g", "k", "v"]].values.tolist()


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31), st.integers(0, 40), st.integers(0, 40))
def test_key_set_op_matches_python_sets(tmp_path_factory, seed, na, nb):
    from ocr_pipeline_ray.pipelines.relational import key_set_op

    rng = np.random.default_rng(seed)
    a = np.unique(rng.integers(0, 60, na)) if na else np.array([], dtype=np.int64)
    b = np.unique(rng.integers(0, 60, nb)) if nb else np.array([], dtype=np.int64)
    d = tmp_path_factory.mktemp("setop")
    pd.DataFrame({"c_custkey": a.astype("int64")}).to_parquet(d / "customer.parquet")
    pd.DataFrame({"s_suppkey": b.astype("int64")}).to_parquet(d / "supplier.parquet")
    inter = key_set_op(str(d), ("customer", "c_custkey"), ("supplier", "s_suppkey"), "intersect")
    exc = key_set_op(str(d), ("customer", "c_custkey"), ("supplier", "s_suppkey"), "except")
    assert inter["key"].tolist() == sorted(set(a) & set(b))
    assert exc["key"].tolist() == sorted(set(a) - set(b))


def test_shuffle_hash_join_salted_hot_key_matches_pandas():
    """A 90%-hot key salted across sub-buckets must produce exactly
    the unsalted/pandas join result (inner and left)."""
    from ocr_pipeline_ray.pipelines.relational import shuffle_hash_join

    rng = np.random.default_rng(7)
    n = 4000
    keys = np.where(rng.random(n) < 0.9, 42, rng.integers(0, 50, n))
    left = pd.DataFrame({"k": keys.astype("int64"), "lv": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(50, dtype="int64"), "rv": np.arange(50) * 10})
    # give the hot key several build rows to exercise replication
    right = pd.concat(
        [right, pd.DataFrame({"k": [42, 42], "rv": [1000, 2000]})], ignore_index=True
    )
    for how in ("inner", "left"):
        got = (
            shuffle_hash_join(
                _ds(left, 4), _ds(right, 2), on="k", how=how, num_buckets=8,
                left_cols=["k", "lv"], right_cols=["k", "rv"],
                hot_keys=[42], salt=4,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        exp = (
            left.merge(right, on="k", how=how)
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp), (how, len(got), len(exp))
        assert got["lv"].tolist() == exp["lv"].tolist()
        assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


def test_detect_hot_keys_finds_planted_skew():
    from ocr_pipeline_ray.pipelines.relational import detect_hot_keys

    rng = np.random.default_rng(9)
    keys = np.where(rng.random(20_000) < 0.4, 7, rng.integers(100, 5000, 20_000))
    ds = _ds(pd.DataFrame({"k": keys.astype("int64")}), 4)
    hot = detect_hot_keys(ds, "k", hot_fraction=0.05)
    assert hot == [7]
    # uniform keys -> nothing hot
    ds2 = _ds(pd.DataFrame({"k": rng.integers(0, 5000, 20_000).astype("int64")}), 4)
    assert detect_hot_keys(ds2, "k", hot_fraction=0.05) == []


def test_rank_in_group_matches_pandas_window(ray_session):
    """rank_in_group == row_number() OVER (PARTITION BY g ORDER BY v
    DESC, t) on a skewed distribution with heavy value ties."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocr_pipeline_ray.pipelines.relational import rank_in_group

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n, p=[0.8, 0.15, 0.05]),
            # few distinct values -> ties straddle range boundaries
            "v": rng.integers(0, 40, size=n).astype(float),
            "t": np.arange(n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        rank_in_group(ds, "g", "v", "t", out_cols=["g", "v", "t"], num_ranges=8)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "v", "t"], ascending=[True, False, True]).reset_index(drop=True)
    exp["rank"] = exp.groupby("g").cumcount() + 1
    pd.testing.assert_frame_equal(got, exp[["g", "v", "t", "rank"]], check_dtype=False)


def test_segment_dedup_first_occurrence(ray_session, tmp_path):
    """Keeps exactly the first (doc_id, seg_idx) occurrence of each
    distinct segment, including within-doc repeats and partial tails."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c a b c d e",   # segs: 'a b c' x2 -> second dropped; tail 'd e'
                "a b c x y z",       # 'a b c' dup of doc 1; 'x y z' new
                "",                  # no tokens -> no segments
            ],
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    from ocr_pipeline_ray.pipelines.text import segment_dedup

    out = segment_dedup(str(d))
    got = list(map(tuple, out[["doc_id", "seg_idx", "seg"]].values))
    assert got == [(1, 0, "a b c"), (1, 2, "d e"), (2, 1, "x y z")]
