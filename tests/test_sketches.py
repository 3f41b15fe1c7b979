"""Mergeable sketches: Bloom (no false negatives, FP near theory,
OR-merge associativity) and HLL (error bound, max-merge), plus the
pipelines built on them."""

import numpy as np

from ocr_pipeline_ray.functions.sketches import BloomFilter, HyperLogLog

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_fp_bound():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 50_000, dtype=np.int64).astype(np.uint64))
    others = np.setdiff1d(
        np.unique(rng.integers(0, 1 << 62, 50_000, dtype=np.int64).astype(np.uint64)), keys
    )
    bf = BloomFilter(1 << 20, 5).add(keys)
    assert bf.contains(keys).all()  # NEVER a false negative
    fp = bf.contains(others).mean()
    assert fp < 3 * max(bf.fp_rate(len(keys)), 1e-4)


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 62, 10_000, dtype=np.int64).astype(np.uint64)
    whole = BloomFilter(1 << 18, 4).add(keys)
    merged = BloomFilter(1 << 18, 4).add(keys[:5000]).merge(
        BloomFilter(1 << 18, 4).add(keys[5000:])
    )
    assert (whole.words == merged.words).all()


def test_hll_error_bound_and_merge():
    rng = np.random.default_rng(2)
    for n in (500, 50_000):
        ks = rng.integers(0, 1 << 62, n, dtype=np.int64).astype(np.uint64)
        true = len(np.unique(ks))
        h = HyperLogLog(12).add(ks[: n // 2]).merge(HyperLogLog(12).add(ks[n // 2 :]))
        err = abs(h.estimate() - true) / true
        assert err < 0.08  # 1.04/sqrt(4096) ~ 1.6%; 5-sigma headroom


def test_hll_pipeline_close_to_exact():
    from ocr_pipeline_ray.pipelines.events import (
        distinct_users_hll,
        distinct_users_per_type,
    )

    exact = distinct_users_per_type(SF).set_index("event_type")["n_users"]
    approx = distinct_users_hll(SF).set_index("event_type")["n_users_approx"]
    assert set(exact.index) == set(approx.index)
    for etype in exact.index:
        err = abs(int(approx[etype]) - int(exact[etype])) / max(1, int(exact[etype]))
        assert err < 0.08, (etype, int(exact[etype]), int(approx[etype]))


def test_bloom_semi_join_matches_exact():
    from ocr_pipeline_ray.pipelines.relational import (
        parts_with_lineitems,
        parts_with_lineitems_bloom,
    )

    exact = parts_with_lineitems(SF)
    bloomed = parts_with_lineitems_bloom(SF)
    assert exact["p_partkey"].tolist() == bloomed["p_partkey"].tolist()
    assert exact["p_name"].tolist() == bloomed["p_name"].tolist()


def test_bloom_build_tree_reduced():
    """The driver-side merge sees O(reduce_partitions) partials, not
    O(input batches), and the tree-reduced filter is bitwise-identical
    to a single-process build over the same keys."""
    import pyarrow.parquet as pq
    import ray.data

    from ocr_pipeline_ray.pipelines.relational import (
        _bloom_partials_reduced,
        build_bloom,
    )

    keys = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey"])[
        "l_partkey"
    ].to_numpy()
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey"])
    # force many input blocks so per-batch partials >> reduce partitions
    ds = ds.repartition(16)
    reduced = _bloom_partials_reduced(ds, "l_partkey", 1 << 16, 4, reduce_partitions=4)
    assert reduced.count() <= 4
    bf = build_bloom(ds, "l_partkey", 1 << 16, 4, reduce_partitions=4)
    direct = BloomFilter(1 << 16, 4).add(keys.astype(np.uint64))
    assert (bf.words == direct.words).all()


def test_bucketed_semi_anti_join_planted():
    """Distributed semi/anti join vs a plain pandas isin on planted
    data (duplicated keys on the key side, payload preserved)."""
    import pandas as pd
    import ray.data

    from ocr_pipeline_ray.pipelines.relational import bucketed_semi_anti_join

    probe = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "name": [f"n{i}" for i in range(100)]})
    keys = pd.DataFrame({"fk": np.repeat(np.arange(0, 100, 3, dtype=np.int64), 5)})
    pds = ray.data.from_pandas(probe).repartition(4)
    kds = ray.data.from_pandas(keys).repartition(4)
    semi = (
        bucketed_semi_anti_join(pds, "k", ["k", "name"], kds, "fk", anti=False)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    anti = (
        bucketed_semi_anti_join(pds, "k", ["k", "name"], kds, "fk", anti=True)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = probe["k"].isin(keys["fk"])
    assert semi["k"].tolist() == probe.loc[want, "k"].tolist()
    assert anti["k"].tolist() == probe.loc[~want, "k"].tolist()
    assert semi["name"].tolist() == probe.loc[want, "name"].tolist()


def test_kll_rank_error_bound_and_merge():
    rng = np.random.default_rng(4)
    data = rng.lognormal(3, 1, 200_000)
    from ocr_pipeline_ray.functions.sketches import KLLSketch

    parts = [KLLSketch(256).add(c) for c in np.array_split(data, 20)]
    s = parts[0]
    for p in parts[1:]:
        s.merge(p)
    for q in (0.1, 0.5, 0.9, 0.99):
        est_rank = (data <= s.quantile(q)).mean()
        assert abs(est_rank - q) < 0.02, (q, est_rank)
    assert sum(len(l) for l in s.levels) < 4 * 256  # bounded state


def test_kll_pipeline_close_to_exact():
    import pandas as pd
    import pyarrow.parquet as pq

    from ocr_pipeline_ray.pipelines.relational import order_price_quantiles_sketch

    got = order_price_quantiles_sketch(SF)
    prices = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])["o_totalprice"].to_numpy()
    for _, row in got.iterrows():
        est_rank = (prices <= row["value"]).mean()
        assert abs(est_rank - row["p"]) < 0.05, (row["p"], est_rank)


def test_cms_never_underestimates_and_merge_linear():
    from ocr_pipeline_ray.functions.sketches import CountMinSketch

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 62, 5_000, dtype=np.int64).astype(np.uint64)
    counts = rng.integers(1, 100, keys.size).astype(np.int64)
    whole = CountMinSketch(1 << 12, 4).add(keys, counts)
    uniq = np.unique(keys)
    true = np.zeros(uniq.size, dtype=np.int64)
    for i, k in enumerate(uniq):
        true[i] = counts[keys == k].sum()
    est = whole.estimate(uniq)
    assert (est >= true).all()  # point-query estimate NEVER under-counts
    # error bound: e/width * total with prob 1 - e^-depth; generous slack
    assert (est - true).max() <= 8 * counts.sum() / (1 << 12)
    merged = CountMinSketch(1 << 12, 4).add(keys[:2500], counts[:2500]).merge(
        CountMinSketch(1 << 12, 4).add(keys[2500:], counts[2500:])
    )
    assert (whole.table == merged.table).all()


def test_heavy_hitters_exact_vs_pandas():
    import pandas as pd
    import pyarrow.parquet as pq

    from ocr_pipeline_ray.functions.textstats import TOKEN_RE
    from ocr_pipeline_ray.pipelines.text import heavy_hitter_terms

    got = heavy_hitter_terms(SF, min_frac=0.02)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    toks = pd.Series([w for s in texts for w in TOKEN_RE.findall(s.lower())])
    vc = toks.value_counts()
    import math

    thresh = math.ceil(0.02 * len(toks))
    want = vc[vc >= thresh].rename_axis("term").reset_index(name="n")
    want = want.sort_values(["n", "term"], ascending=[False, True]).reset_index(drop=True)
    want["n"] = want["n"].astype("int64")
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_grouped_kll_close_to_exact():
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_pipeline_ray.pipelines.relational import price_quantiles_by_flag_sketch

    got = price_quantiles_by_flag_sketch(SF)
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]).to_pandas()
    assert set(got["l_returnflag"]) == set(t["l_returnflag"].unique())
    for _, row in got.iterrows():
        vals = t.loc[t["l_returnflag"] == row["l_returnflag"], "l_extendedprice"].to_numpy()
        est_rank = (vals <= row["value"]).mean()
        assert abs(est_rank - row["p"]) < 0.05, (row["l_returnflag"], row["p"], est_rank)


def test_exactcap_regime_guard_raises_out_of_regime():
    """ADVICE r4: the *_exactcap anchors are exact only while n <= k.
    Running them with a capacity below the corpus size must fail
    LOUDLY with the violated bound, not silently drift from the SQL
    oracle into a confusing sweep hash mismatch."""
    import pytest

    from ocr_pipeline_ray.pipelines.relational import (
        order_price_quantiles_sketch,
        order_price_quantiles_sketch_exactcap,
        price_quantiles_by_flag_sketch,
    )

    with pytest.raises(ValueError, match="exact-capacity regime violated"):
        order_price_quantiles_sketch(SF, k=64, exact_capacity=True)
    with pytest.raises(ValueError, match="exact-capacity regime violated"):
        price_quantiles_by_flag_sketch(SF, k=64, exact_capacity=True)
    # in-regime: the default k=1M wrapper still runs exact and clean
    out = order_price_quantiles_sketch_exactcap(SF)
    assert len(out) > 0
