"""Property tests for the closed-form tie-run rank scores used by the
two-sample rank family (Siegel-Tukey alternating extreme ranks), checked
against a literal brute-force rank assignment."""

import numpy as np


def _st_ranks_brute(n: int) -> np.ndarray:
    """Literal Siegel-Tukey (1960) rank assignment: rank 1 to the
    minimum, ranks 2-3 to the two maxima, 4-5 to the next two minima,
    alternating in pairs until all n positions are ranked."""
    ranks = {}
    pos_low, pos_high = 1, n
    ranks[pos_low] = 1
    pos_low += 1
    k, side = 2, "high"
    while k <= n:
        for _ in range(2):
            if k > n:
                break
            if side == "high":
                ranks[pos_high] = k
                pos_high -= 1
            else:
                ranks[pos_low] = k
                pos_low += 1
            k += 1
        side = "low" if side == "high" else "high"
    return np.array([ranks[i] for i in range(1, n + 1)], dtype=float)


def _closed_abar(l: np.ndarray) -> np.ndarray:
    """The closed-form per-run average ST score as implemented in
    relational.siegel_tukey_quantity (kept in sync by this test)."""
    l = np.asarray(l, dtype="int64")
    nn_i = int(l.sum())
    b = np.cumsum(l)
    a = b - l + 1
    h = (nn_i + 1) // 2
    la, lb = a, np.minimum(b, h)
    low_ok = lb >= la
    sum_low = np.where(
        low_ok, (lb * (lb + 1) - (la - 1) * la) - ((lb + 1) // 2 - la // 2), 0
    )
    if nn_i % 2 == 1 and h % 2 == 0:
        sum_low = sum_low - ((la <= h) & (lb >= h)).astype("int64")
    ha_ = np.maximum(a, h + 1)
    ja, jb = nn_i + 1 - b, nn_i + 1 - ha_
    hi_ok = jb >= ja
    sum_high = np.where(
        hi_ok, (jb * (jb + 1) - (ja - 1) * ja) - (jb // 2 - (ja - 1) // 2), 0
    )
    return (sum_low + sum_high).astype("float64") / l


def test_st_scores_are_a_permutation_of_1_to_n():
    for n in range(2, 40):
        r = _st_ranks_brute(n)
        assert sorted(r) == list(range(1, n + 1))


def test_closed_form_matches_brute_force_on_tie_runs():
    rng = np.random.RandomState(7)
    for _ in range(500):
        k = rng.randint(1, 9)
        l = rng.randint(1, 7, size=k)
        n = int(l.sum())
        r = _st_ranks_brute(n)
        b = np.cumsum(l)
        a = b - l + 1
        truth = np.array([r[ai - 1 : bi].mean() for ai, bi in zip(a, b)])
        got = _closed_abar(l)
        np.testing.assert_allclose(got, truth)


# ---------------------------------------------------------------------------
# _c_index rank-arithmetic concordance vs the brute-force pair census
# ---------------------------------------------------------------------------


def _c_index_brute(fr, tau=None):
    t = fr["t"].to_numpy()
    e = fr["e"].to_numpy()
    s = fr["s"].to_numpy()
    conc = ties = comp = 0
    for i in range(len(t)):
        if e[i] != 1:
            continue
        if tau is not None and not t[i] < tau:
            continue
        for j in range(len(t)):
            if t[i] < t[j]:
                comp += 1
                if s[i] > s[j]:
                    conc += 1
                elif s[i] == s[j]:
                    ties += 1
    c = (conc + 0.5 * ties) / comp if comp else 0.0
    return comp, conc, ties, c


def test_c_index_rank_arithmetic_matches_pair_census():
    import pandas as pd

    from ocr_pipeline_ray.pipelines.relational import _c_index

    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(1, 200))
        fr = pd.DataFrame(
            {
                "t": rng.integers(0, 12, n).astype("int64"),  # heavy t ties
                "e": rng.integers(0, 2, n).astype("int64"),
                "s": rng.integers(0, 6, n).astype("int64"),  # heavy s ties
            }
        )
        for tau in (None, 5, 0):
            assert _c_index_brute(fr, tau) == _c_index(fr, tau), (trial, tau)


def test_c_index_degenerate_sentinel():
    import pandas as pd

    from ocr_pipeline_ray.pipelines.relational import _c_index

    # no observed events, and all-equal times: comp == 0 -> c = 0.0
    fr = pd.DataFrame({"t": [1, 2, 3], "e": [0, 0, 0], "s": [1, 2, 3]})
    assert _c_index(fr) == (0, 0, 0, 0.0)
    fr = pd.DataFrame({"t": [5] * 10, "e": [1] * 10, "s": list(range(10))})
    assert _c_index(fr) == (0, 0, 0, 0.0)
