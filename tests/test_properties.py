"""Property-based tests (hypothesis): codec round-trips and floor algebra."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tablecloth_time_spark.operators.compress import (
    decode_floats_xor,
    decode_ints_dod,
    encode_floats_xor,
    encode_ints_dod,
)
from tablecloth_time_spark.functions.units import milliseconds_in
from tablecloth_time_spark.oracle.timeops import down_to_nearest

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
def test_float_xor_roundtrip_property(values):
    v = np.array(values, dtype=np.float64)
    out = decode_floats_xor(encode_floats_xor(v))
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=300))
def test_int_dod_roundtrip_property(values):
    v = np.array(values, dtype=np.int64)
    out = decode_ints_dod(encode_ints_dod(v))
    assert out.tolist() == v.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=4 * 10**12),  # post-epoch millis
    st.integers(min_value=1, max_value=500),
    st.sampled_from(["second", "minute", "hour", "day", "week"]),
)
def test_floor_algebra(ms, interval, unit):
    """Oracle floor is divisor-aligned, <= input, within one bucket, and
    idempotent — for every metric unit and interval."""
    import pandas as pd

    divisor = interval * milliseconds_in(unit)
    s = pd.Series(pd.to_datetime([ms], unit="ms"))

    def as_ms(series):  # resolution-agnostic (oracle returns datetime64[us])
        return int(series.astype("datetime64[ns]").astype("int64").iloc[0]) // 10**6

    f = down_to_nearest(s, interval, unit)
    f_ms = as_ms(f)
    assert f_ms % divisor == 0
    assert 0 <= ms - f_ms < divisor
    assert as_ms(down_to_nearest(f, interval, unit)) == f_ms


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=2, max_value=400),
    st.integers(min_value=1, max_value=450),
    st.integers(min_value=0, max_value=2**31),
)
def test_lttb_select_invariants(n, n_out, seed):
    """LTTB selection: sorted unique indices within range, budget
    respected, endpoints pinned whenever the budget allows them."""
    from tablecloth_time_spark.operators.downsample import lttb_select

    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 1e9, n))
    v = rng.uniform(-1e6, 1e6, n)
    idx = lttb_select(t, v, n_out)
    assert len(idx) <= min(n, max(n_out, 1))
    assert (np.diff(idx) > 0).all()  # strictly increasing, no duplicates
    assert idx.min() >= 0 and idx.max() <= n - 1
    if n_out >= n:
        assert idx.tolist() == list(range(n))  # lossless when budget allows
    elif n_out >= 2:
        assert idx[0] == 0 and idx[-1] == n - 1  # endpoints always kept


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=4 * 10**12),
    st.integers(min_value=-(10**12), max_value=4 * 10**12),  # origin may follow ms
    st.integers(min_value=1, max_value=500),
    st.sampled_from(["second", "minute", "hour", "day", "week"]),
)
def test_origin_floor_algebra(ms, origin, interval, unit):
    """Origin-anchored flooring (the integer formula behind
    down_to_nearest(origin=...)): grid-aligned to the origin, <= input,
    within one bucket, idempotent — including values BEFORE the origin."""
    d = interval * milliseconds_in(unit)
    f = ms - ((ms - origin) % d + d) % d  # pmod, as the Spark expr computes
    assert (f - origin) % d == 0
    assert 0 <= ms - f < d
    f2 = f - ((f - origin) % d + d) % d
    assert f2 == f


def _holt_weights(alpha: float, beta: float, phi: float, T: int):
    """Pure-numpy mirror of holt_forecast's Cayley-Hamilton weights:
    returns (wl, wb) arrays indexed by rn-1 (0 = newest observation)."""
    import math

    tr = (1.0 - alpha) + phi * (1.0 - alpha * beta)
    det = phi * (1.0 - alpha)
    disc = tr * tr - 4.0 * det

    def pq(j):
        j = np.asarray(j, dtype=np.float64)
        if disc > 1e-12:
            sq = math.sqrt(disc)
            l1, l2 = (tr + sq) / 2.0, (tr - sq) / 2.0
            p = (l1**j - l2**j) / (l1 - l2)
            q = (l1 * l2**j - l2 * l1**j) / (l1 - l2)
        elif disc < -1e-12:
            r = math.sqrt(det)
            th = math.acos(tr / (2.0 * r))
            s = math.sin(th)
            p = r ** (j - 1) * np.sin(j * th) / s
            q = -(r**j) * np.sin((j - 1) * th) / s
        else:
            lam = tr / 2.0
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.where(j == 0, 0.0, j * lam ** np.maximum(j - 1, 0))
            q = (1.0 - j) * lam**j
        return p, q

    g = np.array([alpha, alpha * beta])
    F = np.array([[1 - alpha, (1 - alpha) * phi],
                  [-alpha * beta, phi * (1 - alpha * beta)]])
    fg = F @ g
    fc2 = F @ np.array([1.0, 1.0])
    fc1 = F @ np.array([0.0, 1.0])

    rn = np.arange(1, T + 1)  # 1 = newest
    p_s, q_s = pq(rn - 1.0)
    p_i, q_i = pq(float(T - 2))
    wl = p_s * fg[0] + q_s * g[0]
    wb = p_s * fg[1] + q_s * g[1]
    # init rows: rn == T-1 carries y_2's share of s_2, rn == T carries
    # -y_1's share
    wl[T - 2], wb[T - 2] = p_i * fc2[0] + q_i, p_i * fc2[1] + q_i
    wl[T - 1], wb[T - 1] = -(p_i * fc1[0]), -(p_i * fc1[1] + q_i)
    return wl, wb


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.02, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.5, max_value=1.0),
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_holt_cayley_hamilton_weights_equal_recurrence(
    alpha, beta, phi, T, seed
):
    """Across the WHOLE (alpha, beta, phi) space — all three discriminant
    branches — the closed-form weighted sum must reproduce the
    sequential Holt recurrence's (l_T, b_T)."""
    rng = np.random.default_rng(seed)
    y = rng.normal(50, 10, T)

    l, b = y[1], y[1] - y[0]
    for t in range(2, T):
        l_new = alpha * y[t] + (1 - alpha) * (l + phi * b)
        b = beta * (l_new - l) + (1 - beta) * phi * b
        l = l_new

    wl, wb = _holt_weights(alpha, beta, phi, T)
    y_desc = y[::-1]  # index by rn-1: newest first
    l_hat = float(wl @ y_desc)
    b_hat = float(wb @ y_desc)
    assert np.isclose(l_hat, l, rtol=1e-8, atol=1e-8)
    assert np.isclose(b_hat, b, rtol=1e-8, atol=1e-8)


@given(
    st.lists(st.integers(0, 1000), min_size=4, max_size=40),
    st.lists(st.integers(0, 1000), min_size=4, max_size=40),
    st.integers(-500, 500),
    st.one_of(st.none(), st.integers(0, 6)),
)
@settings(max_examples=60, deadline=None)
def test_dtw_shift_invariance_exact(a, b, shift, band):
    """|.|-cost DTW is EXACTLY invariant under a common integer shift:
    every local cost |(a_i+c) - (b_j+c)| is the identical float, so the
    whole DP reproduces bit-for-bit (the determinism the dtw_daily
    DuckDB oracle also relies on)."""
    from tablecloth_time_spark.operators.dtw import dtw_pairwise

    x = np.array(a, dtype=np.float64)
    y = np.array(b, dtype=np.float64)
    d0 = dtw_pairwise(x, y, band)
    d1 = dtw_pairwise(x + shift, y + shift, band)
    assert d0 == d1


@given(
    st.lists(st.integers(0, 200), min_size=10, max_size=60),
    st.integers(-300, 300),
    st.integers(3, 8),
)
@settings(max_examples=60, deadline=None)
def test_matrix_profile_unnormalized_shift_invariance_exact(vals, shift, m):
    """Unnormalized (raw-Euclidean) matrix profile is exactly
    shift-invariant: (a_i+c)-(a_j+c) is the same exact integer, so
    distances AND tie-broken neighbor indices are bit-identical."""
    from tablecloth_time_spark.operators.matrix_profile import (
        matrix_profile_self,
    )

    x = np.array(vals, dtype=np.float64)
    if len(x) < m + 1:
        return
    p0, i0 = matrix_profile_self(x, m, normalize=False)
    p1, i1 = matrix_profile_self(x + shift, m, normalize=False)
    assert np.array_equal(p0, p1, equal_nan=True)
    assert np.array_equal(i0, i1)


@given(
    st.lists(st.integers(0, 500), min_size=6, max_size=80),
    st.integers(1, 20),
    st.integers(2, 10),
)
@settings(max_examples=60, deadline=None)
def test_sax_breakpoint_binning_consistency(vals, w, a):
    """paa_sax's numpy twin: symbols always bin the z value against the
    same breakpoints (idx = #breakpoints strictly below z), the word
    alphabet never exceeds `a` letters, and a constant series maps every
    segment to the z=0 letter."""
    from tablecloth_time_spark.operators.symbolic import sax_breakpoints

    bps = sax_breakpoints(a)
    assert bps == sorted(bps) and len(bps) == a - 1
    x = np.array(vals, dtype=np.float64)
    mean, std = x.mean(), x.std()
    seg = (np.arange(len(x)) * w) // len(x)
    for s in np.unique(seg):
        z = 0.0 if std == 0 else (x[seg == s].mean() - mean) / std
        idx = sum(z > b for b in bps)
        assert 0 <= idx <= a - 1
    z0 = sum(0.0 > b for b in bps)
    assert z0 == sum(1 for b in bps if b < 0)  # the constant-series letter
