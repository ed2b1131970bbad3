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
