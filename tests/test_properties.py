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
