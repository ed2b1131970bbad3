"""Matrix profile: diagonal STOMP kernel vs a brute-force O(w^2 m)
window-pair reference, motif/discord semantics, and the distributed
operator end-to-end.

Numerical contract: the z-normalized mode uses the canonical STOMP
dot-product identity d = sqrt(2m(1 - rho)), which loses ~sqrt(eps)
absolute precision as rho -> 1 (near-duplicate windows) — the known
property of the published formulation. Distances are asserted to
~1e-6 and neighbor indices only where the brute-force margin between
best and runner-up exceeds that; the unnormalized mode is EXACT on
integral inputs (order-independent integer sums in float64) and is
asserted bit-for-bit including tie-broken indices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tablecloth_time_spark.operators.matrix_profile import (
    matrix_profile,
    matrix_profile_self,
)


def _brute(vals, m, normalize, excl=None):
    n = len(vals)
    w = n - m + 1
    excl = excl if excl is not None else max(1, m // 2)
    wins = np.array([vals[i:i + m] for i in range(w)], dtype=np.float64)
    mus, sigs = wins.mean(1), wins.std(1)
    prof = np.full(w, np.nan)
    pidx = np.full(w, -1)
    second = np.full(w, np.nan)
    for i in range(w):
        cands = []
        for j in range(w):
            if abs(i - j) < excl:
                continue
            if normalize:
                if sigs[i] <= 0 or sigs[j] <= 0:
                    continue
                a = (wins[i] - mus[i]) / sigs[i]
                b = (wins[j] - mus[j]) / sigs[j]
                d = float(np.sqrt(((a - b) ** 2).sum()))
            else:
                d = float(np.sqrt(((wins[i] - wins[j]) ** 2).sum()))
            cands.append((d, j))
        if cands:
            cands.sort()
            prof[i], pidx[i] = cands[0]
            if len(cands) > 1:
                second[i] = cands[1][0]
    return prof, pidx, second


def test_unnormalized_is_exact_vs_bruteforce():
    rng = np.random.default_rng(1)
    for trial in range(40):
        n = int(rng.integers(10, 60))
        m = int(rng.integers(3, min(9, n)))
        vals = rng.integers(0, 8, size=n).astype(np.float64)
        if trial % 5 == 0:
            vals[2:2 + m] = 5.0  # flat window
        prof, pidx = matrix_profile_self(vals, m, normalize=False)
        bp, bi, _ = _brute(vals, m, normalize=False)
        assert np.array_equal(np.isnan(prof), np.isnan(bp))
        ok = np.isnan(prof)
        assert (prof[~ok] == bp[~ok]).all()  # exact, incl. sqrt
        assert (pidx[~ok] == bi[~ok]).all()  # (d, j) tie-break pinned


def test_normalized_matches_bruteforce_within_stomp_precision():
    rng = np.random.default_rng(2)
    for _ in range(25):
        n = int(rng.integers(15, 60))
        m = int(rng.integers(4, min(10, n)))
        vals = rng.normal(size=n)
        prof, pidx = matrix_profile_self(vals, m, normalize=True)
        bp, bi, second = _brute(vals, m, normalize=True)
        assert np.allclose(prof, bp, atol=1e-6, equal_nan=True)
        # indices only where the brute margin beats the identity's noise
        clear = (~np.isnan(bp)) & (~np.isnan(second)) & (second - bp > 1e-6)
        assert (pidx[clear] == bi[clear]).all()


def test_flat_windows_excluded_and_motif_discord_semantics():
    # planted motif: the same ramp appears twice far apart; a spike makes
    # one window the discord
    base = np.array([1.0, 2, 3, 4, 3, 2, 1] * 6)
    vals = base.copy()
    vals[20] = 40.0  # spike -> discord neighborhood
    m = 7
    prof, pidx = matrix_profile_self(vals, m, normalize=False)
    # the periodic structure gives near-zero profile for most windows
    w = len(vals) - m + 1
    clean = [i for i in range(w) if not (i <= 20 < i + m)]
    assert max(prof[i] for i in clean) == 0.0  # period-7 exact repeats
    # discord = argmax over defined entries, and it covers the spike
    disc = int(np.nanargmax(prof))
    assert disc <= 20 < disc + m
    # flat series: every window has zero variance -> all-NaN profile
    p2, i2 = matrix_profile_self(np.full(30, 3.0), 5, normalize=True)
    assert np.isnan(p2).all() and (i2 == -1).all()


def test_short_series_and_exclusion():
    # no eligible neighbor once the exclusion zone eats the series
    prof, pidx = matrix_profile_self(np.arange(6.0), 5, normalize=False)
    assert np.isnan(prof).all() and (pidx == -1).all()


def test_matrix_profile_operator(spark):
    rng = np.random.default_rng(7)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for k in ("s1", "s2"):
        vals = rng.integers(0, 10, size=40)
        for t, v in enumerate(vals):
            rows.append({"k": k, "t": t0 + pd.Timedelta(hours=t),
                         "v": float(v)})
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf, schema="k string, t timestamp, v double")
    out = matrix_profile(
        df, "k", "t", "v", 1, "hour", m=6, normalize=False, agg="avg"
    ).collect()
    got = {(r["k"], r["w_idx"]): r for r in out}
    for k in ("s1", "s2"):
        vals = pdf[pdf["k"] == k].sort_values("t")["v"].to_numpy(np.float64)
        prof, pidx = matrix_profile_self(vals, 6, normalize=False)
        w = len(vals) - 6 + 1
        assert sum(1 for kk in got if kk[0] == k) == w
        for i in range(w):
            r = got[(k, i)]
            assert r["mp"] == prof[i]
            assert r["mp_idx"] == pidx[i]
            assert r["w_start"] == (t0 + pd.Timedelta(hours=i))
