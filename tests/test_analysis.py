"""Analysis toolkit: autocorrelation time, ESS, blocking errors.

Ground truth from an AR(1) process x_{t+1} = phi x_t + noise, whose
integrated autocorrelation time is exactly (1 + phi) / (1 - phi).
"""

import numpy as np
import pytest

from montecarlo_tpu.utils import analysis


def _ar1(phi, n, seed=0):
    rng = np.random.default_rng(seed)
    eps = rng.standard_normal(n)
    x = np.empty(n)
    x[0] = eps[0] / np.sqrt(1 - phi**2)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i] * np.sqrt(1 - phi**2)
    return x


def test_autocorrelation_basics():
    x = _ar1(0.7, 50_000)
    rho = analysis.autocorrelation(x, max_lag=10)
    assert rho[0] == pytest.approx(1.0)
    # AR(1): rho(k) = phi^k
    np.testing.assert_allclose(rho[1:4], [0.7, 0.49, 0.343], atol=0.03)


def test_tau_int_matches_ar1_theory():
    for phi in (0.0, 0.5, 0.9):
        x = _ar1(phi, 200_000, seed=3)
        tau = analysis.integrated_autocorr_time(x)
        tau_exact = (1 + phi) / (1 - phi)
        assert tau == pytest.approx(tau_exact, rel=0.15), phi


def test_effective_sample_size_iid():
    x = np.random.default_rng(1).standard_normal(100_000)
    ess = analysis.effective_sample_size(x)
    assert ess == pytest.approx(100_000, rel=0.1)


def test_blocking_error_agrees_with_tau_corrected_error():
    phi = 0.8
    x = _ar1(phi, 100_000, seed=7)
    blocked = analysis.blocking_error(x)
    tau_exact = (1 + phi) / (1 - phi)
    exact = np.sqrt(x.var(ddof=1) * tau_exact / x.size)
    assert blocked == pytest.approx(exact, rel=0.3)


def test_summary_accepts_recorder_layout(tmp_path):
    x = _ar1(0.5, 20_000, seed=11)
    arr = np.stack([np.arange(x.size), x], axis=1)   # "t value" layout
    p = tmp_path / "energy.dat"
    np.savetxt(p, arr)
    stats = analysis.summary(np.loadtxt(p))
    assert stats.n == 20_000
    assert abs(stats.mean) < 4 * stats.error
    assert stats.tau_int == pytest.approx(3.0, rel=0.3)
    assert "±" in str(stats)


def test_degenerate_inputs():
    with pytest.raises(ValueError):
        analysis.autocorrelation(np.ones(1))
    rho = analysis.autocorrelation(np.ones(100))   # constant series
    assert rho[0] == 1.0 and np.all(rho[1:] == 0.0)
    assert analysis.integrated_autocorr_time(np.ones(100)) >= 0.0


def test_summary_single_sample():
    stats = analysis.summary(np.array([3.5]))
    assert stats.mean == 3.5
    assert stats.error == 0.0 and stats.std == 0.0
    assert stats.tau_int == 1.0 and stats.n == 1 and stats.n_eff == 1.0
