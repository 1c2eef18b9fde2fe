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


# ---------------------------------------------------------------------------
# jackknife / Binder cumulant / histogram reweighting
# ---------------------------------------------------------------------------

def test_jackknife_mean_matches_standard_error():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, 40_000)
    est, err = analysis.jackknife(x, np.mean, n_blocks=40)
    assert abs(est - x.mean()) < 1e-10
    want = x.std(ddof=1) / np.sqrt(x.size)
    assert abs(err - want) / want < 0.25


def test_jackknife_nonlinear_statistic():
    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 2.0, 50_000)
    est, err = analysis.jackknife(x, lambda s: np.mean(s * s), n_blocks=50)
    assert abs(est - 4.0) < 5 * err
    assert 0 < err < 0.2


def test_binder_cumulant_limits():
    rng = np.random.default_rng(2)
    gauss = rng.normal(0.0, 1.0, 100_000)
    u4_g, err_g = analysis.binder_cumulant(gauss)
    assert abs(u4_g) < 5 * max(err_g, 1e-3)          # disordered: U4 -> 0
    ordered = np.where(rng.random(100_000) < 0.5, 1.0, -1.0) * 0.7
    u4_o, _ = analysis.binder_cumulant(ordered)
    assert abs(u4_o - 2.0 / 3.0) < 1e-6              # ordered: U4 -> 2/3


def _exact_ising_samples(rng, beta, n):
    """Draw exact Boltzmann samples of the 4x4 Ising energies by enumeration
    — isolates the reweighting estimator from sampler noise."""
    from montecarlo_tpu.models import ising2d
    size = 4
    bits = (np.arange(1 << 16, dtype=np.int64)[:, None]
            >> np.arange(16)) & 1
    s = (2 * bits - 1).astype(np.float64).reshape(-1, size, size)
    e = -np.sum(s * (np.roll(s, 1, 1) + np.roll(s, 1, 2)), axis=(1, 2))
    w = np.exp(-beta * (e - e.min()))
    p = w / w.sum()
    idx = rng.choice(e.size, size=n, p=p)
    m = np.abs(s.mean((1, 2)))
    return e[idx], m[idx]


def test_single_histogram_reweighting_matches_exact():
    from montecarlo_tpu.models import ising2d
    rng = np.random.default_rng(3)
    e, m = _exact_ising_samples(rng, beta=0.40, n=200_000)
    for beta_to in (0.35, 0.45):
        e_exact, m_exact = ising2d.exact_moments(4, beta_to)
        e_rw = analysis.reweight(e, e, 0.40, beta_to) / 16.0
        m_rw = analysis.reweight(e, m, 0.40, beta_to)
        assert abs(e_rw - e_exact) < 0.01
        assert abs(m_rw - m_exact) < 0.01


def test_multi_histogram_reweighting_interpolates():
    from montecarlo_tpu.models import ising2d
    rng = np.random.default_rng(4)
    e1, m1 = _exact_ising_samples(rng, beta=0.30, n=150_000)
    e2, m2 = _exact_ising_samples(rng, beta=0.50, n=150_000)
    for beta_to in (0.35, 0.40, 0.45):
        e_exact, m_exact = ising2d.exact_moments(4, beta_to)
        e_rw = analysis.multi_reweight(
            [0.30, 0.50], [e1, e2], beta_to) / 16.0
        m_rw = analysis.multi_reweight(
            [0.30, 0.50], [e1, e2], beta_to, obs=[m1, m2])
        assert abs(e_rw - e_exact) < 0.01
        assert abs(m_rw - m_exact) < 0.01


def test_reweighting_validates_shapes():
    with pytest.raises(ValueError):
        analysis.reweight(np.ones(10), np.ones(9), 0.1, 0.2)
    with pytest.raises(ValueError):
        analysis.multi_reweight([0.1, 0.2], [np.ones(10)], 0.15)
