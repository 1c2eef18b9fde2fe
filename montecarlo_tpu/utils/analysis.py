"""Post-run statistical analysis of Monte Carlo time series.

The reference writes raw ``t value`` series (``src/algorithms.jl:62-109``) and
leaves error analysis entirely to the user; its tests compare bare sample
means against analytic values (``test/distribution_test.jl:31-37``).  This
module supplies the standard MCMC estimator toolkit on top of those recorder
files: normalised autocorrelation functions, integrated autocorrelation time
(Sokal's self-consistent window), effective sample size, flyvbjerg-petersen
blocking errors, and a one-call ``summary`` that turns an ``energy.dat``-style
series into ``mean ± err (tau_int, n_eff)``.

Host-side numpy on purpose: these run once on small recorder outputs after the
device loop has finished — no reason to occupy the TPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "autocorrelation",
    "integrated_autocorr_time",
    "effective_sample_size",
    "blocking_error",
    "SeriesStats",
    "summary",
]


def autocorrelation(x: np.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Normalised autocorrelation function rho(0..max_lag) via FFT.

    ``rho[0] == 1``; O(n log n) through the Wiener–Khinchin theorem.
    """
    x = np.asarray(x, np.float64).ravel()
    n = x.size
    if n < 2:
        raise ValueError("need at least 2 samples")
    if max_lag is None:
        max_lag = n - 1
    max_lag = min(int(max_lag), n - 1)
    xc = x - x.mean()
    m = 1 << (2 * n - 1).bit_length()        # zero-pad to avoid circular wrap
    f = np.fft.rfft(xc, m)
    acov = np.fft.irfft(f * np.conj(f), m)[: max_lag + 1]
    if acov[0] <= 0:                          # constant series
        rho = np.zeros(max_lag + 1)
        rho[0] = 1.0
        return rho
    return acov / acov[0]


def integrated_autocorr_time(x: np.ndarray, c: float = 5.0) -> float:
    """Integrated autocorrelation time tau_int with Sokal's windowing.

    ``tau = 1 + 2 sum_{k=1..W} rho(k)`` with the self-consistent window
    ``W = min{ k : k >= c * tau(k) }`` (Sokal 1997; emcee uses the same rule).
    For iid samples tau ≈ 1; the variance of the sample mean is
    ``var(x) * tau / n``.
    """
    rho = autocorrelation(x)
    tau = 2.0 * np.cumsum(rho) - 1.0          # tau(k) = 1 + 2 sum_{1..k} rho
    window = np.arange(len(tau)) >= c * tau
    if not window.any():
        return float(tau[-1])
    w = int(np.argmax(window))
    return float(max(tau[w], 1.0))


def effective_sample_size(x: np.ndarray, c: float = 5.0) -> float:
    """n / tau_int — the number of statistically independent samples."""
    x = np.asarray(x).ravel()
    return x.size / integrated_autocorr_time(x, c=c)


def blocking_error(x: np.ndarray, min_blocks: int = 32) -> float:
    """Standard error of the mean by Flyvbjerg–Petersen blocking.

    Repeatedly average neighbouring pairs; the naive error
    ``sqrt(var / (n-1))`` of the blocked series grows until blocks are longer
    than the correlation time, then plateaus.  Returns the plateau (maximum
    over levels that retain ≥ ``min_blocks`` blocks, so the plateau estimate
    itself is not noise-dominated).
    """
    x = np.asarray(x, np.float64).ravel()
    if x.size < 2:
        raise ValueError("need at least 2 samples")
    errs = []
    while x.size >= max(2, min_blocks):
        errs.append(np.sqrt(x.var(ddof=1) / x.size))
        if x.size % 2:
            x = x[:-1]
        x = 0.5 * (x[::2] + x[1::2])
    if not errs:
        errs = [np.sqrt(x.var(ddof=1) / x.size)]
    return float(max(errs))


@dataclasses.dataclass(frozen=True)
class SeriesStats:
    mean: float
    error: float          # autocorrelation-corrected std error of the mean
    std: float            # sample standard deviation
    tau_int: float        # integrated autocorrelation time
    n: int                # number of samples
    n_eff: float          # effective sample size n / tau_int

    def __str__(self):
        return (f"{self.mean:.6g} ± {self.error:.2g} "
                f"(std {self.std:.4g}, tau_int {self.tau_int:.2f}, "
                f"n_eff {self.n_eff:.0f}/{self.n})")


def summary(x: np.ndarray, c: float = 5.0) -> SeriesStats:
    """One-call ``mean ± err`` with autocorrelation-corrected error bars.

    Accepts a raw 1-D series or a recorder file's ``(n, 2)`` ``t value``
    array (as returned by ``np.loadtxt`` on ``energy.dat`` etc.) — the value
    column is used.
    """
    x = np.asarray(x, np.float64)
    if x.ndim == 2 and x.shape[1] == 2:
        x = x[:, 1]
    x = x.ravel()
    if x.size == 1:
        # autocorrelation() needs n >= 2; a single sample still has a
        # well-defined (if useless) summary.
        return SeriesStats(mean=float(x[0]), error=0.0, std=0.0,
                           tau_int=1.0, n=1, n_eff=1.0)
    tau = integrated_autocorr_time(x, c=c)
    var = x.var(ddof=1) if x.size > 1 else 0.0
    err = float(np.sqrt(var * tau / x.size))
    return SeriesStats(mean=float(x.mean()), error=err,
                       std=float(np.sqrt(var)), tau_int=tau,
                       n=int(x.size), n_eff=x.size / tau)
