"""Transverse-field Ising PIMC vs exact diagonalization.

The quantum-capability gate: the Suzuki-Trotter classical lattice sampled by
the checkerboard driver must reproduce exact thermal quantum expectations of
the 1-D TFIM chain (dense ED ground truth) within Trotter + MC error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import tfim

N, M_SLICES, BETA, J = 6, 48, 1.0, 1.0


def _run(h, n_chains=256, steps=150, sweeps=15, seed=4, record=False):
    chains = tfim.init_chains(n_chains, N, M_SLICES, BETA, j=J, h=h,
                              seed=seed)
    algos = [dict(algorithm=tfim.TFIMCheckerboard, sweeps=sweeps, seed=seed)]
    if record:
        cb_sx = tfim.make_sx_callback(BETA, h, M_SLICES)
        algos.append(dict(
            algorithm=mc.StoreCallbacks,
            callbacks=(cb_sx, tfim.callback_szsz, tfim.callback_sz2),
            scheduler=mc.build_schedule(steps, 0, 2)))
    sim = mc.Simulation(
        tfim.make_system(), chains, algos,
        steps, path="/tmp/mctpu_test_tfim")
    sim.run()
    return sim


def test_action_energy_cache_consistent():
    sim = _run(h=1.0, n_chains=16, steps=10, sweeps=2)
    st = sim.device_state["sys"]
    fresh = jax.vmap(lambda s: tfim._action_energy(s.spins, s.kx, s.ktau))(st)
    np.testing.assert_allclose(np.asarray(st.energy), np.asarray(fresh),
                               rtol=1e-4, atol=1e-2)
    cnt = np.asarray(sim.device_state["tfim_cb"]["counters"])
    acc = cnt[..., 0].sum() / cnt[..., 1].sum()
    assert 0.05 < acc < 0.95


@pytest.mark.parametrize("h", [0.6, 1.2])
def test_pimc_matches_exact_diagonalization(h):
    """Trajectory-averaged (t >= burn) estimators vs dense ED.  The sx
    estimator needs the time average: flipped temporal bonds are rare but
    carry weight coth(dtau h) ~ M/(beta h), so a single-snapshot estimate is
    noise-dominated."""
    import os
    sim = _run(h, record=True)
    sx = np.loadtxt(os.path.join("/tmp/mctpu_test_tfim", "sx.dat"))
    zz = np.loadtxt(os.path.join("/tmp/mctpu_test_tfim", "szsz.dat"))
    mz2 = np.loadtxt(os.path.join("/tmp/mctpu_test_tfim", "sz2.dat"))
    burn = 70          # ~1000 lattice sweeps: past the slow kink annealing
    got = {"sx": sx[sx[:, 0] >= burn, 1].mean(),
           "szsz": zz[zz[:, 0] >= burn, 1].mean(),
           "mz2": mz2[mz2[:, 0] >= burn, 1].mean()}
    exact = tfim.ed_observables(N, BETA, J, h)
    for key, tol in (("sx", 0.025), ("szsz", 0.025), ("mz2", 0.035)):
        assert abs(got[key] - exact[key]) < tol, (
            f"h={h} {key}: pimc={got[key]:.4f} exact={exact[key]:.4f}")


def test_couplings_reject_zero_field():
    with pytest.raises(ValueError):
        tfim.couplings(1.0, 1.0, 0.0, 16)
    with pytest.raises(ValueError):
        tfim.init_chains(2, 5, 16, 1.0)   # odd N
