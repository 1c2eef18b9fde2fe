"""Soft-potential event-chain MC (``lennard_jones.ecmc_model``,
``polydisperse.ecmc_model``) — the reference's named extension target
(``/root/reference/README.md:27``) beyond hard disks.

Gates: (1) LJ ECMC equilibrium energy matches Metropolis on the SAME
system; (2) the MKK lifting-event pressure estimator independently matches
the configurational virial pressure (a strong global-balance check — it is
wrong unless both the event rates and the event locations are right);
(3) the polydisperse IPL bisection solver matches displacement-only
Metropolis; (4) the dimension-generic event pass runs 3-D LJ chains."""

import numpy as np
import pytest

import jax

import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj
from montecarlo_tpu.models import polydisperse as poly

PARAMS = lj.LJParams()


def _run_ecmc(model, system, chains, steps, path, events_per_step=8,
              callbacks=()):
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.EventChain, model=model,
             events_per_step=events_per_step, seed=2),
        dict(algorithm=mc.StoreCallbacks, callbacks=callbacks,
             scheduler=np.arange(5, steps + 1, 5)),
    ], steps, path=path)
    sim.run()
    return sim


@pytest.fixture(scope="module")
def lj_ecmc_run(tmp_path_factory):
    N, M, steps = 64, 48, 150
    chains = lj.init_chains(M, N, rho=0.6, beta=1.0, frac_b=0.0, seed=1,
                            params=PARAMS)
    model = lj.ecmc_model(chain_length=1.5, params=PARAMS)
    path = str(tmp_path_factory.mktemp("ecmc_lj"))
    sim = _run_ecmc(model, lj.make_system(PARAMS), chains, steps, path,
                    callbacks=(lj.callback_energy_per_particle,))
    return sim, path, steps


def test_lj_ecmc_matches_metropolis_energy(lj_ecmc_run, tmp_path):
    sim, path, steps = lj_ecmc_run
    stats = sim.device_state["ecmc"]["stats"]
    assert int(np.asarray(stats["cap_hits"]).sum()) == 0
    assert np.all(np.asarray(stats["collisions"]) > 0)
    E = np.loadtxt(f"{path}/energy_per_particle.dat")
    tail = E[E[:, 0] > steps // 2, 1]

    chains = lj.init_chains(48, 64, rho=0.6, beta=1.0, frac_b=0.0, seed=1,
                            params=PARAMS)
    sim2 = mc.Simulation(lj.make_system(PARAMS), chains, [
        dict(algorithm=mc.Metropolis,
             pool=(lj.lj_displacement_move(0.25, params=PARAMS),),
             seed=3, sweepstep=64),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(lj.callback_energy_per_particle,),
             scheduler=np.arange(5, steps + 1, 5)),
    ], steps, path=str(tmp_path / "met"))
    sim2.run()
    E2 = np.loadtxt(str(tmp_path / "met" / "energy_per_particle.dat"))
    tail2 = E2[E2[:, 0] > steps // 2, 1]
    se = np.sqrt(tail.std() ** 2 / len(tail)
                 + tail2.std() ** 2 / len(tail2))
    assert abs(tail.mean() - tail2.mean()) < 4 * se + 0.02, (
        f"ECMC {tail.mean():.4f} vs MET {tail2.mean():.4f} (se {se:.4f})")


def test_lj_ecmc_pressure_estimator_matches_virial(lj_ecmc_run):
    """beta P / rho = 1 + <excess per chain> / ell (MKK 2014) from lifting
    events alone must agree with the configurational virial pressure —
    they share no code path."""
    sim, _, _ = lj_ecmc_run
    stats = sim.device_state["ecmc"]["stats"]
    excess = np.asarray(stats["excess"], np.float64).sum()
    chains = np.asarray(stats["chains"], np.float64).sum()
    p_ecmc = 1.0 + excess / (chains * 1.5)
    st = sim.device_state["sys"]
    pv = float(np.mean(np.asarray(jax.vmap(
        lambda s: lj.virial_pressure(s, PARAMS))(st))))
    p_vir = pv * 1.0 / 0.6     # beta P / rho
    assert abs(p_ecmc - p_vir) / p_vir < 0.08, (p_ecmc, p_vir)


def test_poly_ipl_ecmc_matches_metropolis(tmp_path):
    par = poly.PolyParams()
    N, M, steps = 64, 32, 200
    chains = poly.init_chains(M, N, rho=1.0, beta=2.0, seed=1, params=par)
    model = poly.ecmc_model(chain_length=1.0, params=par)
    sim = _run_ecmc(model, poly.make_system(par), chains, steps,
                    str(tmp_path / "ecmc"),
                    callbacks=(poly.callback_energy_per_particle,))
    stats = sim.device_state["ecmc"]["stats"]
    assert int(np.asarray(stats["cap_hits"]).sum()) == 0
    E = np.loadtxt(str(tmp_path / "ecmc" / "energy_per_particle.dat"))
    tail = E[E[:, 0] > steps // 2, 1]

    # displacement-ONLY Metropolis: ECMC keeps the diameter assignment
    # quenched, so swap moves (annealed assignment) are not comparable
    sim2 = mc.Simulation(poly.make_system(par), chains, [
        dict(algorithm=mc.Metropolis,
             pool=(poly.displacement_move(0.12, params=par),),
             seed=3, sweepstep=128),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(poly.callback_energy_per_particle,),
             scheduler=np.arange(5, steps + 1, 5)),
    ], steps, path=str(tmp_path / "met"))
    sim2.run()
    E2 = np.loadtxt(str(tmp_path / "met" / "energy_per_particle.dat"))
    tail2 = E2[E2[:, 0] > steps // 2, 1]
    se = np.sqrt(tail.std() ** 2 / len(tail)
                 + tail2.std() ** 2 / len(tail2))
    assert abs(tail.mean() - tail2.mean()) < 4 * se + 0.02, (
        f"ECMC {tail.mean():.4f} vs MET {tail2.mean():.4f} (se {se:.4f})")


def test_lj_ecmc_3d_runs():
    """The event pass only uses w^2 = r0^2 - along^2, so 3-D comes for
    free — smoke the full engine path in 3-D."""
    # box must exceed 2 rcut_max for the min-image advance cap
    N, M, steps = 128, 8, 30
    chains = lj.init_chains(M, N, rho=0.3, beta=1.0, frac_b=0.0, seed=5,
                            params=PARAMS, dim=3)
    model = lj.ecmc_model(chain_length=1.0, params=PARAMS)
    sim = _run_ecmc(model, lj.make_system(PARAMS), chains, steps,
                    "/tmp/mctpu_ecmc3d",
                    callbacks=(lj.callback_energy_per_particle,))
    stats = sim.device_state["ecmc"]["stats"]
    assert int(np.asarray(stats["cap_hits"]).sum()) == 0
    assert np.all(np.asarray(stats["collisions"]) > 0)
    E = np.loadtxt("/tmp/mctpu_ecmc3d/energy_per_particle.dat")
    assert np.all(np.isfinite(E[:, 1]))
    # positions stayed in the box
    pos = np.asarray(sim.device_state["sys"].pos)
    box = float(np.asarray(sim.device_state["sys"].box)[0])
    assert pos.min() >= 0 and pos.max() < box
