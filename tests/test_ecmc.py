"""Event-chain Monte Carlo tests.

Validates the rejection-free non-reversible sampler (the reference's named
extensibility target, ``README.md:27``) two ways:

1. 1-D zig-zag on the harmonic target — closed-form event times; exact
   trajectory time-integrals must reproduce the analytic Gaussian moments.
2. 2-D hard disks — straight event chains preserve the hard-core invariant
   and sample the SAME equilibrium distribution as the generic Metropolis
   engine on the identical system (the VERDICT "done" criterion).
"""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import hard_disks as hd
from montecarlo_tpu.models import particle1d as p1d

BETA = 2.0


def _run_zigzag(n_chains=256, steps=40, events_per_step=64):
    chains = p1d.init_chains(n_chains, beta=BETA, seed=9)
    sim = mc.Simulation(
        p1d.make_system(p1d.harmonic), chains,
        [dict(algorithm=mc.EventChain, model=p1d.zigzag_model(),
              events_per_step=events_per_step, seed=5)],
        steps, path="/tmp/mctpu_test_zigzag")
    sim.run()
    return sim


def test_zigzag_time_averaged_moments():
    """Time averages along the zig-zag trajectory equal the target moments:
    E[x] = 0, E[x^2] = 1/(2 beta), E[x^4] = 3 (1/(2 beta))^2."""
    sim = _run_zigzag()
    st = sim.device_state["ecmc"]["stats"]
    t = float(np.sum(np.asarray(st["t"], np.float64)))
    ex = float(np.sum(np.asarray(st["sx"], np.float64))) / t
    ex2 = float(np.sum(np.asarray(st["sx2"], np.float64))) / t
    ex4 = float(np.sum(np.asarray(st["sx4"], np.float64))) / t
    var = 1.0 / (2.0 * BETA)
    assert abs(ex) < 0.01
    np.testing.assert_allclose(ex2, var, rtol=0.03)
    np.testing.assert_allclose(ex4, 3.0 * var * var, rtol=0.08)


def test_zigzag_is_rejection_free_and_counts_events():
    sim = _run_zigzag(n_chains=8, steps=5, events_per_step=16)
    slc = sim.device_state["ecmc"]
    assert np.all(np.asarray(slc["n_events"]) == 5 * 16)
    # every event advances time: positive total per chain
    assert np.all(np.asarray(slc["stats"]["t"]) > 0)
    # cached energy stays consistent with position
    xs = np.asarray(sim.device_state["sys"].x)
    np.testing.assert_allclose(np.asarray(sim.device_state["sys"].e),
                               xs * xs, rtol=1e-5)


def _run_hard_disks_ecmc(n_chains, n_disks, eta, steps, events_per_step,
                         chain_length):
    chains = hd.init_chains(n_chains, n_disks, eta, seed=3)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.EventChain, model=hd.ecmc_model(chain_length),
              events_per_step=events_per_step, seed=11)],
        steps, path="/tmp/mctpu_test_hd_ecmc")
    sim.run()
    return sim


def test_hard_disks_ecmc_invariant_and_lifting():
    sim = _run_hard_disks_ecmc(n_chains=32, n_disks=12, eta=0.25,
                               steps=30, events_per_step=8,
                               chain_length=2.0)
    sys = sim.device_state["sys"]
    ok = np.asarray(jax.vmap(hd.overlap_free)(sys))
    assert ok.all(), "ECMC produced overlapping disks"
    st = sim.device_state["ecmc"]["stats"]
    n_chains_run = np.asarray(st["chains"]).sum()
    assert n_chains_run == 32 * 30 * 8
    # every chain consumed its full displacement budget (cap never hit)
    assert np.asarray(st["cap_hits"]).sum() == 0
    np.testing.assert_allclose(np.asarray(st["t"]),
                               2.0 * 30 * 8, rtol=1e-5)
    # lifting transfers happen at this density
    assert np.asarray(st["collisions"]).sum() > n_chains_run * 0.3
    # disks actually moved
    chains0 = hd.init_chains(32, 12, 0.25, seed=3)
    assert not np.allclose(np.asarray(sys.pos), np.asarray(chains0.pos))


def test_hard_disks_ecmc_matches_metropolis():
    """ECMC and the generic MH engine must agree on equilibrium structure:
    the mean minimum pair distance (a packing-sensitive observable)."""
    n_chains, n_disks, eta = 96, 12, 0.25

    sim_e = _run_hard_disks_ecmc(n_chains, n_disks, eta, steps=40,
                                 events_per_step=8, chain_length=2.0)
    d_ecmc = float(np.mean(np.asarray(
        jax.vmap(hd.min_pair_distance)(sim_e.device_state["sys"]))))

    chains = hd.init_chains(n_chains, n_disks, eta, seed=3)
    sim_m = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(hd.displacement_move(0.35),), sweepstep=n_disks,
              seed=21)],
        600, path="/tmp/mctpu_test_hd_mh")
    sim_m.run()
    sys_m = sim_m.device_state["sys"]
    assert np.asarray(jax.vmap(hd.overlap_free)(sys_m)).all()
    d_mh = float(np.mean(np.asarray(
        jax.vmap(hd.min_pair_distance)(sys_m))))

    # MH accepted some moves (the hard-core rejection isn't absorbing)
    cnt = np.asarray(sim_m.device_state["metropolis"]["counters"])
    acc = cnt[..., 0].sum() / cnt[..., 1].sum()
    assert 0.05 < acc < 0.95

    # same stationary distribution: min-distances agree within MC error
    # (96 chains, se ~ 0.3%/sqrt(96) of the mean)
    np.testing.assert_allclose(d_ecmc, d_mh, rtol=0.03)


def test_hard_disks_ecmc_pressure_matches_virial():
    """The ECMC chain-span pressure estimator (beta P/rho = 1 + <excess>/l,
    Michel-Kapfer-Krauth 2014) must reproduce the hard-disk virial
    expansion at low density (B2..B5 terms; finite-size + truncation ~1%)."""
    eta, n_disks, n_chains = 0.15, 32, 64
    rho = 4.0 * eta / np.pi
    chains = hd.init_chains(n_chains, n_disks, eta, seed=3)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.EventChain, model=hd.ecmc_model(3.0),
              events_per_step=8, seed=11)],
        120, path="/tmp/mctpu_test_hd_press")
    sim.run()
    st = sim.device_state["ecmc"]["stats"]
    assert np.asarray(st["cap_hits"]).sum() == 0
    p = hd.ecmc_pressure(st, 3.0)
    b2 = np.pi / 2
    virial = (1.0 + b2 * rho + 0.78202 * b2 ** 2 * rho ** 2
              + 0.53223 * b2 ** 3 * rho ** 3
              + 0.33356 * b2 ** 4 * rho ** 4)
    np.testing.assert_allclose(p, virial, rtol=0.03)


def test_hard_sphere_ecmc_3d():
    """3-D hard-sphere straight event chains (the collision pass only uses
    w^2 = r0^2 - along^2): overlap-free invariant, events fire, and the
    post-equilibration MKK pressure matches Carnahan-Starling."""
    N, M, steps = 216, 16, 80     # N = 6^3: a full cubic lattice start
    chains = hd.init_chains(M, N, eta=0.35, seed=60, dim=3)
    box = float(chains.box[0])
    ell = box / 2.0
    model = hd.ecmc_model(ell, max_events_per_chain=512)

    def run(start):
        sim = mc.Simulation(
            hd.make_system(), start,
            [dict(algorithm=mc.EventChain, model=model, events_per_step=4,
                  seed=9)],
            steps, path="/tmp/mctpu_ecmc_hs3d")
        sim.run()
        return sim

    sim = run(chains)                       # equilibration phase
    sim = run(sim.device_state["sys"])      # measurement phase
    stats = sim.device_state["ecmc"]["stats"]
    assert int(np.asarray(stats["cap_hits"]).sum()) == 0
    assert np.all(np.asarray(stats["collisions"]) > 0)
    ok = np.asarray(jax.vmap(hd.overlap_free)(sim.device_state["sys"]))
    assert ok.all(), "3-D event chains produced overlaps"
    # beta P / rho for hard spheres at eta=0.35 (Carnahan-Starling):
    # (1+eta+eta^2-eta^3)/(1-eta)^3 ~ 4.97; generous MC/finite-N gate
    p_red = hd.ecmc_pressure(stats, ell)
    assert 4.0 < p_red < 6.0, p_red
