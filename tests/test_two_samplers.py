"""Two params-owning samplers in one simulation.

Round-2 review finding: ``Simulation`` kept a single global ``params`` slot
taken from the *first* device algorithm, so a second Metropolis instance (a
configuration the algorithm-list DSL naturally invites — the reference's
algorithm list imposes no singleton, ``src/simulation.jl:68-88``) would index
the first instance's parameter tuple.  Now every params-owning algorithm gets
its own device-state namespace (``params`` for the first,
``params_<state_key>`` for the rest); these tests pin that behaviour.
"""

import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu import policy_guided as pg
from montecarlo_tpu.models import particle1d as p1d


def _build(tmp_path, steps=40):
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(16, beta=2.0, seed=3)
    times = mc.build_schedule(steps, 0, 10)
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=0.5),), seed=11),
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=0.1),
                   p1d.displacement_move(sigma=0.9)), seed=12,
             scheduler=mc.build_schedule(steps, 0, 2)),
        dict(algorithm=mc.StoreParameters, dependencies=(0,),
             scheduler=times),
        dict(algorithm=mc.StoreParameters, dependencies=(1,),
             scheduler=times),
        dict(algorithm=mc.StoreCallbacks, callbacks=(p1d.callback_energy,),
             scheduler=times),
    ], steps, path=str(tmp_path / "two"))
    return sim


def test_two_metropolis_own_separate_params(tmp_path):
    sim = _build(tmp_path)
    m1, m2 = [a for a in sim.algorithms if isinstance(a, mc.Metropolis)]
    assert m1.params_key == "params"
    assert m2.params_key == "params_metropolis_1"
    assert m2.state_key == "metropolis_1"

    sim.run()
    ds = sim.device_state
    # each sampler's parameters live under its own key, unchanged (no PGMC)
    assert float(ds["params"][0]["sigma"]) == np.float32(0.5)
    sig2 = [float(p["sigma"]) for p in ds["params_metropolis_1"]]
    assert sig2 == [np.float32(0.1), np.float32(0.9)]
    # both samplers actually advanced their chains
    c1 = np.asarray(ds["metropolis"]["counters"])
    c2 = np.asarray(ds["metropolis_1"]["counters"])
    assert c1[..., 1].sum() == 16 * 40
    sched2 = mc.build_schedule(40, 0, 2)
    assert c2[..., 1].sum() == 16 * int(np.count_nonzero(sched2 > 0))
    assert c1[..., 0].sum() > 0 and c2[..., 0].sum() > 0


def test_store_parameters_tracks_its_own_sampler(tmp_path):
    sim = _build(tmp_path)
    sim.run()
    # primary sampler: reference layout parameters/<k>/;
    # second sampler: namespaced under its uniquified state key
    p1 = open(str(tmp_path / "two" / "parameters" / "1"
                  / "parameters.dat")).read()
    for line in p1.strip().splitlines():
        assert line.split(" ", 1)[1] == "[0.5]"
    for k, sig in ((1, f"[{float(np.float32(0.1))!r}]"),
                   (2, f"[{float(np.float32(0.9))!r}]")):
        pk = open(str(tmp_path / "two" / "parameters" / "metropolis_1"
                      / str(k) / "parameters.dat")).read()
        for line in pk.strip().splitlines():
            assert line.split(" ", 1)[1] == sig


def test_pgmc_on_second_sampler_updates_only_its_params(tmp_path):
    steps = 30
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(16, beta=2.0, seed=3)
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=0.5),), seed=11),
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=0.2),), seed=12),
        dict(algorithm=pg.PolicyGradientEstimator, dependencies=(1,),
             optimisers=(pg.VPG(0.01),), q_batch_size=2),
        dict(algorithm=pg.PolicyGradientUpdate,
             dependencies=(pg.PolicyGradientEstimator,)),
    ], steps, path=str(tmp_path / "pgmc2"))
    sim.run()
    ds = sim.device_state
    # first sampler untouched; second adapted away from its initial sigma
    assert float(ds["params"][0]["sigma"]) == np.float32(0.5)
    assert float(ds["params_metropolis_1"][0]["sigma"]) != np.float32(0.2)


def test_acceptance_callback_counts_both_samplers(tmp_path):
    """``callback_acceptance`` averages over ALL Metropolis instances (ref
    ``src/metropolis.jl:319-321`` filters the whole algorithm list), not
    just the first — VERDICT r4's one-line parity gap."""
    steps = 40
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(16, beta=2.0, seed=3)
    times = mc.build_schedule(steps, 0, 10)
    # second sampler proposes absurdly wide moves -> acceptance near 0;
    # averaging over both samplers must drag the callback well below the
    # first sampler's own rate
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=0.5),), seed=11),
        dict(algorithm=mc.Metropolis,
             pool=(p1d.displacement_move(sigma=200.0),), seed=12),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(mc.callback_acceptance,), scheduler=times),
    ], steps, path=str(tmp_path / "acc2"))
    sim.run()
    ds = sim.device_state
    c1 = np.asarray(ds["metropolis"]["counters"]).astype(float)
    c2 = np.asarray(ds["metropolis_1"]["counters"]).astype(float)
    want = np.concatenate(
        [(c1[..., 0] / c1[..., 1]).ravel(),
         (c2[..., 0] / c2[..., 1]).ravel()]).mean()
    got = np.loadtxt(str(tmp_path / "acc2" / "acceptance.dat"))[-1, 1]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    r1 = (c1[..., 0] / c1[..., 1]).mean()
    assert got < 0.75 * r1          # the dead sampler visibly counted
